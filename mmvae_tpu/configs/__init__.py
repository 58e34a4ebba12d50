"""Named configs matching BASELINE.json:6-12 verbatim (SURVEY.md C18)."""

from mmvae_tpu.configs.base import Config, get_config, CONFIG_REGISTRY

__all__ = ["Config", "get_config", "CONFIG_REGISTRY"]
