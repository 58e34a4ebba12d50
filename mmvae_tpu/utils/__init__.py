from mmvae_tpu.utils.profiling import trace, annotate
from mmvae_tpu.utils.debug import debug_guards, install_sigterm_checkpoint

__all__ = ["trace", "annotate", "debug_guards", "install_sigterm_checkpoint"]
