"""Generation/eval layer: reconstruction, prior sampling, rollout, image dump."""

from mmvae_tpu.sample.generate import (
    reconstruct,
    prior_sample,
    rollout,
    save_grid,
    save_gif,
)

__all__ = ["reconstruct", "prior_sample", "rollout", "save_grid", "save_gif"]
