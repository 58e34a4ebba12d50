"""Parallelism layer: mesh construction + shard_map data-parallel step."""

from mmvae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    dp_step,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "dp_step"]
