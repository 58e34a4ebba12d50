"""Ops layer: the ELBO compute path.

- `elbo_ref`:    pure-XLA reference implementation (numerics oracle + CPU path).
- `elbo_pallas`: fused Pallas TPU kernels (production path).
- `elbo`:        dispatching wrappers (Pallas on TPU, XLA elsewhere).
"""

from mmvae_tpu.ops.elbo_ref import (
    bce_with_logits_sum,
    kl_sum,
    elbo_parts_ref,
    reparameterize_ref,
)
from mmvae_tpu.ops.elbo_pallas import (
    elbo_reduce_pallas,
    reparameterize_pallas,
)
from mmvae_tpu.ops.dispatch import elbo_parts, reparameterize

__all__ = [
    "bce_with_logits_sum",
    "kl_sum",
    "elbo_parts_ref",
    "reparameterize_ref",
    "elbo_reduce_pallas",
    "reparameterize_pallas",
    "elbo_parts",
    "reparameterize",
]
