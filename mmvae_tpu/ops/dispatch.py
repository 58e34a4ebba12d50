"""Backend dispatch: Pallas kernels on TPU, XLA reference elsewhere.

The train step calls these wrappers; configs can force either path via
`use_pallas` (None = auto).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from mmvae_tpu.ops import elbo_ref
from mmvae_tpu.ops import elbo_pallas


def _auto() -> bool:
    return jax.default_backend() == "tpu"


def elbo_parts(
    logits: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(bce_sum, kl_sum); fused Pallas kernel on TPU, XLA oracle elsewhere."""
    if use_pallas is None:
        use_pallas = _auto()
    if use_pallas:
        return elbo_pallas.elbo_reduce_pallas(logits, x, mu, logvar)
    return elbo_ref.elbo_parts_ref(logits, x, mu, logvar)


def reparameterize(
    rng: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """z ~ q(z|x). `rng` is a JAX PRNG key; the Pallas path derives an int32
    seed from it for the on-core generator."""
    if use_pallas is None:
        use_pallas = _auto()
    if use_pallas:
        seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        return elbo_pallas.reparameterize_pallas(mu, logvar, seed)
    return elbo_ref.reparameterize_ref(rng, mu, logvar)
