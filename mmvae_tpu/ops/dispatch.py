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
from mmvae_tpu.ops import seeds


def _auto() -> bool:
    return jax.default_backend() == "tpu"


def make_sample_fn(seed: jax.Array, use_pallas: Optional[bool] = None):
    """Build `sample_fn(mu, logvar, salt=0) -> z` for one train/eval step.

    The single place that derives sampling randomness from the step seed
    (models receive this injected; see models.base.SampleFn).  On the Pallas
    path the on-core PRNG is seeded from the dedicated REPARAM stream
    (ops.seeds — disjoint from the preprocess stream); off-TPU the threefry
    key space is independent by construction.
    """
    if use_pallas is None:
        use_pallas = _auto()

    def sample_fn(mu, logvar, salt=0):
        if use_pallas:
            return elbo_pallas.reparameterize_pallas(
                mu, logvar, seeds.stream_seed(seed, seeds.STREAM_REPARAM, salt)
            )
        key = jax.random.fold_in(jax.random.PRNGKey(seed), salt)
        return elbo_ref.reparameterize_ref(key, mu, logvar)

    return sample_fn


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
        raw = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        seed = seeds.stream_seed(raw, seeds.STREAM_REPARAM)
        return elbo_pallas.reparameterize_pallas(mu, logvar, seed)
    return elbo_ref.reparameterize_ref(rng, mu, logvar)
