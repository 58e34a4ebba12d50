"""Pure-XLA reference ELBO — the numerics oracle for the Pallas kernels.

Implements the canonical VAE loss of the reference (SURVEY.md 2.1 "ELBO loss"):

    BCE(recon, x, reduction='sum') + (-0.5 * sum(1 + logvar - mu^2 - exp(logvar)))

with two deliberate changes of *form*, not value:
- BCE is computed **from logits** (log-sum-exp-stable), not from sigmoided
  probabilities; identical value, no saturation at p -> {0, 1}.
- All reductions are in float32 regardless of activation dtype.

This module is also the CPU fallback and the `interpret=True` cross-check
target for `elbo_pallas`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def bce_with_logits_sum(logits: jax.Array, x: jax.Array) -> jax.Array:
    """sum over all elements of BCE(sigmoid(logits), x); stable logits form.

    max(l, 0) - l*x + log(1 + exp(-|l|))  ==  -[x log p + (1-x) log(1-p)].
    """
    l = logits.astype(jnp.float32)
    t = x.astype(jnp.float32)
    per_elem = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    return jnp.sum(per_elem)


def kl_sum(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, diag exp(logvar)) || N(0, I)), summed over all elements."""
    m = mu.astype(jnp.float32)
    lv = logvar.astype(jnp.float32)
    return -0.5 * jnp.sum(1.0 + lv - m * m - jnp.exp(lv))


def elbo_parts_ref(
    logits: jax.Array, x: jax.Array, mu: jax.Array, logvar: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(bce_sum, kl_sum) — negative ELBO is their sum."""
    return bce_with_logits_sum(logits, x), kl_sum(mu, logvar)


def reparameterize_ref(
    rng: jax.Array, mu: jax.Array, logvar: jax.Array
) -> jax.Array:
    """z = mu + exp(0.5 * logvar) * eps,  eps ~ N(0, I)."""
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + jnp.exp(0.5 * logvar) * eps
