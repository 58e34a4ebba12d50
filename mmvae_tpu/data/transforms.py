"""On-device preprocessing, fused by XLA into the jitted train step.

Contract (BASELINE.json:5): "uint8->f32 normalize/binarize fused on-device".
These are plain `jnp` functions called *inside* the jitted step so XLA fuses
them with the first encoder layer; uint8 is what crosses PCIe/DMA, and the f32
tensor only ever exists in HBM/VMEM.  The reference does `x / 255.` on host
inside its Dataset (SURVEY.md 2.1 "Normalize/binarize").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(u8: jax.Array) -> jax.Array:
    """uint8 [0,255] -> float32 [0,1]."""
    return u8.astype(jnp.float32) * (1.0 / 255.0)


def binarize(x: jax.Array, rng: jax.Array) -> jax.Array:
    """Stochastic Bernoulli binarization: pixel value is P(on).

    Standard for BCE-likelihood VAEs (dynamic binarization); keeps the Bernoulli
    decoder's likelihood well-specified.
    """
    return (jax.random.uniform(rng, x.shape) < x).astype(jnp.float32)


def preprocess(u8: jax.Array, rng: jax.Array | None = None) -> jax.Array:
    """normalize, then optionally binarize (if rng given). Call inside jit."""
    x = normalize(u8)
    if rng is not None:
        x = binarize(x, rng)
    return x
