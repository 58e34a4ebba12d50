"""Disjoint int32 seed streams for the on-core TPU PRNG.

The step counter drives every per-step random draw (binarization noise,
reparameterization eps, resident-batch gather).  The on-core generator
(`pltpu.prng_seed`) takes raw int32 seeds, so distinct *uses* must map to
disjoint seed sets: round-1 advisory found the old affine maps
(``seed*4+2`` for preprocess vs ``seed*8+salt+1`` for reparam) alias across
steps, correlating binarization noise with latent noise.

Scheme: bits 27..30 carry a static stream id, the low 27 bits carry the
(salt-mixed) step seed.  Streams are disjoint by construction for every step
seed; the sign bit stays clear.  Block/grid indices are mixed *inside* the
kernels by passing them as a second word to ``pltpu.prng_seed`` (which hashes
its arguments) rather than by addition, so they cannot carry into the stream
bits either.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Static stream ids (4 bits: up to 15 streams).
STREAM_PREPROCESS = 1   # Bernoulli binarization noise
STREAM_REPARAM = 2      # posterior sampling eps (salt = draw index)
STREAM_ONGEN = 3        # on-device clip generation (data/ongen.py)

_LOW_MASK = 0x07FFFFFF  # 27 bits of step-seed space per stream


def stream_seed(seed: jax.Array, stream_id: int, salt: int = 0) -> jax.Array:
    """int32 seed for stream `stream_id`; disjoint across streams for any step.

    `seed` is the (already well-mixed) step-derived seed; `salt` decorrelates
    multiple draws of the same stream within one step (e.g. the hierarchical
    model's global + per-chunk latents).
    """
    s = jnp.asarray(seed, jnp.int32) + jnp.int32(salt) * jnp.int32(1000003)
    return (s & jnp.int32(_LOW_MASK)) | jnp.int32(stream_id << 27)
