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


# -- device-resident packing ---------------------------------------------
#
# The resident training mode keeps the whole uint8 dataset in HBM and gathers
# each batch on-device.  Gathering uint8 rows is ~5x slower than int32 rows on
# TPU (the u8 (32,128) tile layout defeats the DMA row gather: measured 10.1
# vs 1.9 ms for 64x80KB rows from a 737MB array on v5e), so the dataset is
# stored bit-packed as int32 rows — one row per SAMPLE (frame or clip) — and
# unpacked with a free bitcast after the gather.


def pack_resident(rows, per_frame: bool = False):
    """uint8 (N, T, H, W) -> int32 (n_samples, bytes/4) for fast row gather.

    per_frame=True flattens time into the row axis (one row per frame) so the
    per-frame models gather single frames directly.  Little-endian byte order
    matches `unpack_sample`'s bitcast exactly (round-trip tested).
    """
    import numpy as np

    rows = np.ascontiguousarray(rows)
    assert rows.dtype == np.uint8
    if per_frame:
        n = rows.shape[0] * rows.shape[1]
        flat = rows.reshape(n, -1)
    else:
        flat = rows.reshape(rows.shape[0], -1)
    assert flat.shape[1] % 4 == 0
    return flat.view(np.int32)


def unpack_sample(packed_i32: jax.Array, sample_shape) -> jax.Array:
    """int32 (B, bytes/4) -> uint8 (B, *sample_shape); a bitcast, fused by XLA."""
    u8 = jax.lax.bitcast_convert_type(packed_i32, jnp.uint8)  # (B, bytes/4, 4)
    return u8.reshape((packed_i32.shape[0],) + tuple(sample_shape))
