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
    """uint8 (N, T, H, W) -> int32 (n_samples, bytes/512, 128) row gather pack.

    per_frame=True flattens time into the row axis (one row per frame) so the
    per-frame models gather single frames directly.

    Byte layout is **chunk-planar**: each 512-byte chunk is stored as 128
    words whose byte k holds original byte k*128+j (j = lane).  This is the
    exact image of the TPU tile-repeat the fused unpack kernel uses
    (`ops.preprocess_pallas._packed_kernel`: lane c of the 4x-repeated block
    reads word c%128, shifted by 8*(c//128) — which lands original byte c in
    lane c with zero cross-lane data movement).  `unpack_sample` is the
    inverse (round-trip tested in tests/test_data.py).

    The returned shape is 3-D — one (words/128, 128) *tile-aligned plane* per
    sample — so the (8,128) TPU tiling lives entirely WITHIN a row and the
    per-step batch gather moves whole tiles (a pure DMA).  Flat 2-D (N, words)
    rows tile 8 consecutive SAMPLES together, making every row gather a
    cross-sublane relayout: measured 2.84 ms vs 0.29 ms per 16x400KB gather
    on v5e (scripts/bench_gather.py; the 2-D layout cost 18% of the whole
    hier_vae step).
    """
    import numpy as np

    rows = np.ascontiguousarray(rows)
    assert rows.dtype == np.uint8
    if per_frame:
        n = rows.shape[0] * rows.shape[1]
        flat = rows.reshape(n, -1)
    else:
        flat = rows.reshape(rows.shape[0], -1)
    nb = flat.shape[1]
    if nb % 512:
        raise ValueError(
            f"resident sample must be a multiple of 512 bytes, got {nb} "
            "(64x64 frames always are)"
        )
    n = flat.shape[0]
    planar = np.ascontiguousarray(
        flat.reshape(n, nb // 512, 4, 128).transpose(0, 1, 3, 2)
    )
    return (
        planar.reshape(n, nb // 4, 4).view(np.int32)[..., 0]
        .reshape(n, nb // 512, 128)
    )


def unpack_sample(packed_i32: jax.Array, sample_shape) -> jax.Array:
    """int32 packed rows (B, words/128, 128) [or legacy (B, words)] -> uint8
    (B, *sample_shape): inverse of the chunk-planar `pack_resident` layout
    (bitcast + per-chunk transpose, fused by XLA)."""
    b = packed_i32.shape[0]
    words = packed_i32.size // b
    packed_i32 = packed_i32.reshape(b, words)
    u8 = jax.lax.bitcast_convert_type(packed_i32, jnp.uint8)  # (B, words, 4)
    u8 = u8.reshape(b, words // 128, 128, 4).transpose(0, 1, 3, 2)
    return u8.reshape((b,) + tuple(sample_shape))
