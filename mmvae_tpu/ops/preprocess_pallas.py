"""Fused Pallas normalize+binarize: uint8 -> Bernoulli {0,1} f32, one pass.

Contract (BASELINE.json:5): "uint8->f32 normalize/binarize fused on-device".
The XLA path (`data.transforms`) already fuses normalize into the first conv,
but stochastic binarization with threefry (`jax.random.uniform`) measured
~1.7 ms per 5.2M-pixel batch on the v5e dev chip — comparable to a whole
encoder pass.  This kernel draws raw bits from the on-core PRNG instead and
emits pixels in a single u8-in/f32-out sweep:

    out = (u8 + 1) > (rand_bits & 0xFF)  as float   (exactly P(on) = u8/255? no:)

Exact semantics: out = 1.0 iff  uniform_u24 * 255 < u8, with uniform_u24 the
24 high bits of a PRNG draw — i.e. P(on) = u8/255 to within 2^-24, matching
`transforms.binarize(normalize(u8))` in distribution (verified by moment
tests).  Throughput is HBM-bound: ~5 bytes/pixel total vs ~13+ for the XLA
threefry path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_BLOCK_ROWS = 512
_BLOCK_COLS = 512


def _kernel(seed_ref, u8_ref, out_ref, *, binarize):
    i = pl.program_id(0)
    if binarize:
        # Two-word seed: prng_seed hashes (stream seed, block index) so block
        # offsets can never carry into another stream's seed space (ops.seeds).
        pltpu.prng_seed(seed_ref[0], i)
        bits = pltpu.bitcast(pltpu.prng_random_bits(out_ref.shape), jnp.int32)
        # 24 high bits -> uniform integer in [0, 2^24); threshold at
        # u8 * 2^24 / 255 gives P(on) = u8/255 exactly (up to integer floor).
        u24 = jax.lax.shift_right_logical(bits, 8)
        # Mosaic has no direct u8->f32 cast; widen to int32 first.
        pix = u8_ref[:].astype(jnp.int32).astype(jnp.float32)
        thresh = pix * (float(1 << 24) / 255.0)
        # astype(out dtype): {0,1} is exact in bf16, so the bf16 output mode
        # is bitwise-equivalent data at half the HBM write (+ downstream read)
        # traffic.
        out_ref[:] = (u24.astype(jnp.float32) < thresh).astype(out_ref.dtype)
    else:
        out_ref[:] = (
            u8_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        ).astype(out_ref.dtype)


def preprocess_pallas(
    u8: jax.Array,
    seed: jax.Array,
    *,
    binarize: bool = True,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """uint8 (any shape, size % 128 == 0) -> f32, normalized or binarized.

    out_dtype=bfloat16 halves the output's HBM traffic; for binarize=True the
    {0,1} values are EXACT in bf16 (the ELBO kernel upcasts to f32 before
    accumulating), for normalize mode it rounds u8/255 to bf16 (~0.2%).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret and binarize:
        # pltpu.prng_* has no interpret-mode lowering on CPU; use the XLA path.
        from mmvae_tpu.data import transforms

        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(()))
        return transforms.preprocess(u8, rng=key).astype(out_dtype)
    n = u8.size
    shape = u8.shape
    cols = _BLOCK_COLS if n % _BLOCK_COLS == 0 else _LANE
    if n % cols:
        raise ValueError(f"size {n} not divisible by {cols}")
    rows = n // cols
    block_rows = min(_BLOCK_ROWS, rows)
    while rows % block_rows:
        block_rows //= 2
    grid = rows // block_rows
    out = pl.pallas_call(
        functools.partial(_kernel, binarize=binarize),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), u8.reshape(rows, cols))
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Packed-input variant: int32 resident rows -> f32, unpack fused in-kernel
# ---------------------------------------------------------------------------


def _packed_kernel(seed_ref, w_ref, out_ref, *, binarize):
    i = pl.program_id(0)
    # In-kernel byte unpack of the chunk-planar layout (data.transforms
    # .pack_resident): pltpu.repeat TILE-repeats the 128-word block along the
    # lane axis ([w w w w] — verified on-chip; it is NOT element-interleave),
    # so lane c sees word c%128; shifting by 8*(c//128) selects byte c//128,
    # which in the planar packing IS original byte c.  Zero cross-lane data
    # movement.  This replaces the XLA bitcast->u8 + retiling reshape, which
    # profiled at >1.2 ms/step on the production batch (the u8 (32,128)
    # tiling forces a full relayout).
    w = w_ref[:]
    cols = w.shape[1]
    rep = pltpu.repeat(w, 4, axis=1)  # (rows, 4*cols): [w w w w]
    lane = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1)
    byte = jax.lax.shift_right_logical(
        pltpu.bitcast(rep, jnp.uint32), ((lane // cols) * 8).astype(jnp.uint32)
    )
    pix = (pltpu.bitcast(byte, jnp.int32) & 0xFF).astype(jnp.float32)
    if binarize:
        pltpu.prng_seed(seed_ref[0], i)
        bits = pltpu.bitcast(pltpu.prng_random_bits(rep.shape), jnp.int32)
        u24 = jax.lax.shift_right_logical(bits, 8)
        thresh = pix * (float(1 << 24) / 255.0)
        out_ref[:] = (u24.astype(jnp.float32) < thresh).astype(out_ref.dtype)
    else:
        out_ref[:] = (pix * (1.0 / 255.0)).astype(out_ref.dtype)


def preprocess_packed_pallas(
    packed: jax.Array,
    seed: jax.Array,
    sample_shape,
    *,
    binarize: bool = True,
    interpret: bool | None = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """int32-packed resident rows (B, words/128, 128) -> f32 (B, *sample_shape).

    out_dtype=bfloat16: see `preprocess_pallas` (exact for binarize=True).

    Fuses the byte unpack with normalize/Bernoulli-binarize in one pass —
    the packed rows are read straight from the resident-gather output, and
    no uint8 tensor ever materializes in HBM.  Matches
    `preprocess_pallas(unpack_sample(packed))` in distribution (exactly, for
    binarize=False).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out_shape = (packed.shape[0],) + tuple(sample_shape)
    if interpret:
        # XLA fallback off-TPU: bitcast unpack + the jnp preprocess path.
        from mmvae_tpu.data import transforms

        u8 = transforms.unpack_sample(packed, sample_shape)
        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(()))
        return transforms.preprocess(u8, rng=key if binarize else None).astype(
            out_dtype
        )
    if packed.ndim == 3 and packed.shape[-1] != _LANE:
        raise ValueError(f"3-D packed rows must end in {_LANE}, got {packed.shape}")
    if packed.ndim not in (2, 3):
        raise ValueError(f"packed rows must be 2-D or 3-D, got {packed.shape}")
    n = packed.size
    cols = _LANE
    if n % cols:
        raise ValueError(f"packed size {n} not divisible by {cols}")
    rows = n // cols
    block_rows = min(_BLOCK_ROWS, rows)
    while rows % block_rows:
        block_rows //= 2
    grid = rows // block_rows
    out = pl.pallas_call(
        functools.partial(_packed_kernel, binarize=binarize),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, 4 * cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows, 4 * cols), out_dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), packed.reshape(rows, cols))
    return out.reshape(out_shape)
