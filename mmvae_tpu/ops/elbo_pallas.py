"""Fused Pallas TPU kernels for the VAE ELBO path.

Contract (BASELINE.json:5): "reparameterization sampling and the BCE+KL ELBO
reduce in a single fused Pallas kernel".  One dataflow fact shapes the design:
the decoder sits *between* sampling and the BCE term (z = sample(mu, logvar) ->
decoder(z) -> logits -> BCE(logits, x)), so sampling and the ELBO reduce cannot
literally share one kernel invocation.  This module therefore fuses maximally
on each side of the decoder:

- `elbo_reduce_pallas(logits, x, mu, logvar) -> (bce_sum, kl_sum)` — the hot
  kernel: a SINGLE fused Pallas reduction over the full negative ELBO.  It
  streams the large logits/x arrays through VMEM in blocks (one HBM pass,
  bandwidth-bound, no intermediate BCE array ever materialized in HBM) and
  folds the (tiny) KL term over mu/logvar into the same kernel on the first
  grid step.
- `reparameterize_pallas(mu, logvar, seed) -> z` — sampling with the on-core
  PRNG (`pltpu.prng_random_bits` + Box-Muller): no host RNG, no eps array in
  HBM, one fused pass.

Both carry `jax.custom_vjp`.  The backward of each is purely elementwise
(d bce/d logits = sigmoid(logits) - x, etc.), for which XLA already emits a
single fused VPU pass — a hand-written Pallas backward would add nothing, so
the VJPs are implemented in XLA and verified against finite differences and
the XLA forward oracle in tests/test_elbo.py.

Numerics match `mmvae_tpu.ops.elbo_ref` (the oracle) to float32 accumulation
order; all sums are f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block geometry for the streaming BCE reduction: (256 x 512) f32 = 512 KiB per
# input block; with double buffering for 2 inputs this stays ~2 MiB of VMEM,
# far under the ~16 MiB/core budget, while blocks are large enough to saturate
# HBM bandwidth.
_BLOCK_ROWS = 256
_BLOCK_COLS = 512
_LANE = 128
_SUBLANE = 8


def _interpret_default() -> bool:
    """Pallas interpret mode off-TPU (CPU tests / fake-device meshes)."""
    return jax.default_backend() != "tpu"


def _pad_flat_2d(a: jax.Array, cols: int, row_mult: int) -> Tuple[jax.Array, int]:
    """Flatten to 1-D, zero-pad, reshape to (rows, cols) with rows % row_mult == 0.

    Returns (padded_2d, n_valid_elements).  Padding is masked out in-kernel,
    so the pad value is irrelevant for the BCE path; for the KL path zeros are
    chosen because KL(0, 0) contributes exactly 0 to the sum.
    """
    n = a.size
    flat = a.reshape(-1)
    rows = max(-(-n // cols), 1)
    rows = -(-rows // row_mult) * row_mult
    pad = rows * cols - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(rows, cols), n


# ---------------------------------------------------------------------------
# Fused ELBO reduction: BCE-with-logits over (logits, x) + KL over (mu, logvar)
# ---------------------------------------------------------------------------


def _elbo_reduce_kernel(
    logits_ref, x_ref, mu_ref, logvar_ref, bce_ref, kl_ref, *, n_valid, block_rows, cols
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        bce_ref[0, 0] = jnp.float32(0.0)
        m = mu_ref[:].astype(jnp.float32)
        lv = logvar_ref[:].astype(jnp.float32)
        # Zero-padded tail contributes -0.5*(1+0-0-1) = 0 per element.
        kl_ref[0, 0] = -0.5 * jnp.sum(1.0 + lv - m * m - jnp.exp(lv))

    l = logits_ref[:].astype(jnp.float32)
    t = x_ref[:].astype(jnp.float32)
    # Stable BCE-with-logits: max(l,0) - l*t + log1p(exp(-|l|)).
    per_elem = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    # Mask out the zero-padded tail via global element index.
    row = jax.lax.broadcasted_iota(jnp.int32, (block_rows, cols), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (block_rows, cols), 1)
    gidx = (i * block_rows + row) * cols + col
    per_elem = jnp.where(gidx < n_valid, per_elem, 0.0)
    bce_ref[0, 0] += jnp.sum(per_elem)


def _elbo_reduce_fwd_impl(logits, x, mu, logvar, interpret):
    if interpret is None:
        interpret = _interpret_default()
    big2d_l, n = _pad_flat_2d(logits, _BLOCK_COLS, _SUBLANE)
    big2d_x, _ = _pad_flat_2d(x, _BLOCK_COLS, _SUBLANE)
    rows = big2d_l.shape[0]
    block_rows = min(_BLOCK_ROWS, rows)
    grid = pl.cdiv(rows, block_rows)
    # Pad rows so the grid tiles exactly (mask handles validity anyway).
    if rows % block_rows:
        extra = grid * block_rows - rows
        big2d_l = jnp.pad(big2d_l, ((0, extra), (0, 0)))
        big2d_x = jnp.pad(big2d_x, ((0, extra), (0, 0)))
    mu2d, _ = _pad_flat_2d(mu, _LANE, _SUBLANE)
    lv2d, _ = _pad_flat_2d(logvar, _LANE, _SUBLANE)

    kernel = functools.partial(
        _elbo_reduce_kernel, n_valid=n, block_rows=block_rows, cols=_BLOCK_COLS
    )
    bce, kl = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, _BLOCK_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, _BLOCK_COLS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mu2d.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(lv2d.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * n, bytes_accessed=2 * 4 * n, transcendentals=2 * n
        ),
        interpret=interpret,
    )(big2d_l, big2d_x, mu2d, lv2d)
    return bce[0, 0], kl[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _elbo_reduce(logits, x, mu, logvar, interpret):
    return _elbo_reduce_fwd_impl(logits, x, mu, logvar, interpret)


def _elbo_reduce_fwd(logits, x, mu, logvar, interpret):
    out = _elbo_reduce_fwd_impl(logits, x, mu, logvar, interpret)
    return out, (logits, x, mu, logvar)


def _elbo_reduce_bwd(interpret, res, g):
    logits, x, mu, logvar = res
    g_bce, g_kl = g
    # Elementwise backward — XLA fuses this into one VPU pass; see module doc.
    l = logits.astype(jnp.float32)
    d_logits = (g_bce * (jax.nn.sigmoid(l) - x.astype(jnp.float32))).astype(logits.dtype)
    d_x = (g_bce * (-l)).astype(x.dtype)
    d_mu = (g_kl * mu.astype(jnp.float32)).astype(mu.dtype)
    d_logvar = (g_kl * 0.5 * (jnp.exp(logvar.astype(jnp.float32)) - 1.0)).astype(
        logvar.dtype
    )
    return d_logits, d_x, d_mu, d_logvar


_elbo_reduce.defvjp(_elbo_reduce_fwd, _elbo_reduce_bwd)


def elbo_reduce_pallas(
    logits: jax.Array,
    x: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    *,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Single fused Pallas kernel for the full negative-ELBO reduction.

    Returns (bce_sum, kl_sum): sum-reduced BCE-with-logits over (logits, x)
    and KL(q(z|x) || N(0, I)) over (mu, logvar), both f32 scalars.  Matches
    `ops.elbo_ref.elbo_parts_ref` (tests/test_elbo.py). Differentiable wrt all
    four tensor args.
    """
    return _elbo_reduce(logits, x, mu, logvar, interpret)


# ---------------------------------------------------------------------------
# Reparameterization sampling with the on-core PRNG
# ---------------------------------------------------------------------------

_TWO_PI = 6.283185307179586


def _box_muller(shape) -> jax.Array:
    """Standard normal samples from two raw-bit draws (Box-Muller).

    Mosaic has no uint32->f32 cast, so bits are kept as int32 and shifted
    logically: the 24 high bits are non-negative in int32, which casts fine.
    """
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    # 24 high bits -> uniform in (0, 1): offset by 2^-25 to keep log() finite.
    u1 = jax.lax.shift_right_logical(b1, 8).astype(jnp.float32) * (
        1.0 / (1 << 24)
    ) + (1.0 / (1 << 25))
    u2 = jax.lax.shift_right_logical(b2, 8).astype(jnp.float32) * (1.0 / (1 << 24))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _reparam_kernel(seed_ref, mu_ref, logvar_ref, z_ref):
    pltpu.prng_seed(seed_ref[0])
    eps = _box_muller(z_ref.shape)
    mu = mu_ref[:].astype(jnp.float32)
    sigma = jnp.exp(0.5 * logvar_ref[:].astype(jnp.float32))
    z_ref[:] = (mu + sigma * eps).astype(z_ref.dtype)


def _reparam_fwd_impl(mu, logvar, seed, interpret):
    if interpret is None:
        interpret = _interpret_default()
    if interpret:
        # pltpu.prng_* has no interpret-mode lowering on CPU; use the XLA
        # sampler off-TPU (same math/VJP; the raw bit-stream differs, which is
        # fine — no cross-platform bit-parity is promised for sampling).
        from mmvae_tpu.ops import elbo_ref

        key = jax.random.PRNGKey(jnp.asarray(seed, jnp.int32).reshape(()))
        return elbo_ref.reparameterize_ref(key, mu, logvar)
    mu2d, n = _pad_flat_2d(mu, _LANE, _SUBLANE)
    lv2d, _ = _pad_flat_2d(logvar, _LANE, _SUBLANE)
    z2d = pl.pallas_call(
        _reparam_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(mu2d.shape, mu.dtype),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1), mu2d, lv2d)
    return z2d.reshape(-1)[:n].reshape(mu.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _reparam(mu, logvar, seed, interpret):
    return _reparam_fwd_impl(mu, logvar, seed, interpret)


def _reparam_fwd(mu, logvar, seed, interpret):
    z = _reparam_fwd_impl(mu, logvar, seed, interpret)
    # Residual sigma*eps = z - mu: enough for both cotangents.
    return z, (z - mu, seed)


def _reparam_bwd(interpret, res, g):
    sig_eps, seed = res
    d_mu = g
    d_logvar = 0.5 * g * sig_eps  # d z / d logvar = 0.5 * sigma * eps
    d_seed = jnp.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return d_mu, d_logvar, d_seed


_reparam.defvjp(_reparam_fwd, _reparam_bwd)


def reparameterize_pallas(
    mu: jax.Array,
    logvar: jax.Array,
    seed: jax.Array,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """z = mu + exp(0.5*logvar) * eps with eps drawn by the on-core TPU PRNG.

    `seed` is an int32 scalar (fold the step counter in upstream).  Matches
    `reparameterize_ref` in distribution (moment tests), and its VJP matches
    analytically (d mu = g, d logvar = 0.5 g (z - mu)).
    """
    return _reparam(mu, logvar, seed, interpret)
