"""Fused Pallas TPU kernel for the ConvLSTM time scan (fwd + custom VJP).

Why this kernel exists (profile evidence, docs/RESULTS.md round 2): after the
decoder fix, the remaining train-step time of the flagship ConvLSTM sequence
VAE is dominated by the two recurrent hidden convolutions — XLA runs each
3x3 conv at 8x8 spatial as a separate HBM-visiting op per time step, and their
backward passes re-stream the (B, 8, 8, C) hidden states from HBM every step.

This kernel runs the ENTIRE T-step recurrence in one `pallas_call`:

- the carried cell state (c, h) lives in VMEM **scratch across grid steps**
  (the TPU grid is sequential, so scratch persists) — zero HBM traffic for the
  recurrent state;
- the 3x3 SAME hidden conv at tiny spatial size is computed as **9 shifted
  MXU matmuls** (a conv IS the sum over taps of shift(h) @ W[tap]): at
  H = W = 8, F = 128 each tap is a (B*64, 128) x (128, 512) contraction —
  exactly MXU-shaped, no im2col materialization;
- gate math (sigmoid/tanh chain, forget bias +1) is fused in f32 on the VPU;
- per-step inputs (the hoisted input projection `xg`) and outputs (h_t, c_t)
  stream through VMEM blocks with Pallas' automatic double buffering;
- the forward saves the post-activation gates (i, f, g, o) as residuals, so
  the backward kernel — the same grid REVERSED — does NO gate recompute: it
  streams (gates_t, c_{t-1}, c_t, h_{t-1}, dh_t), carries (dc, dh) in
  scratch, and accumulates dW into a VMEM-resident block revisited across
  all grid steps.  (A recompute variant was measured first: it raised the
  step's matmul FLOPs by ~26% and lost 5% end-to-end; streaming the 4F-wide
  gates once each way is cheaper than re-running the 9-tap conv per step.)

Semantics match `models.convlstm._HiddenStep` scanned over time (the hoisted
form: gates = xg_t + conv_h(h_{t-1}, W), no bias, i/f/g/o gate order, forget
bias +1) — asserted to f32 tolerance in tests/test_convlstm_fused.py, fwd and
grad, including the time-constant-input decoder path.

Reference lineage: the reference's recurrent core is a stock torch ConvLSTM
(SURVEY.md 2.1); this is its TPU-native replacement (SURVEY.md 7 hard-part 2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# --- Device-tuned kernel constants (VERDICT r2 weak-5) ---------------------
# vmem_limit_bytes=96 MB and the block_b<=32 batch-block cap were MEASURED on
# the dev chip (TPU v5 lite, 128 MiB VMEM); v4/v5p/v6 share the >=128 MiB
# VMEM class so they inherit the v5e values as the best available default —
# validation on those kinds is pending hardware (docs/KERNELS.md
# "Portability").  Pre-v4 chips (v2/v3: 16 MiB VMEM) can't honor a 96 MB
# limit at all: leave the compiler's own default there instead of a number
# measured on different silicon.
_V5E = {"vmem_limit_bytes": 96 * 1024 * 1024, "block_b_cap": 32}
_SMALL_VMEM = {"vmem_limit_bytes": None, "block_b_cap": 16}


@functools.lru_cache(maxsize=None)
def _tuning_for_kind(kind: str) -> dict:
    k = kind.lower()
    if "v2" in k or "v3" in k:
        return _SMALL_VMEM
    return _V5E


def _tuning() -> dict:
    if jax.default_backend() != "tpu":
        return _V5E  # interpret mode: compiler params are inert
    return _tuning_for_kind(jax.devices()[0].device_kind)


def _compiler_params() -> pltpu.CompilerParams:
    limit = _tuning()["vmem_limit_bytes"]
    if limit is None:
        return pltpu.CompilerParams()
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _shift_rows(x: jax.Array, s: int) -> jax.Array:
    """Circular row shift: out[p] = x[(p + s) mod rows] (static s).

    Wrapped rows are always masked by the caller (they correspond to
    out-of-image taps), so circularity is safe.  Implemented as two static
    slices + concat — lowers in both Mosaic and interpret mode.
    """
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _tap_masks(block_b: int, hw: int, width: int, height: int):
    """Validity column-vector per tap: mask[p] = source row of tap k is inside
    the image for target row p.  Rows are (b, y, x) flattened; cross-image
    wraps are exactly the out-of-range (y, x) positions, so one mask covers
    both image borders and batch boundaries."""
    rows = block_b * hw
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    y = (r % hw) // width
    x = r % width
    masks = []
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        ys, xs = y + oy, x + ox
        masks.append(
            (ys >= 0) & (ys < height) & (xs >= 0) & (xs < width)
        )
    return masks


def _tap_stack(h: jax.Array, masks, width: int) -> jax.Array:
    """(rows, F) -> (rows, 9F): the 9 masked shifted tap views, lane-stacked.

    Feeding ONE (rows, 9F) x (9F, 4F) MXU contraction instead of 9 separate
    (rows, F) x (F, 4F) matmuls amortizes matmul issue overhead and deepens
    the contraction (K = 9F = 1152) — measured faster at these shapes."""
    cols = []
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        shifted = _shift_rows(h, oy * width + ox)
        cols.append(jnp.where(masks[k], shifted, jnp.zeros_like(shifted)))
    return jnp.concatenate(cols, axis=1)


def _conv_taps(h: jax.Array, wf_ref, masks, width: int, out_dtype=jnp.float32):
    """sum_k shift_k(h) * mask_k @ W[k] — the 3x3 SAME conv as 9 MXU matmuls.

    wf_ref: (9F, 4F) flat kernel; tap k's slice is wf_ref[kF:(k+1)F].
    Measured: per-tap matmuls beat one lane-stacked (rows, 9F) contraction
    on the FORWARD (the concat serializes against the MXU), while the
    backward's dW contraction wins lane-stacked (see _bwd_kernel)."""
    feat = h.shape[1]
    acc = None
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        shifted = _shift_rows(h, oy * width + ox)
        masked = jnp.where(masks[k], shifted, jnp.zeros_like(shifted))
        part = jax.lax.dot_general(
            masked, wf_ref[k * feat:(k + 1) * feat],
            dimension_numbers=(((1,), (0,)), ((), ())),
            # Mosaic requires 32-bit matmul accumulators; cast to the gate
            # compute dtype only after the f32-accumulated sum.
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc.astype(out_dtype)


def _sigmoid(x: jax.Array) -> jax.Array:
    # jax.nn.sigmoid lowers with f32 literals that Mosaic refuses to
    # broadcast into bf16 vectors; dtype-matched constants lower cleanly.
    one = jnp.asarray(1.0, x.dtype)
    return one / (one + jnp.exp(-x))


def _gates_fwd(gates: jax.Array, c: jax.Array, f: int):
    # Runs in gates.dtype — f32 by default, bf16 when the caller selects
    # gate_dtype=bfloat16 (halves the VPU/scratch cost of the pointwise
    # chain; matches the scanned path's gate_bf16 semantics).
    one = jnp.asarray(1.0, gates.dtype)
    i_, f_, g_, o_ = (
        gates[:, :f], gates[:, f:2 * f], gates[:, 2 * f:3 * f], gates[:, 3 * f:]
    )
    i_ = _sigmoid(i_)
    f_ = _sigmoid(f_ + one)
    g_ = jnp.tanh(g_)
    o_ = _sigmoid(o_)
    c_new = f_ * c + i_ * g_
    h_new = o_ * jnp.tanh(c_new)
    gates_act = jnp.concatenate([i_, f_, g_, o_], axis=1)
    return c_new, h_new, gates_act


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    xg_ref, w_ref, c0_ref, h0_ref, hs_ref, cs_ref, ga_ref, c_s, h_s,
    *, height, width, feat, block_b,
):
    t = pl.program_id(1)
    hw = height * width
    rows = block_b * hw
    cdt = c_s.dtype  # gate-compute dtype (f32 default, bf16 when selected)

    @pl.when(t == 0)
    def _init():
        c_s[:] = c0_ref[:].reshape(rows, feat).astype(cdt)
        h_s[:] = h0_ref[:].reshape(rows, feat).astype(cdt)

    masks = _tap_masks(block_b, hw, width, height)
    h_mat = h_s[:].astype(w_ref.dtype)
    gates = xg_ref[:].reshape(rows, 4 * feat).astype(cdt)
    gates += _conv_taps(h_mat, w_ref, masks, width, out_dtype=cdt)
    c_new, h_new, gates_act = _gates_fwd(gates, c_s[:], feat)
    c_s[:] = c_new
    h_s[:] = h_new
    hs_ref[:] = h_new.reshape(hs_ref.shape).astype(hs_ref.dtype)
    cs_ref[:] = c_new.reshape(cs_ref.shape).astype(cs_ref.dtype)
    # Post-activation gates saved as backward residuals: the BPTT kernel then
    # skips the whole gate-recompute conv (a third of its matmul FLOPs) at the
    # cost of one extra streamed write/read — a clear trade at these shapes.
    ga_ref[:] = gates_act.reshape(ga_ref.shape).astype(ga_ref.dtype)


def _fwd_kernel_nores(
    xg_ref, w_ref, c0_ref, h0_ref, hs_ref, cl_ref, c_s, h_s,
    *, height, width, feat, block_b,
):
    """Residual-free forward for the primal (non-differentiated) path.

    Eval/inference calls don't feed a backward, so writing the (B, T, HW, 4F)
    post-activation gates and the full (B, T, HW, F) cell-state history to HBM
    is pure waste (~3x the kernel's output traffic).  This variant emits only
    hs and the final cell state (one revisited block per batch tile, flushed
    once).
    """
    t = pl.program_id(1)
    hw = height * width
    rows = block_b * hw
    cdt = c_s.dtype  # gate-compute dtype (f32 default, bf16 when selected)

    @pl.when(t == 0)
    def _init():
        c_s[:] = c0_ref[:].reshape(rows, feat).astype(cdt)
        h_s[:] = h0_ref[:].reshape(rows, feat).astype(cdt)

    masks = _tap_masks(block_b, hw, width, height)
    h_mat = h_s[:].astype(w_ref.dtype)
    gates = xg_ref[:].reshape(rows, 4 * feat).astype(cdt)
    gates += _conv_taps(h_mat, w_ref, masks, width, out_dtype=cdt)
    c_new, h_new, _ = _gates_fwd(gates, c_s[:], feat)
    c_s[:] = c_new
    h_s[:] = h_new
    hs_ref[:] = h_new.reshape(hs_ref.shape).astype(hs_ref.dtype)
    cl_ref[:] = c_new.reshape(cl_ref.shape).astype(cl_ref.dtype)


def _fwd_impl_nores(xg, w, c0, h0, height, width, t_out, const_input,
                    interpret, gate_dtype=jnp.float32, last_only=False):
    if interpret is None:
        interpret = _interpret_default()
    batch, t_in, hw, f4 = xg.shape
    feat = f4 // 4
    block_b = _pick_block_b(batch)
    nb = batch // block_b
    grid = (nb, t_out)

    xg_index = (
        (lambda b, t: (b, 0, 0, 0)) if const_input
        else (lambda b, t: (b, t, 0, 0))
    )
    kernel = functools.partial(
        _fwd_kernel_nores, height=height, width=width, feat=feat, block_b=block_b
    )
    flops_step = 2 * batch * hw * 9 * feat * 4 * feat
    # last_only: hs collapses to ONE revisited block per batch tile (flushed
    # once) — the primal writes no per-step history at all.
    hs_shape = (
        (batch, 1, hw, feat) if last_only else (batch, t_out, hw, feat)
    )
    hs_index = (
        (lambda b, t: (b, 0, 0, 0)) if last_only
        else (lambda b, t: (b, t, 0, 0))
    )
    hs, c_last = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1, hw, f4), xg_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * feat, f4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, 1, hw, feat), hs_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(hs_shape, xg.dtype),
            jax.ShapeDtypeStruct((batch, hw, feat), xg.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b * hw, feat), gate_dtype),
            pltpu.VMEM((block_b * hw, feat), gate_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t_out * flops_step,
            bytes_accessed=t_out * (xg.dtype.itemsize * batch * hw * (4 + 1) * feat),
            transcendentals=t_out * batch * hw * 5 * feat,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xg, w, c0, h0)
    return hs, c_last


def _pick_block_b(batch: int, cap: Optional[int] = None) -> int:
    if cap is None:
        cap = _tuning()["block_b_cap"]
    for b in range(min(batch, cap), 0, -1):
        if batch % b == 0:
            return b
    return 1


def _fwd_impl(xg, w, c0, h0, height, width, t_out, const_input, interpret,
              gate_dtype=jnp.float32):
    if interpret is None:
        interpret = _interpret_default()
    batch, t_in, hw, f4 = xg.shape
    feat = f4 // 4
    block_b = _pick_block_b(batch)
    nb = batch // block_b
    grid = (nb, t_out)

    xg_index = (
        (lambda b, t: (b, 0, 0, 0)) if const_input
        else (lambda b, t: (b, t, 0, 0))
    )
    kernel = functools.partial(
        _fwd_kernel, height=height, width=width, feat=feat, block_b=block_b
    )
    flops_step = 2 * batch * hw * 9 * feat * 4 * feat
    hs, cs, gates = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, 1, hw, f4), xg_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * feat, f4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, 1, hw, feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, hw, feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, hw, 4 * feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_out, hw, feat), xg.dtype),
            jax.ShapeDtypeStruct((batch, t_out, hw, feat), xg.dtype),
            jax.ShapeDtypeStruct((batch, t_out, hw, 4 * feat), xg.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b * hw, feat), gate_dtype),
            pltpu.VMEM((block_b * hw, feat), gate_dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t_out * flops_step,
            bytes_accessed=t_out * (xg.dtype.itemsize * batch * hw * (4 + 2) * feat),
            transcendentals=t_out * batch * hw * 5 * feat,
        ),
        # Production shapes (B=64 blocks) want ~26 MB of scoped VMEM — above
        # the 16 MB default but comfortably inside the chip's physical VMEM
        # (128 MB on v5e); big blocks = big MXU contractions per step.
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xg, w, c0, h0)
    return hs, cs, gates


# ---------------------------------------------------------------------------
# Projection-fused forward kernels (encoder path: 1x1 input projection runs
# INSIDE the recurrence kernel)
# ---------------------------------------------------------------------------
#
# Motivation (profile, docs/RESULTS.md round 5): with the projection outside,
# the (B, T, hw, 4F) xg tensor costs ~0.57 ms/step of pure HBM traffic at
# production shapes — proj-fwd write 84 MB, kernel read 84 MB, kernel dxg
# write 84 MB, proj-bwd dx/dW/db reads — all bandwidth-floor ops.  Computing
# gates = x_t @ Wx + b + conv_h(h) in-kernel streams the 4x-narrower feats
# (21 MB) instead, adds ~11% kernel matmul FLOPs, and accumulates dWx/db in
# VMEM scratch alongside dW.  Only the streaming + last_only (encoder) shape
# is supported — every proj-fused call site consumes just the terminal state.


def _fwd_proj_kernel(
    x_ref, wx_ref, bx_ref, w_ref, c0_ref, h0_ref, hs_ref, cs_ref, ga_ref,
    c_s, h_s, *, height, width, feat, block_b,
):
    t = pl.program_id(1)
    hw = height * width
    rows = block_b * hw
    cdt = c_s.dtype

    @pl.when(t == 0)
    def _init():
        c_s[:] = c0_ref[:].reshape(rows, feat).astype(cdt)
        h_s[:] = h0_ref[:].reshape(rows, feat).astype(cdt)

    masks = _tap_masks(block_b, hw, width, height)
    h_mat = h_s[:].astype(w_ref.dtype)
    cin = x_ref.shape[-1]
    x_mat = x_ref[:].reshape(rows, cin).astype(wx_ref.dtype)
    gates = jax.lax.dot_general(
        x_mat, wx_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gates = (gates + bx_ref[:].astype(jnp.float32)).astype(cdt)
    gates += _conv_taps(h_mat, w_ref, masks, width, out_dtype=cdt)
    c_new, h_new, gates_act = _gates_fwd(gates, c_s[:], feat)
    c_s[:] = c_new
    h_s[:] = h_new
    hs_ref[:] = h_new.reshape(hs_ref.shape).astype(hs_ref.dtype)
    cs_ref[:] = c_new.reshape(cs_ref.shape).astype(cs_ref.dtype)
    ga_ref[:] = gates_act.reshape(ga_ref.shape).astype(ga_ref.dtype)


def _fwd_proj_kernel_nores(
    x_ref, wx_ref, bx_ref, w_ref, c0_ref, h0_ref, hl_ref, cl_ref, c_s, h_s,
    *, height, width, feat, block_b,
):
    t = pl.program_id(1)
    hw = height * width
    rows = block_b * hw
    cdt = c_s.dtype

    @pl.when(t == 0)
    def _init():
        c_s[:] = c0_ref[:].reshape(rows, feat).astype(cdt)
        h_s[:] = h0_ref[:].reshape(rows, feat).astype(cdt)

    masks = _tap_masks(block_b, hw, width, height)
    h_mat = h_s[:].astype(w_ref.dtype)
    cin = x_ref.shape[-1]
    x_mat = x_ref[:].reshape(rows, cin).astype(wx_ref.dtype)
    gates = jax.lax.dot_general(
        x_mat, wx_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gates = (gates + bx_ref[:].astype(jnp.float32)).astype(cdt)
    gates += _conv_taps(h_mat, w_ref, masks, width, out_dtype=cdt)
    c_new, h_new, _ = _gates_fwd(gates, c_s[:], feat)
    c_s[:] = c_new
    h_s[:] = h_new
    hl_ref[:] = h_new.reshape(hl_ref.shape).astype(hl_ref.dtype)
    cl_ref[:] = c_new.reshape(cl_ref.shape).astype(cl_ref.dtype)


def _fwd_proj_impl(x, wx, bx, w, c0, h0, height, width, interpret,
                   gate_dtype=jnp.float32, nores=False):
    if interpret is None:
        interpret = _interpret_default()
    batch, t_out, hw, cin = x.shape
    f4 = w.shape[-1]
    feat = f4 // 4
    block_b = _pick_block_b(batch)
    nb = batch // block_b
    grid = (nb, t_out)

    flops_step = 2 * batch * hw * (9 * feat + cin) * f4
    common = dict(height=height, width=width, feat=feat, block_b=block_b)
    in_specs = [
        pl.BlockSpec((block_b, 1, hw, cin), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, f4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((9 * feat, f4), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((block_b * hw, feat), gate_dtype),
        pltpu.VMEM((block_b * hw, feat), gate_dtype),
    ]
    params = _compiler_params()
    if nores:
        hl, cl = pl.pallas_call(
            functools.partial(_fwd_proj_kernel_nores, **common),
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, hw, feat), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((batch, hw, feat), x.dtype),
                jax.ShapeDtypeStruct((batch, hw, feat), x.dtype),
            ),
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=t_out * flops_step,
                bytes_accessed=t_out * (x.dtype.itemsize * batch * hw * cin),
                transcendentals=t_out * batch * hw * 5 * feat,
            ),
            compiler_params=params,
            interpret=interpret,
        )(x, wx, bx, w, c0, h0)
        return hl, cl
    hs, cs, gates = pl.pallas_call(
        functools.partial(_fwd_proj_kernel, **common),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_b, 1, hw, feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, hw, feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, hw, 4 * feat), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_out, hw, feat), x.dtype),
            jax.ShapeDtypeStruct((batch, t_out, hw, feat), x.dtype),
            jax.ShapeDtypeStruct((batch, t_out, hw, 4 * feat), x.dtype),
        ),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=t_out * flops_step,
            bytes_accessed=t_out * (x.dtype.itemsize * batch * hw * (cin + 6 * feat)),
            transcendentals=t_out * batch * hw * 5 * feat,
        ),
        compiler_params=params,
        interpret=interpret,
    )(x, wx, bx, w, c0, h0)
    return hs, cs, gates


def _bwd_proj_kernel(
    wt_ref, wxt_ref, x_ref, c0_ref, h0_ref, hsp_ref, csp_ref, cst_ref, ga_ref,
    dhl_ref, dcl_ref,
    dx_ref, dwx_ref, dbx_ref, dw_ref, dc0_ref, dh0_ref,
    dc_s, dh_s,
    *, height, width, feat, block_b, t_total,
):
    b_i = pl.program_id(0)
    i = pl.program_id(1)          # 0 .. T-1, walking time BACKWARD
    t = t_total - 1 - i
    hw = height * width
    rows = block_b * hw
    f32 = jnp.float32
    cdt = f32  # backward chain is f32 regardless of gate_dtype (see _bwd_kernel)

    @pl.when(i == 0)
    def _init_carry():
        # last_only semantics: the h-cotangent enters once at t = T-1.
        dh_s[:] = dhl_ref[:].reshape(rows, feat).astype(cdt)
        dc_s[:] = dcl_ref[:].reshape(rows, feat).astype(cdt)

    @pl.when((b_i == 0) & (i == 0))
    def _init_dw():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)
        dwx_ref[:] = jnp.zeros(dwx_ref.shape, dwx_ref.dtype)
        dbx_ref[:] = jnp.zeros(dbx_ref.shape, dbx_ref.dtype)

    masks = _tap_masks(block_b, hw, width, height)

    is_first = t == 0
    h_prev = jnp.where(
        is_first,
        h0_ref[:].reshape(rows, feat).astype(cdt),
        hsp_ref[:].reshape(rows, feat).astype(cdt),
    )
    c_prev = jnp.where(
        is_first,
        c0_ref[:].reshape(rows, feat).astype(cdt),
        csp_ref[:].reshape(rows, feat).astype(cdt),
    )
    c_t = cst_ref[:].reshape(rows, feat).astype(cdt)
    ga = ga_ref[:].reshape(rows, 4 * feat).astype(cdt)
    i_ = ga[:, :feat]
    f_ = ga[:, feat:2 * feat]
    g_ = ga[:, 2 * feat:3 * feat]
    o_ = ga[:, 3 * feat:]

    dh = dh_s[:]
    dc = dc_s[:]

    one = jnp.asarray(1.0, cdt)
    tanh_ct = jnp.tanh(c_t)
    do = dh * tanh_ct
    dct = dc + dh * o_ * (one - tanh_ct * tanh_ct)
    di = dct * g_
    dg = dct * i_
    df = dct * c_prev
    dc_prev = dct * f_

    dgates = jnp.concatenate(
        [
            di * i_ * (one - i_),
            df * f_ * (one - f_),
            dg * (one - g_ * g_),
            do * o_ * (one - o_),
        ],
        axis=1,
    )

    # Input-projection backward, all in-kernel:
    # dx_t = dgates @ Wx^T; dWx += x_t^T @ dgates; db += row-sum(dgates)
    # (as (8, 4F) sublane partials — the caller sums the 8 rows).
    dg_mat = dgates.astype(wt_ref.dtype)
    cin = dx_ref.shape[-1]
    dx = jax.lax.dot_general(
        dg_mat, wxt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dx_ref[:] = dx.reshape(dx_ref.shape).astype(dx_ref.dtype)
    x_mat = x_ref[:].reshape(rows, cin).astype(wt_ref.dtype)
    dwx_ref[:] += jax.lax.dot_general(
        x_mat, dg_mat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dbx_ref[:] += jnp.sum(
        dgates.reshape(rows // 8, 8, 4 * feat), axis=0
    )

    # dh_prev: one (rows, 4F) x (4F, 9F) matmul, masked/shifted per tap.
    part_all = jax.lax.dot_general(
        dg_mat, wt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dh_prev = None
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        part = part_all[:, k * feat:(k + 1) * feat]
        part = jnp.where(masks[k], part, jnp.zeros_like(part))
        part = _shift_rows(part, -(oy * width + ox))
        dh_prev = part if dh_prev is None else dh_prev + part

    h_taps = _tap_stack(h_prev.astype(wt_ref.dtype), masks, width)
    dw_ref[:] += jax.lax.dot_general(
        h_taps, dg_mat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    dh_s[:] = dh_prev
    dc_s[:] = dc_prev

    @pl.when(i == t_total - 1)
    def _final():
        dh0_ref[:] = dh_prev.reshape(dh0_ref.shape).astype(dh0_ref.dtype)
        dc0_ref[:] = dc_prev.reshape(dc0_ref.shape).astype(dc0_ref.dtype)


def _bwd_proj_impl(
    wx, w, x, c0, h0, hs, cs, gates, dh_last, dc_last,
    height, width, t_out, interpret, gate_dtype=jnp.float32,
):
    if interpret is None:
        interpret = _interpret_default()
    batch, _, hw, f4 = gates.shape
    feat = f4 // 4
    cin = x.shape[-1]
    block_b = _pick_block_b(batch)
    nb = batch // block_b
    grid = (nb, t_out)
    t_total = t_out

    wtf = w.reshape(9, feat, f4).transpose(2, 0, 1).reshape(f4, 9 * feat)
    wxt = wx.T  # (4F, C)

    def rev(b, i):
        return (b, t_total - 1 - i, 0, 0)

    def rev_prev(b, i):
        return (b, jnp.maximum(t_total - 2 - i, 0), 0, 0)

    kernel = functools.partial(
        _bwd_proj_kernel, height=height, width=width, feat=feat,
        block_b=block_b, t_total=t_total,
    )
    bspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    flops_step = 2 * 2 * batch * hw * (9 * feat + cin) * f4
    dx, dwx, dbx8, dw, dc0, dh0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((f4, 9 * feat), lambda b, i: (0, 0)),   # w^T flat
            bspec((f4, cin), lambda b, i: (0, 0)),        # wx^T
            bspec((block_b, 1, hw, cin), rev),            # x[t]
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, 1, hw, feat), rev_prev),      # hs[t-1]
            bspec((block_b, 1, hw, feat), rev_prev),      # cs[t-1]
            bspec((block_b, 1, hw, feat), rev),           # cs[t]
            bspec((block_b, 1, hw, f4), rev),             # gates[t] (saved)
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),  # dh_last
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),  # dc_last
        ],
        out_specs=(
            bspec((block_b, 1, hw, cin), rev),
            bspec((cin, f4), lambda b, i: (0, 0)),
            bspec((8, f4), lambda b, i: (0, 0)),
            bspec((9 * feat, f4), lambda b, i: (0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, t_out, hw, cin), x.dtype),
            jax.ShapeDtypeStruct((cin, f4), jnp.float32),
            jax.ShapeDtypeStruct((8, f4), jnp.float32),
            jax.ShapeDtypeStruct((9 * feat, f4), jnp.float32),
            jax.ShapeDtypeStruct((batch, hw, feat), c0.dtype),
            jax.ShapeDtypeStruct((batch, hw, feat), h0.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b * hw, feat), jnp.float32),
            pltpu.VMEM((block_b * hw, feat), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t_out * flops_step,
            bytes_accessed=t_out * (gates.dtype.itemsize * batch * hw * (2 * cin + 10 * feat)),
            transcendentals=t_out * batch * hw * feat,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(wtf, wxt, x, c0, h0, hs, cs, cs, gates, dh_last, dc_last)
    dbx = jnp.sum(dbx8, axis=0, keepdims=True)  # (1, 4F), matching bx's shape
    return dx, dwx, dbx, dw, dc0, dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _scan_proj_last(x, wx, bx, w, c0, h0, height, width, interpret,
                    gate_dtype):
    hl, cl = _fwd_proj_impl(
        x, wx, bx, w, c0, h0, height, width, interpret,
        gate_dtype=gate_dtype, nores=True,
    )
    return hl, cl


def _scan_proj_last_fwd(x, wx, bx, w, c0, h0, height, width, interpret,
                        gate_dtype):
    hs, cs, gates = _fwd_proj_impl(
        x, wx, bx, w, c0, h0, height, width, interpret, gate_dtype=gate_dtype
    )
    res = (x, wx, w, c0, h0, hs, cs, gates)
    return (hs[:, -1], cs[:, -1]), res


def _scan_proj_last_bwd(height, width, interpret, gate_dtype, res, cot):
    x, wx, w, c0, h0, hs, cs, gates = res
    dh_last, dc_last = cot
    dh_last = dh_last.astype(hs.dtype)
    dc_last = dc_last.astype(c0.dtype)
    t_out = gates.shape[1]
    dx, dwx, dbx, dw, dc0, dh0 = _bwd_proj_impl(
        wx, w, x, c0, h0, hs, cs, gates, dh_last, dc_last,
        height, width, t_out, interpret, gate_dtype=gate_dtype,
    )
    return (
        dx.astype(x.dtype), dwx.astype(wx.dtype), dbx.astype(wx.dtype),
        dw.astype(w.dtype), dc0, dh0,
    )


_scan_proj_last.defvjp(_scan_proj_last_fwd, _scan_proj_last_bwd)


def convlstm_scan_proj_pallas(
    x: jax.Array,
    wx: jax.Array,
    bx: jax.Array,
    w: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    *,
    interpret: bool | None = None,
    gate_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Fused ConvLSTM recurrence WITH the 1x1 input projection in-kernel.

    gates_t = x_t @ wx + bx + conv3x3(h_{t-1}, w); returns only the terminal
    (c_T, h_T) — the encoder shape.  The (B, T, H, W, 4F) projected-gates
    tensor never exists in HBM (it cost ~0.57 ms/step of pure bandwidth at
    production shapes when materialized; see module notes).

    Args:
      x:  (B, T, H, W, C) per-step features (streaming input).
      wx: (C, 4F) projection matrix; bx: (4F,) bias.
      w:  (3, 3, F, 4F) hidden conv kernel (HWIO).
      c0, h0: (B, H, W, F) initial state.
    Returns (c_T, h_T), each (B, H, W, F).  Differentiable wrt all tensors.
    """
    batch, t_in, height, width, cin = x.shape
    f4 = w.shape[-1]
    feat = f4 // 4
    x2 = x.reshape(batch, t_in, height * width, cin)
    w2 = w.reshape(9 * feat, f4)
    c02 = c0.reshape(batch, height * width, feat)
    h02 = h0.reshape(batch, height * width, feat)
    hl, cl = _scan_proj_last(
        x2, wx, bx.reshape(1, f4), w2, c02, h02, height, width, interpret,
        jnp.dtype(gate_dtype),
    )
    c_T = cl.reshape(batch, height, width, feat).astype(c0.dtype)
    h_T = hl.reshape(batch, height, width, feat)
    return c_T, h_T


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    wt_ref, c0_ref, h0_ref, hsp_ref, csp_ref, cst_ref, ga_ref,
    dhs_ref, dcl_ref,
    dxg_ref, dw_ref, dc0_ref, dh0_ref,
    dc_s, dh_s, dxg_s,
    *, height, width, feat, block_b, t_total, const_input, last_only=False,
    dxg_stream=False,
):
    b_i = pl.program_id(0)
    i = pl.program_id(1)          # 0 .. T-1, walking time BACKWARD
    t = t_total - 1 - i           # actual time step
    hw = height * width
    rows = block_b * hw
    f32 = jnp.float32
    # The backward chain computes in f32 regardless of gate_dtype: TPU VPUs
    # compute in f32 anyway (bf16 is a storage format), so a bf16 chain here
    # just adds pack/unpack conversions — measured slower.  The forward DOES
    # honor gate_dtype (bf16 scratch avoids per-step f32->bf16 converts of h
    # before the MXU).
    cdt = f32

    @pl.when(i == 0)
    def _init_carry():
        # last_only: the caller consumed ONLY h_T, so the h-cotangent enters
        # once here (dhs_ref is then a single (block_b, hw, feat) block) and
        # no per-step dhs stream exists at all.
        if last_only:
            dh_s[:] = dhs_ref[:].reshape(rows, feat).astype(cdt)
        else:
            dh_s[:] = jnp.zeros((rows, feat), cdt)
        dc_s[:] = dcl_ref[:].reshape(rows, feat).astype(cdt)

    @pl.when((b_i == 0) & (i == 0))
    def _init_dw():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    masks = _tap_masks(block_b, hw, width, height)

    # Residuals: previous state (h0/c0 at t == 0, else stored step t-1) and
    # the forward's saved post-activation gates — no gate recompute.
    is_first = t == 0
    h_prev = jnp.where(
        is_first,
        h0_ref[:].reshape(rows, feat).astype(cdt),
        hsp_ref[:].reshape(rows, feat).astype(cdt),
    )
    c_prev = jnp.where(
        is_first,
        c0_ref[:].reshape(rows, feat).astype(cdt),
        csp_ref[:].reshape(rows, feat).astype(cdt),
    )
    c_t = cst_ref[:].reshape(rows, feat).astype(cdt)
    ga = ga_ref[:].reshape(rows, 4 * feat).astype(cdt)
    i_ = ga[:, :feat]
    f_ = ga[:, feat:2 * feat]
    g_ = ga[:, 2 * feat:3 * feat]
    o_ = ga[:, 3 * feat:]

    # Upstream: dh from the per-step cotangent + the recurrent carry;
    # dc only from the carry (the c-chain cotangent enters once via dc_last).
    if last_only:
        dh = dh_s[:]
    else:
        dh = dh_s[:] + dhs_ref[:].reshape(rows, feat).astype(cdt)
    dc = dc_s[:]

    one = jnp.asarray(1.0, cdt)
    tanh_ct = jnp.tanh(c_t)
    do = dh * tanh_ct
    dct = dc + dh * o_ * (one - tanh_ct * tanh_ct)
    di = dct * g_
    dg = dct * i_
    df = dct * c_prev
    dc_prev = dct * f_

    dgates = jnp.concatenate(
        [
            di * i_ * (one - i_),
            df * f_ * (one - f_),
            dg * (one - g_ * g_),
            do * o_ * (one - o_),
        ],
        axis=1,
    )

    # d xg_t = dgates (identity path through the + in gates = xg + conv(h)).
    if const_input and not dxg_stream:
        # Accumulate in f32 scratch and store ONCE at the end: a revisited
        # output block would serialize against its own flush and defeat
        # store double-buffering (measured slower).
        @pl.when(i == 0)
        def _init_dxg():
            dxg_s[:] = jnp.zeros(dxg_s.shape, dxg_s.dtype)
        dxg_s[:] += dgates

        @pl.when(i == t_total - 1)
        def _store_dxg():
            dxg_ref[:] = dxg_s[:].reshape(dxg_ref.shape).astype(dxg_ref.dtype)
    else:
        # dxg_stream (const input): per-step dgates go to DISTINCT output
        # blocks (double-buffered stores, no serializing accumulator); the
        # caller sums over T outside the kernel.
        dxg_ref[:] = dgates.reshape(dxg_ref.shape).astype(dxg_ref.dtype)

    # dh_prev = transpose of (mask . shift) conv.  ONE (rows, 4F) x (4F, 9F)
    # matmul yields all 9 tap products at once (wt_ref is the flat transpose
    # wtf[c, k*F+f] = W[k, f, c]); each (rows, F) slice is then masked and
    # shifted back.  The row-wise mask commutes with the row-independent
    # matmul ((mask . dg) @ Wt == mask . (dg @ Wt)), so masking the product
    # slice costs 4x fewer VPU selects than masking the 4F-wide operand.
    dg_mat = dgates.astype(wt_ref.dtype)
    part_all = jax.lax.dot_general(
        dg_mat, wt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (rows, 9F); f32 MXU accumulation
    dh_prev = None
    for k in range(9):
        oy, ox = k // 3 - 1, k % 3 - 1
        part = part_all[:, k * feat:(k + 1) * feat]
        part = jnp.where(masks[k], part, jnp.zeros_like(part))
        part = _shift_rows(part, -(oy * width + ox))
        dh_prev = part if dh_prev is None else dh_prev + part

    # dW[k*F+f, :] += (mask_k . shift_k(h_prev))^T @ dgates — the 9 taps
    # lane-stacked into one (9F, rows) x (rows, 4F) contraction, accumulated
    # across the whole grid in the VMEM-resident flat dw block.
    h_taps = _tap_stack(h_prev.astype(wt_ref.dtype), masks, width)
    dw_ref[:] += jax.lax.dot_general(
        h_taps, dg_mat,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    dh_s[:] = dh_prev
    dc_s[:] = dc_prev

    @pl.when(i == t_total - 1)
    def _final():
        dh0_ref[:] = dh_prev.reshape(dh0_ref.shape).astype(dh0_ref.dtype)
        dc0_ref[:] = dc_prev.reshape(dc0_ref.shape).astype(dc0_ref.dtype)


def _bwd_impl(
    w, c0, h0, hs, cs, gates, dhs, dc_last,
    height, width, t_out, const_input, interpret, xg_t_in, xg_dtype,
    gate_dtype=jnp.float32, last_only=False, dxg_stream=False,
):
    """dxg_stream (const-input path only): stream per-step dgates to distinct
    HBM blocks in xg's dtype and sum over T outside (one fused XLA reduce)
    instead of accumulating in a VMEM scratch block.  Trades the scratch
    `+=` + end-of-grid flush for T double-buffered stores plus an extra
    B*T*HW*4F HBM round trip — measured slower at the production decoder
    shape (see docs/RESULTS.md round-5 note), kept as a measured-off knob."""
    if interpret is None:
        interpret = _interpret_default()
    batch, _, hw, f4 = gates.shape
    feat = f4 // 4
    block_b = _pick_block_b(batch)
    nb = batch // block_b
    grid = (nb, t_out)
    t_total = t_out
    stream = bool(const_input and dxg_stream)

    # (4F, 9F) flat transpose: wtf[c, k*F + f] = W[k, f, c] -> dh taps come
    # out of ONE (rows, 4F) x (4F, 9F) matmul, sliced per tap.
    wtf = w.reshape(9, feat, f4).transpose(2, 0, 1).reshape(f4, 9 * feat)

    def rev(b, i):
        return (b, t_total - 1 - i, 0, 0)

    def rev_prev(b, i):
        # Block t-1 clamped at 0; the kernel switches to h0/c0 when t == 0.
        return (b, jnp.maximum(t_total - 2 - i, 0), 0, 0)

    dxg_index = (lambda b, i: (b, 0, 0, 0)) if (const_input and not stream) else rev

    kernel = functools.partial(
        _bwd_kernel, height=height, width=width, feat=feat,
        block_b=block_b, t_total=t_total, const_input=const_input,
        last_only=last_only, dxg_stream=stream,
    )
    bspec = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    flops_step = 2 * 2 * batch * hw * 9 * feat * 4 * feat
    dhs_spec = (
        # last_only: dhs is just dh_last (batch, hw, feat), read once per b.
        bspec((block_b, hw, feat), lambda b, i: (b, 0, 0))
        if last_only
        else bspec((block_b, 1, hw, feat), rev)        # dhs[t]
    )
    dxg, dw, dc0, dh0 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bspec((f4, 9 * feat), lambda b, i: (0, 0)),   # w^T flat
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, 1, hw, feat), rev_prev),   # hs[t-1]
            bspec((block_b, 1, hw, feat), rev_prev),   # cs[t-1]
            bspec((block_b, 1, hw, feat), rev),        # cs[t]
            bspec((block_b, 1, hw, f4), rev),          # gates[t] (saved)
            dhs_spec,
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),  # dc_last
        ],
        out_specs=(
            bspec((block_b, 1, hw, f4), dxg_index),
            bspec((9 * feat, f4), lambda b, i: (0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
            bspec((block_b, hw, feat), lambda b, i: (b, 0, 0)),
        ),
        out_shape=(
            # const-input dxg accumulates over all T steps -> keep it f32
            # (streamed variant emits per-step blocks in xg's dtype instead).
            jax.ShapeDtypeStruct(
                (batch, t_out if stream or not const_input else xg_t_in, hw, f4),
                xg_dtype if stream or not const_input else jnp.float32,
            ),
            jax.ShapeDtypeStruct((9 * feat, f4), jnp.float32),
            jax.ShapeDtypeStruct((batch, hw, feat), c0.dtype),
            jax.ShapeDtypeStruct((batch, hw, feat), h0.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b * hw, feat), jnp.float32),
            pltpu.VMEM((block_b * hw, feat), jnp.float32),
            # dxg accumulator (const-input accum path); minimal when unused.
            pltpu.VMEM(
                (block_b * hw, 4 * feat) if (const_input and not stream)
                else (8, 128),
                jnp.float32,
            ),
        ],
        cost_estimate=pl.CostEstimate(
            flops=t_out * flops_step,
            bytes_accessed=t_out * (gates.dtype.itemsize * batch * hw * 12 * feat),
            transcendentals=t_out * batch * hw * feat,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(wtf, c0, h0, hs, cs, cs, gates, dhs, dc_last)
    if stream:
        # Per-step dgates blocks -> the const input's single-step cotangent.
        dxg = dxg.astype(jnp.float32).sum(axis=1, keepdims=True)
    return dxg.astype(xg_dtype), dw.astype(w.dtype), dc0, dh0


# ---------------------------------------------------------------------------
# custom_vjp wrapper + public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _scan(xg, w, c0, h0, height, width, t_out, const_input, interpret,
          gate_dtype):
    # Primal-only path (no jax.grad will consume this call): use the
    # residual-free forward — no gates / cell-state history written to HBM.
    # Under differentiation jax runs _scan_fwd instead, which saves residuals.
    return _fwd_impl_nores(
        xg, w, c0, h0, height, width, t_out, const_input, interpret,
        gate_dtype=gate_dtype,
    )


def _scan_fwd(xg, w, c0, h0, height, width, t_out, const_input, interpret,
              gate_dtype):
    hs, cs, gates = _fwd_impl(
        xg, w, c0, h0, height, width, t_out, const_input, interpret,
        gate_dtype=gate_dtype,
    )
    # xg itself is NOT a residual: the saved post-activation gates carry
    # everything the backward needs (dxg == pre-activation dgates).
    res = (w, c0, h0, hs, cs, gates)
    return (hs, cs[:, -1]), res


def _scan_bwd(height, width, t_out, const_input, interpret, gate_dtype,
              res, cot):
    w, c0, h0, hs, cs, gates = res
    dhs, dc_last = cot
    dhs = dhs.astype(hs.dtype)
    dc_last = dc_last.astype(c0.dtype)
    # Static facts, re-derived (never routed through residuals, which trace):
    # xg had t_in == 1 iff const_input; its dtype equals the fwd outputs'.
    xg_t_in = 1 if const_input else t_out
    dxg, dw, dc0, dh0 = _bwd_impl(
        w, c0, h0, hs, cs, gates, dhs, dc_last,
        height, width, t_out, const_input, interpret, xg_t_in, hs.dtype,
        gate_dtype=gate_dtype,
    )
    return dxg, dw, dc0, dh0


_scan.defvjp(_scan_fwd, _scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _scan_last(xg, w, c0, h0, height, width, t_out, const_input, interpret,
               gate_dtype):
    # last_only variant: the caller consumes ONLY the terminal (h_T, c_T)
    # (e.g. the encoder head).  The primal writes no hs history at all, and
    # the backward takes the h-cotangent as ONE (B, hw, F) block instead of a
    # T-step stream — XLA otherwise materializes a dense mostly-zero dhs
    # (pad of dh_T) plus a 21 MB layout copy at the custom-call boundary.
    hs1, c_last = _fwd_impl_nores(
        xg, w, c0, h0, height, width, t_out, const_input, interpret,
        gate_dtype=gate_dtype, last_only=True,
    )
    return hs1[:, 0], c_last


def _scan_last_fwd(xg, w, c0, h0, height, width, t_out, const_input,
                   interpret, gate_dtype):
    hs, cs, gates = _fwd_impl(
        xg, w, c0, h0, height, width, t_out, const_input, interpret,
        gate_dtype=gate_dtype,
    )
    res = (w, c0, h0, hs, cs, gates)
    return (hs[:, -1], cs[:, -1]), res


def _scan_last_bwd(height, width, t_out, const_input, interpret, gate_dtype,
                   res, cot):
    w, c0, h0, hs, cs, gates = res
    dh_last, dc_last = cot
    dh_last = dh_last.astype(hs.dtype)
    dc_last = dc_last.astype(c0.dtype)
    xg_t_in = 1 if const_input else t_out
    dxg, dw, dc0, dh0 = _bwd_impl(
        w, c0, h0, hs, cs, gates, dh_last, dc_last,
        height, width, t_out, const_input, interpret, xg_t_in, hs.dtype,
        gate_dtype=gate_dtype, last_only=True,
    )
    return dxg, dw, dc0, dh0


_scan_last.defvjp(_scan_last_fwd, _scan_last_bwd)


def convlstm_scan_pallas(
    xg: jax.Array,
    w: jax.Array,
    c0: jax.Array,
    h0: jax.Array,
    *,
    length: int | None = None,
    interpret: bool | None = None,
    gate_dtype: jnp.dtype = jnp.float32,
    last_only: bool = False,
) -> Tuple[Tuple[jax.Array, jax.Array], jax.Array | None]:
    """Run the full ConvLSTM hidden recurrence as one fused Pallas kernel.

    Args:
      xg: (B, T, H, W, 4F) hoisted input projections (bias included), or
          (B, 1, H, W, 4F) with `length=T` for a time-constant input (the
          decoder's z-token) — the constant block is then read once per step
          straight from VMEM, never materialized T times.
      w:  (3, 3, F, 4F) hidden conv kernel (HWIO, same as flax nn.Conv).
      c0, h0: (B, H, W, F) initial state.

    Returns ((c_T, h_T), hs) with hs (B, T, H, W, F) — the same contract as
    `models.convlstm.ConvLSTM.__call__`.  Differentiable wrt all tensor args.
    """
    batch, t_in, height, width, f4 = xg.shape
    feat = f4 // 4
    t_out = length or t_in
    const_input = t_in == 1 and t_out > 1
    xg2 = xg.reshape(batch, t_in, height * width, f4)
    w2 = w.reshape(9 * feat, f4)
    c02 = c0.reshape(batch, height * width, feat)
    h02 = h0.reshape(batch, height * width, feat)
    if last_only:
        # Caller consumes only the terminal state (e.g. the encoder): hs is
        # never exposed, so no dense per-step h-cotangent ever exists.
        h_last, c_last = _scan_last(
            xg2, w2, c02, h02, height, width, t_out, const_input, interpret,
            jnp.dtype(gate_dtype),
        )
        c_T = c_last.reshape(batch, height, width, feat).astype(c0.dtype)
        h_T = h_last.reshape(batch, height, width, feat)
        return (c_T, h_T), None
    hs, c_last = _scan(
        xg2, w2, c02, h02, height, width, t_out, const_input, interpret,
        jnp.dtype(gate_dtype),
    )
    hs = hs.reshape(batch, t_out, height, width, feat)
    c_T = c_last.reshape(batch, height, width, feat).astype(c0.dtype)
    h_T = hs[:, -1]
    return (c_T, h_T), hs
