"""ConvLSTM (Shi et al. 2015), TPU-shaped.

Parity target: the reference's recurrent core (SURVEY.md 2.1 "ConvLSTM seq
VAE": ConvLSTM cell(s) over the 20-frame sequence).  TPU-first design:

- **Hoisted input projection**: conv([x, h]) is split into
  conv_x(x) + conv_h(h) (same function class — a concat conv IS the sum of two
  convs on the split).  conv_x over ALL timesteps runs as ONE batched
  convolution over B*T frames outside the scan (a single large MXU
  contraction), so the sequential loop carries only the hidden-conv — half
  the per-step FLOPs, and the parallel half runs at full MXU utilization.
- **Constant-input fast path**: decoder ConvLSTMs driven by a time-constant
  z-token compute conv_x once and reuse it every step (`broadcast_in_time`).
- All four gates per conv come out as one 4F-channel tensor; NHWC; f32 gate
  math regardless of activation dtype; forget bias +1.
- `nn.scan` over time (lax.scan under jit); `remat=True` rematerializes the
  cell in backprop for long sequences (config 5, SURVEY.md section 5).

`ConvLSTMCell` (the concat form) is kept as the reference-equation cell: the
torch-parity test (tests/test_parity_torch.py) pins its numerics, and
tests/test_models.py asserts the hoisted `ConvLSTM` matches the concat cell
exactly when given the split kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

State = Tuple[jax.Array, jax.Array]  # (c, h), each (B, H, W, C)


def _gate_math(
    gates: jax.Array, c: jax.Array, out_dtype, compute_dtype=jnp.float32
) -> Tuple[jax.Array, jax.Array]:
    """i,f,g,o gate order; forget bias +1; f32 internally by default.

    `compute_dtype=bfloat16` halves the VPU/HBM cost of the pointwise gate
    chain; the cell state then accumulates in bf16 too (acceptable for the
    short 10-100-step recurrences here — validated by the convergence runs,
    and the f32 default remains for parity tests).
    """
    gates = gates.astype(compute_dtype)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f + 1.0)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c.astype(compute_dtype) + i * g
    h_new = o * jnp.tanh(c_new)
    return c_new.astype(out_dtype), h_new.astype(out_dtype)


class ConvLSTMCell(nn.Module):
    """One step in the canonical concat form: gates = conv([x, h])."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state: State, x: jax.Array) -> Tuple[State, jax.Array]:
        c, h = state
        xh = jnp.concatenate([x, h], axis=-1).astype(self.dtype)
        gates = nn.Conv(
            4 * self.features, self.kernel, padding="SAME",
            dtype=self.dtype, name="gates",
        )(xh)
        c_new, h_new = _gate_math(gates, c, x.dtype)
        return (c_new, h_new), h_new

    @staticmethod
    def initial_state(
        batch: int, height: int, width: int, features: int, dtype=jnp.float32
    ) -> State:
        shape = (batch, height, width, features)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


class _HiddenStep(nn.Module):
    """Scan body: gates = xg_t (precomputed) + conv_h(h)."""

    features: int
    kernel: Tuple[int, int]
    dtype: jnp.dtype
    gate_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state: State, xg_t: jax.Array) -> Tuple[State, jax.Array]:
        c, h = state
        hg = nn.Conv(
            4 * self.features, self.kernel, padding="SAME", use_bias=False,
            dtype=self.dtype, name="hidden",
        )(h.astype(self.dtype))
        c_new, h_new = _gate_math(
            xg_t.astype(self.gate_dtype) + hg.astype(self.gate_dtype),
            c, h.dtype, compute_dtype=self.gate_dtype,
        )
        return (c_new, h_new), h_new


class _InputProj1x1(nn.Module):
    """1x1 input projection as a pure matmul (see ConvLSTM.__call__).

    Param-tree-identical to nn.Conv(features4, (1, 1), name=...): kernel
    (1, 1, C, 4F) with the conv default init (lecun_normal over the same
    shape => same fan-in => same distribution) + bias (4F,) zeros.
    """

    features4: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, c, self.features4)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features4,)
        )
        lead = x.shape[:-1]
        y = x.reshape(-1, c) @ kernel.reshape(c, self.features4).astype(self.dtype)
        y = y + bias.astype(self.dtype)
        return y.reshape(*lead, self.features4)


class _InputParamHolder(nn.Module):
    """Declares the 1x1 input-projection params (kernel (1,1,C,4F) + bias) at
    the SAME path as `_InputProj1x1`/nn.Conv(name='input') WITHOUT applying
    the projection — the proj-fused Pallas kernel consumes them directly."""

    features4: int
    cin: int

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.cin, self.features4),
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features4,)
        )
        return kernel, bias


class _HiddenKernelHolder(nn.Module):
    """Declares the hidden conv kernel at the SAME param path as the scanned
    form (`step/hidden/kernel`, matching nn.scan(_HiddenStep)), so the fused
    Pallas path and the lax.scan path share checkpoints and param trees."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        class _Kernel(nn.Module):
            shape: Tuple[int, ...]

            @nn.compact
            def __call__(inner) -> jax.Array:
                return inner.param(
                    "kernel", nn.initializers.lecun_normal(), inner.shape
                )

        return _Kernel(self.shape, name="hidden")()


class ConvLSTM(nn.Module):
    """Time-scanned ConvLSTM with the hoisted input projection.

    __call__(state0, xs) where xs is (B, T, H, W, Cin), or (B, 1, H, W, Cin)
    with `length=T` for a time-constant input (decoder z-tokens): conv_x then
    runs exactly once.

    `fused=True` replaces the lax.scan recurrence with the single fused Pallas
    kernel (`ops.convlstm_pallas`): the whole T-step hidden recurrence runs in
    one pallas_call with the cell state VMEM-resident and the 3x3 hidden conv
    as 9 MXU matmuls (fwd + hand-written BPTT backward).  Param tree and
    numerics are identical to the scanned form (tests/test_convlstm_fused.py)
    — at matching `gate_dtype` (the kernel honors it: pointwise gate chain +
    VMEM cell-state scratch run in bf16 when selected, mirroring the scanned
    path's gate_bf16 semantics; the dW/dxg accumulators stay f32).  Caveat:
    the kernel keeps its own forward residuals, so `remat=True` does not
    apply inside it (explicitly combining them warns once).

    Returns (final_state, hs[B, T, H, W, F]).
    """

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    unroll: int = 1  # lax.scan unroll factor (XLA fuses across unrolled steps)
    gate_dtype: jnp.dtype = jnp.float32  # pointwise gate-math dtype
    # Single fused Pallas kernel for the whole time scan; None = auto (fused
    # on TPU, lax.scan elsewhere — same convention as ops.dispatch).
    fused: Optional[bool] = None
    # Input-projection kernel size; None = same as `kernel`.  (1, 1) turns
    # conv_x into a pure matmul — 9x fewer input-projection FLOPs; the
    # hidden conv still mixes spatially every step.  Profiled: the 3x3
    # input projection is the single largest op group of the flagship train
    # step (2.05 ms, 244 GF); see configs.base for the measured quality
    # trade.
    x_kernel: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(
        self, state0: State, xs: jax.Array, *, length: Optional[int] = None,
        need_hs: bool = True,
    ) -> Tuple[State, Optional[jax.Array]]:
        """need_hs=False: caller consumes only the terminal state (encoder
        head).  The fused kernel then runs its last-only variant — no hs
        history written by the primal, and the backward takes the h-cotangent
        as one block instead of a dense mostly-zero T-step stream (which XLA
        would otherwise materialize and layout-copy at the custom-call
        boundary).  The scanned path still returns hs (XLA DCEs the unused
        outputs there for free)."""
        b, t_in = xs.shape[:2]
        t = length or t_in
        fused = self.fused
        if fused is None:
            # Measured policy (round 3, re-measured round 5 — docs/RESULTS.md):
            # the fused kernel wins streaming fwd+bwd (3.31 vs 3.64 ms at
            # B=64/T=20 F=128 bf16 on v5e).  For the time-constant decoder
            # drive it now wins the ISOLATED microbench too (2.89 vs 3.14 ms)
            # but loses in the full production step (157.0k vs 160.6k
            # frames/s end-to-end: the kernel's gates-residual write and
            # stiffer scheduling displace more overlap than the isolated win
            # is worth), so auto stays fused iff streaming.
            fused = jax.default_backend() == "tpu" and not (t_in == 1 and t > 1)
        xk = self.x_kernel or self.kernel
        if (
            fused and not need_hs and xk == (1, 1) and t_in == t
            and xs.shape[-1] % 128 == 0
        ):
            # Encoder fast path: the 1x1 projection runs INSIDE the fused
            # recurrence kernel — the (B, T, H, W, 4F) projected-gates tensor
            # (~0.57 ms/step of pure HBM traffic at production shapes) never
            # exists.  Params stay at input/kernel + input/bias (same tree).
            from mmvae_tpu.ops.convlstm_pallas import convlstm_scan_proj_pallas

            cin = xs.shape[-1]
            kx, bx = _InputParamHolder(
                4 * self.features, cin, name="input"
            )()
            wh = _HiddenKernelHolder(
                self.kernel + (self.features, 4 * self.features), name="step"
            )()
            c0, h0 = state0
            c_T, h_T = convlstm_scan_proj_pallas(
                xs.astype(self.dtype),
                kx.reshape(cin, 4 * self.features).astype(self.dtype),
                bx.astype(self.dtype),
                wh.astype(self.dtype),
                c0.astype(self.dtype),
                h0.astype(self.dtype),
                gate_dtype=self.gate_dtype,
            )
            return (c_T, h_T), None

        # Hoisted input projection: one conv over all B*T_in frames.
        flat = xs.reshape(b * t_in, *xs.shape[2:]).astype(self.dtype)
        if xk == (1, 1):
            # Lower as a TRUE dot_general, not a 1x1 "conv": the conv form
            # (even with spatial folded into batch) inherited conv layouts
            # and ran at ~82 TF/s with a 21 MB relayout copy at the Pallas
            # boundary; a plain (N*H*W, C) x (C, 4F) dot is layout-flexible
            # and MXU-shaped.  Param path/shape/init are unchanged
            # (input/kernel (1, 1, C, 4F) + input/bias), so checkpoints and
            # the torch-parity mapping are untouched.
            xg = _InputProj1x1(
                4 * self.features, dtype=self.dtype, name="input"
            )(flat)
        else:
            xg = nn.Conv(
                4 * self.features, xk, padding="SAME",
                dtype=self.dtype, name="input",
            )(flat)
        xg = xg.reshape(b, t_in, *xg.shape[1:])
        if fused:
            if self.fused and self.remat:
                import warnings

                warnings.warn(
                    "ConvLSTM(fused=True): the fused Pallas kernel keeps its "
                    "own forward residuals — remat is ignored on this path.",
                    stacklevel=2,
                )
            from mmvae_tpu.ops.convlstm_pallas import convlstm_scan_pallas

            wh = _HiddenKernelHolder(
                self.kernel + (self.features, 4 * self.features), name="step"
            )()
            c0, h0 = state0
            return convlstm_scan_pallas(
                xg.astype(self.dtype),
                wh.astype(self.dtype),
                c0.astype(self.dtype),
                h0.astype(self.dtype),
                length=t,
                gate_dtype=self.gate_dtype,
                last_only=not need_hs,
            )
        if t_in == 1 and t > 1:
            xg = jnp.broadcast_to(xg, (b, t) + xg.shape[2:])

        target = _HiddenStep
        if self.remat:
            target = nn.remat(target, prevent_cse=False)
        scanned = nn.scan(
            target,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=self.unroll,
        )(
            features=self.features, kernel=self.kernel, dtype=self.dtype,
            gate_dtype=self.gate_dtype, name="step",
        )
        return scanned(state0, xg)


def scan_convlstm(
    cell_cls,
    features: int,
    *,
    name: str,
    dtype=jnp.float32,
    remat: bool = False,
    kernel: Tuple[int, int] = (3, 3),
):
    """Back-compat builder for a time-scanned concat-form cell.

    Prefer `ConvLSTM` (hoisted input conv) in models; this remains for tests
    and as the reference-structured variant.
    """
    target = nn.remat(cell_cls, prevent_cse=False) if remat else cell_cls
    scanned = nn.scan(
        target,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )
    return scanned(features=features, kernel=kernel, dtype=dtype, name=name)
