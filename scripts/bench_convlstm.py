#!/usr/bin/env python
"""A/B microbenchmark: fused Pallas ConvLSTM scan vs the XLA lax.scan path.

Production recurrence shape (flagship config 3): B=64, T=20, 8x8 spatial,
F=128, bf16 activations, full unroll.  Measures fwd-only and fwd+bwd for the
streaming-input (encoder) and constant-token (decoder) directions.

Usage: python scripts/bench_convlstm.py [--iters 50] [--taps] [--remat]
Timing uses host-fetch fencing (block_until_ready does not fence reliably
through the axon tunnel — docs/RESULTS.md caveats).

MEASURED REJECTION (v5e, round 7 — `--taps` reproduces it): computing the
scan body's 3x3 hidden conv as ONE tap-stacked MXU matmul in XLA (pad h,
concat the 9 shifted views to (B*hw, 9F), contract against the flattened
(9F, 4F) kernel — the fused Pallas kernel's own formulation, left to XLA):
  const/decoder fwd+bwd 3.27 -> 4.52 ms;  stream/encoder 3.40 -> 4.44 ms.
XLA materializes the 9F tap concat every step instead of folding it into
the dot; its conv lowering keeps the taps implicit and wins.  Param tree
was identical (hidden/kernel); grads matched the conv scan to 2e-5.

MEASURED (v5e, round 7 — `--remat` reproduces it): nn.remat on the scan
body (recompute gates in bwd instead of saving residuals) is a NOISE-LEVEL
tie isolated (const/dec 2.3-3.3 ms both ways across windows) and was
decided at the fenced e2e bench instead (docs/RESULTS.md).  NOTE the
window-to-window drift: the first timed window after a fresh compile runs
up to 40% slow on the tunneled dev chip — isolated deltas under ~15% are
not decidable here; use the e2e bench.
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmvae_tpu.models.convlstm import ConvLSTM, ConvLSTMCell

B, T, G, F, CIN = 64, 20, 8, 128, 16


class _TapsStep(__import__("flax").linen.Module):
    """Rejected candidate: scan body with the hidden conv as a tap-stacked
    matmul (see module docstring).  Param path mirrors _HiddenStep."""

    features: int

    @__import__("flax").linen.compact
    def __call__(self, state, xg_t):
        import flax.linen as nn

        from mmvae_tpu.models.convlstm import _gate_math

        c, h = state

        class _Kernel(nn.Module):
            shape: tuple

            @nn.compact
            def __call__(inner):
                return inner.param(
                    "kernel", nn.initializers.lecun_normal(), inner.shape
                )

        w = _Kernel((3, 3, self.features, 4 * self.features), name="hidden")()
        hm = h.astype(jnp.bfloat16)
        b, g1, g2, f = hm.shape
        hp = jnp.pad(hm, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = jnp.concatenate(
            [hp[:, ky:ky + g1, kx:kx + g2, :] for ky in range(3) for kx in range(3)],
            axis=-1,
        )
        hg = jax.lax.dot_general(
            taps.reshape(b * g1 * g2, 9 * f),
            w.reshape(9 * f, 4 * self.features).astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, g1, g2, 4 * self.features)
        c_new, h_new = _gate_math(
            xg_t.astype(jnp.bfloat16) + hg.astype(jnp.bfloat16),
            c, h.dtype, compute_dtype=jnp.bfloat16,
        )
        return (c_new, h_new), h_new


def _taps_model():
    """ConvLSTM with the scan body swapped for _TapsStep (same param tree)."""
    import flax.linen as nn

    class TapsLSTM(ConvLSTM):
        @nn.compact
        def __call__(self, state0, xs, *, length=None, need_hs=True):
            b, t_in = xs.shape[:2]
            t = length or t_in
            flat = xs.reshape(b * t_in, *xs.shape[2:]).astype(self.dtype)
            xg = nn.Conv(
                4 * self.features, self.kernel, padding="SAME",
                dtype=self.dtype, name="input",
            )(flat)
            xg = xg.reshape(b, t_in, *xg.shape[1:])
            if t_in == 1 and t > 1:
                xg = jnp.broadcast_to(xg, (b, t) + xg.shape[2:])
            scanned = nn.scan(
                _TapsStep, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=1, out_axes=1,
                unroll=self.unroll,
            )(features=self.features, name="step")
            return scanned(state0, xg)

    return TapsLSTM


def build(fused, const, bwd, gate_bf16=True, taps=False, remat=False):
    cls = _taps_model() if taps else ConvLSTM
    m = cls(
        F,
        dtype=jnp.bfloat16,
        unroll=T,
        gate_dtype=jnp.bfloat16 if gate_bf16 else jnp.float32,
        fused=fused,
        remat=remat,
    )
    t_in = 1 if const else T
    xs = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, t_in, G, G, CIN)), jnp.bfloat16
    )
    s0 = ConvLSTMCell.initial_state(B, G, G, F, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), s0, xs, length=T)

    def loss(p, xs):
        _, hs = m.apply(p, s0, xs, length=T)
        return jnp.sum(hs.astype(jnp.float32))

    fn = jax.jit(jax.grad(loss) if bwd else loss)
    return fn, params, xs


def run(fn, params, xs, iters):
    out = fn(params, xs)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(jnp.sum(leaf)))  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, xs)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0])))
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--gate-f32", action="store_true")
    ap.add_argument("--taps", action="store_true",
                    help="A/B the rejected tap-stacked-matmul scan body")
    ap.add_argument("--remat", action="store_true",
                    help="A/B nn.remat on the scan body")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}, B={B} T={T} {G}x{G} F={F}")
    if args.taps or args.remat:
        knob = "taps" if args.taps else "remat"
        for const in (False, True):
            direction = "const/decoder" if const else "stream/encoder"
            row = []
            for on in (False, True):
                fn, p, xs = build(
                    False, const, True, gate_bf16=not args.gate_f32,
                    taps=args.taps and on, remat=args.remat and on,
                )
                ms = run(fn, p, xs, args.iters)
                row.append(f"{knob}={str(on):>5}: {ms:6.3f}ms")
            print(f"{direction:>14} fwd+bwd: " + "  ".join(row))
        return
    for const in (False, True):
        direction = "const/decoder" if const else "stream/encoder"
        for bwd in (False, True):
            row = []
            for fused in (True, False):
                fn, p, xs = build(fused, const, bwd, gate_bf16=not args.gate_f32)
                ms = run(fn, p, xs, args.iters)
                row.append(f"{'fused' if fused else 'xla':>5}={ms:6.3f}ms")
            tag = "fwd+bwd" if bwd else "fwd    "
            print(f"{direction:>14} {tag}: " + "  ".join(row))


if __name__ == "__main__":
    main()
