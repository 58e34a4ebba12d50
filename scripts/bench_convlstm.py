#!/usr/bin/env python
"""A/B microbenchmark: fused Pallas ConvLSTM scan vs the XLA lax.scan path.

Production recurrence shape (flagship config 3): B=64, T=20, 8x8 spatial,
F=128, bf16 activations, full unroll.  Measures fwd-only and fwd+bwd for the
streaming-input (encoder) and constant-token (decoder) directions.

Usage: python scripts/bench_convlstm.py [--iters 50]
Timing uses host-fetch fencing (block_until_ready does not fence reliably
through the axon tunnel — docs/RESULTS.md caveats).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from mmvae_tpu.models.convlstm import ConvLSTM, ConvLSTMCell

B, T, G, F, CIN = 64, 20, 8, 128, 16


def build(fused, const, bwd, gate_bf16=True):
    m = ConvLSTM(
        F,
        dtype=jnp.bfloat16,
        unroll=T,
        gate_dtype=jnp.bfloat16 if gate_bf16 else jnp.float32,
        fused=fused,
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
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}, B={B} T={T} {G}x{G} F={F}")
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
