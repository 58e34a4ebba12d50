#!/usr/bin/env python
"""Microbench: strategies for the on-device resident batch row gather.

The hier_vae (config 5) profile shows the per-step batch gather costing
2.2 ms/step (18% of the step) for 16 rows x 409.6 KB = 6.5 MB — ~200x the
HBM bandwidth floor.  The seq_vae gather (64 rows x 81.9 KB) measures far
cheaper.  This script times candidate lowerings at both shapes:

  gather   data.at[idx].get(mode="promise_in_bounds")   (current)
  take     jnp.take(data, idx, axis=0)
  dslice   lax.scan of lax.dynamic_slice rows (16/64 sequential DMAs)
  dslice_u lax.scan unrolled
  split    gather on a (N*K, L/K) reshaped view (shorter rows, more of them)

Usage: python scripts/bench_gather.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = {
    "hier (2000 x 102400 i32, B=16)": (2000, 102400, 16),
    "seq  (9000 x 20480 i32, B=64)": (9000, 20480, 64),
}


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # fenced: host-fetch one element to fence through the axon tunnel
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def timeit_scan(gather_fn, data, idxs, iters=5):
    """Device-time-dominated: K gathers fused in one dispatch via lax.scan.

    Returns ms per gather.  The f32 sum consumer (~1 flop/elem + one
    (B, L) read) is the same across variants, so deltas are the gather.
    """

    @jax.jit
    def run(data, idxs):
        def body(acc, idx):
            rows = gather_fn(data, idx)
            return acc + jnp.sum(rows.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return acc

    float(np.asarray(run(data, idxs)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        float(np.asarray(run(data, idxs)))
    return (time.perf_counter() - t0) / iters / idxs.shape[0] * 1e3


def main():
    for name, (n, l, b) in SHAPES.items():
        key = jax.random.PRNGKey(0)
        data = jax.device_put(
            jnp.arange(n * l, dtype=jnp.int32).reshape(n, l) % 1000003
        )
        idx = jax.random.randint(key, (b,), 0, n)

        @jax.jit
        def f_gather(data, idx):
            return data.at[idx].get(mode="promise_in_bounds")

        @jax.jit
        def f_take(data, idx):
            return jnp.take(data, idx, axis=0, mode="promise_in_bounds")

        @jax.jit
        def f_dslice(data, idx):
            def body(_, i):
                return None, jax.lax.dynamic_slice(data, (i, 0), (1, data.shape[1]))[0]
            _, rows = jax.lax.scan(body, None, idx)
            return rows

        @jax.jit
        def f_dslice_u(data, idx):
            def body(_, i):
                return None, jax.lax.dynamic_slice(data, (i, 0), (1, data.shape[1]))[0]
            _, rows = jax.lax.scan(body, None, idx, unroll=True)
            return rows

        def make_split(k):
            @jax.jit
            def f_split(data, idx):
                d = data.reshape(n * k, l // k)
                ii = (idx[:, None] * k + jnp.arange(k)[None, :]).reshape(-1)
                return d.at[ii].get(mode="promise_in_bounds").reshape(b, l)
            return f_split

        # Tile-aligned 3-D rows: (N, L//128, 128) puts the (8,128) tiling
        # entirely WITHIN one row, so a row gather moves whole tiles (pure
        # DMA, no cross-sublane relayout).  The 2-D (N, L) layout tiles 8
        # consecutive *rows* together, so every row gather is a relayout.
        data3 = data.reshape(n, l // 128, 128)

        @jax.jit
        def f_gather3(data3, idx):
            return data3.at[idx].get(mode="promise_in_bounds")

        @jax.jit
        def f_gather3_flat(data3, idx):
            # ... plus the reshape the consumer would need if it insists on 2-D
            return data3.at[idx].get(mode="promise_in_bounds").reshape(b, l)

        @jax.jit
        def f_dslice3(data3, idx):
            def body(_, i):
                return None, jax.lax.dynamic_slice(
                    data3, (i, 0, 0), (1,) + data3.shape[1:]
                )[0]
            _, rows = jax.lax.scan(body, None, idx)
            return rows

        floor_us = b * l * 4 / 820e9 * 1e6
        print(f"\n{name}  (volume {b*l*4/1e6:.1f} MB, ~{floor_us:.0f} us floor)")
        for label, fn in [
            ("gather (current)", f_gather),
            ("take", f_take),
            ("dslice scan", f_dslice),
            ("dslice unrolled", f_dslice_u),
            ("split gather k=8", make_split(8)),
            ("split gather k=64", make_split(64)),
            ("3D tile-row gather", functools.partial(f_gather3)),
            ("3D gather + flat", functools.partial(f_gather3_flat)),
            ("3D dslice scan", functools.partial(f_dslice3)),
        ]:
            try:
                arg0 = data3 if label.startswith("3D") else data
                ms = timeit(fn, arg0, idx)
                print(f"  {label:<20} {ms:8.3f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<20} FAILED: {type(e).__name__}: {e}")

        # Device-time-dominated comparison (100 gathers, one dispatch).
        idxs = jax.random.randint(jax.random.PRNGKey(1), (100, b), 0, n)
        print("  -- scan-fused (device-time) --")
        for label, gfn, arg0 in [
            ("gather 2D", lambda d, i: d.at[i].get(mode="promise_in_bounds"), data),
            ("gather 3D", lambda d, i: d.at[i].get(mode="promise_in_bounds"), data3),
            ("dslice 2D", lambda d, i: jax.lax.map(
                lambda j: jax.lax.dynamic_slice(d, (j, 0), (1, d.shape[1]))[0], i), data),
            ("baseline (no gather)", lambda d, i: jax.lax.dynamic_slice(
                d, (0, 0) + (0,) * (d.ndim - 2), (b,) + d.shape[1:]), data),
        ]:
            try:
                ms = timeit_scan(gfn, arg0, idxs)
                print(f"  {label:<20} {ms:8.3f} ms/gather")
            except Exception as e:  # noqa: BLE001
                print(f"  {label:<20} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
