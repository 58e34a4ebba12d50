#!/usr/bin/env python
"""A/B microbenchmark: frame-decoder upsampling implementations.

Profile evidence (docs/RESULTS.md round-5 step table): the three k=s=2
ConvTranspose layers of the "fast" decoder run at ~34 TF/s fwd+bwd — XLA
lowers transpose convs via input dilation + `reverse`, 5x off MXU peak —
while the 3x3 mixing conv in the same stack hits ~170 TF/s.  A kernel==
stride transpose conv is mathematically a matmul + depth-to-space:

    out[n, 2y+dy, 2x+dx, o] = sum_c h[n,y,x,c] * kernel[1-dy, 1-dx, c, o]

(full spatial flip; verified exactly against nn.ConvTranspose).  This
harness measures the whole production decoder stack (B*T=1280 frames,
8x8x128 -> 64x64 logits, bf16) under each implementation, fwd+bwd.

Usage: python scripts/bench_decoder.py [--iters 30]
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

N, G, F = 1280, 8, 128
CHS = (128, 64, 32)


class MatmulUpsample(nn.Module):
    """k=s=2 ConvTranspose computed as one MXU matmul + depth-to-space.

    Identical param tree ('kernel' (2,2,C,O) + 'bias'), init, and numerics
    (to matmul-vs-conv f32 accumulation) as nn.ConvTranspose(O,(2,2),(2,2)).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        n, g, _, c = h.shape
        o = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, o), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (o,), jnp.float32)
        # wmat[c, (dy*2+dx)*O + o] = kernel[1-dy, 1-dx, c, o]
        wmat = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, 4 * o)
        y = h @ wmat.astype(self.dtype)  # (N, g, g, 4O)
        y = y.reshape(n, g, g, 2, 2, o) + bias.astype(self.dtype)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * g, 2 * g, o)


class PackedUpsample(nn.Module):
    """k=s=2 ConvTranspose that KEEPS the 2x2 subpixels as channels.

    (N, g, g, C) -> (N, g, g, 4*O) where lane (dy*2+dx)*O + o is output
    subpixel (dy, dx), channel o — no depth-to-space relayout at all.  The
    caller tracks the packing; BCE-vs-packed-target consumes it directly.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        c, o = h.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, o), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (o,), jnp.float32)
        wmat = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, 4 * o)
        b4 = jnp.tile(bias, 4)
        return h @ wmat.astype(self.dtype) + b4.astype(self.dtype)


class PackedFinal(nn.Module):
    """Final 1-channel k=s=2 ConvTranspose over an already-packed input.

    Input (N, g, g, 4*C) packed at 2x-res (4 groups of C channels); each
    group's C channels map through the SAME (C -> 4) matrix (transpose convs
    have no cross-pixel mixing), giving (N, g, g, 4, 4) = (group, subpixel)
    — a block-diagonal matmul, here one dot_general with group as a batch dim.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hp):
        n, g, _, c4 = hp.shape
        c = c4 // 4
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, 1), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (1,), jnp.float32)
        wmat = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c, 4)
        x = hp.reshape(n * g * g, 4, c)
        y = jax.lax.dot_general(
            x, wmat.astype(self.dtype),
            dimension_numbers=(((2,), (0,)), ((), ())),
        )  # (N*g*g, 4, 4): (group, subpixel)
        return (y + bias.astype(self.dtype)).reshape(n, g, g, 16)


def pack_target_2x(x):
    """(N, H, W) -> (N, H/2, W/2, 4): subpixel (dy,dx) -> lane dy*2+dx."""
    n, hh, ww = x.shape
    return x.reshape(n, hh // 2, 2, ww // 2, 2).transpose(0, 1, 3, 2, 4).reshape(
        n, hh // 2, ww // 2, 4
    )


def pack_target_4x(x):
    """(N, H, W) -> (N, H/4, W/4, 4, 4) matching PackedUpsample+PackedFinal:
    lane layout (group=(dy1,dx1), subpixel=(dy2,dx2)), pixel (4y+2dy1+dy2,
    4x+2dx1+dx2)."""
    n, hh, ww = x.shape
    x6 = x.reshape(n, hh // 4, 2, 2, ww // 4, 2, 2)
    # dims: (n, y, dy1, dy2, x, dx1, dx2) -> (n, y, x, dy1, dx1, dy2, dx2)
    return x6.transpose(0, 1, 4, 2, 5, 3, 6).reshape(n, hh // 4, ww // 4, 16)


def build(impl):
    """impl: 'convt' (current fast decoder) | 'matmul' | 'hybrid' (matmul for
    the wide layers, ConvTranspose for the final 1-channel one) | 'packed'
    (tail never leaves packed-channel space) | 'packed1' (only the final
    layer packed)."""

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, h):
            dt = jnp.bfloat16

            def up(o, name):
                if impl == "matmul" or (impl == "hybrid" and o > 1):
                    return MatmulUpsample(o, dtype=dt, name=name)
                return nn.ConvTranspose(o, (2, 2), strides=(2, 2), dtype=dt, name=name)

            h = nn.relu(up(CHS[0], "ConvTranspose_0")(h))
            h = nn.relu(nn.Conv(CHS[1], (3, 3), padding="SAME", dtype=dt, name="Conv_0")(h))
            if impl == "packed":
                h = nn.relu(PackedUpsample(CHS[2], dtype=dt, name="ConvTranspose_1")(h))
                logits = PackedFinal(dtype=dt, name="ConvTranspose_2")(h)
                return logits.astype(jnp.float32)  # (N, 16, 16, 16) packed
            if impl == "packed1":
                h = nn.relu(up(CHS[2], "ConvTranspose_1")(h))
                logits = PackedUpsample(1, dtype=dt, name="ConvTranspose_2")(h)
                return logits.astype(jnp.float32)  # (N, 32, 32, 4) packed
            for i, ch in enumerate(CHS[2:]):
                h = nn.relu(up(ch, f"ConvTranspose_{i+1}")(h))
            logits = up(1, f"ConvTranspose_{len(CHS)-1}")(h)
            return logits.astype(jnp.float32)

    m = Dec()
    h = jnp.asarray(np.random.default_rng(0).normal(size=(N, G, G, F)), jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), h)

    def loss(p, h):
        return jnp.sum(m.apply(p, h) ** 2)

    return jax.jit(jax.grad(loss)), params, h, m


def run(fn, params, h, iters):
    out = fn(params, h)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, h)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0])))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    print(f"device: {jax.devices()[0].device_kind}, {N} frames {G}x{G}x{F} -> 64x64")
    # Numerics: every impl must match ConvTranspose exactly (same params),
    # after unpacking the packed variants back to image space.
    fn_a, p_a, h, m_a = build("convt")
    ya = m_a.apply(p_a, h)[..., 0]  # (N, 64, 64)
    for impl in ("matmul", "packed", "packed1"):
        _, _, _, m_b = build(impl)
        yb = m_b.apply(p_a, h)
        if impl == "packed":
            yb = yb.reshape(N, 16, 16, 2, 2, 2, 2).transpose(0, 1, 3, 5, 2, 4, 6)
            yb = yb.reshape(N, 64, 64)
        elif impl == "packed1":
            yb = yb.reshape(N, 32, 32, 2, 2).transpose(0, 1, 3, 2, 4).reshape(N, 64, 64)
        else:
            yb = yb[..., 0]
        err = float(jnp.max(jnp.abs(ya - yb)))
        print(f"max |convt - {impl}| (same params): {err:.3e}")
    # Packed-target bijection check: packing the convt output must equal the
    # packed impl's raw output.
    tp = pack_target_4x(ya).reshape(N, 16, 16, 16)
    yp = build("packed")[3].apply(p_a, h)
    print(f"pack_target_4x bijection err: {float(jnp.max(jnp.abs(tp - yp))):.3e}")
    tp2 = pack_target_2x(ya)
    yp2 = build("packed1")[3].apply(p_a, h)
    print(f"pack_target_2x bijection err: {float(jnp.max(jnp.abs(tp2 - yp2))):.3e}")

    for impl in ("convt", "matmul", "hybrid", "packed", "packed1"):
        fn, p, h, _ = build(impl)
        ms = run(fn, p, h, args.iters)
        print(f"{impl:>7}: {ms:7.3f} ms fwd+bwd")

    # The packed variants additionally pay a fwd-only target pack each step:
    x = jnp.asarray(np.random.default_rng(1).random((N, 64, 64)) < 0.5, jnp.float32)
    for name, fnp in (("pack_target_4x", pack_target_4x), ("pack_target_2x", pack_target_2x)):
        f = jax.jit(fnp)
        float(np.asarray(jnp.sum(f(x))))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x)
        float(np.asarray(jnp.sum(out)))
        print(f"{name}: {(time.perf_counter()-t0)/args.iters*1e3:7.3f} ms fwd")


if __name__ == "__main__":
    main()
