#!/usr/bin/env python
"""A/B microbenchmark: frame-encoder downsampling implementations.

Hypothesis (docs/RESULTS.md round-5 step table): frame_enc runs at 75 TF/s
fwd+bwd — the stride-2 conv input-grads lower via input dilation (conv2 dx
0.27 ms at 76 TF/s) and the 1-channel first layer is memory-bound — so a
kernel==stride "patch" encoder (mirror of the decoder's measured "fast"
mode) should win: Downsample2x2 = 2x2/stride-2 conv whose custom VJP input-
grad is a first-class k=s=2 conv_transpose (no input dilation, no reverse),
plus one 3x3 mix at 16x16 where channels are widest.

MEASURED RESULT (v5e, round 6 — this file is the record of a REJECTION):
  isolated stack (1280 frames, 64x64x1 -> 8x8x128, bf16):
      fwd      conv4 1.267 ms   fast 1.723 ms
      fwd+bwd  conv4 2.341 ms   fast 2.340 ms     (dead tie, 17% fewer FLOPs)
  end-to-end seq_vae fenced bench:  160.3k -> 158.1k frames/s/chip (LOSS)
  quality, 2k-step train ELBO:      5800   -> 6139  sum/sample   (WORSE)
Strictly dominated: the dilated-conv backward was NOT on the critical path
(same overlap lesson as the round-4 gather rejection), and the 4x4 receptive
field buys real early-training quality.  The conv4 encoder stays.

SECOND REJECTION (v5e, round 7 — phase-decomposed dx, SAME architecture):
keep the 4x4/s2 conv but hand-write its input-grad as 4 non-overlapping
k=s=2 transpose convs + static +-1 pads (exact vs flax autodiff; the
`PhaseDx` candidate below).  Isolated stack fwd+bwd 2.50 -> 3.32 ms; end-to-
end fenced bench 160.1k -> 145.8k frames/s (LOSS).  Cause: each phase
materializes a FULL-dx-sized tensor, so the decomposition pays ~4x the HBM
traffic of the single dilated conv it replaces — the phase outputs can only
merge at full res through a depth-to-space relayout (toxic, see the s2d
rejections) or by keeping the consumer in phase space (= the rejected s2d
rewrite).  Fifth confirmation of the layout rule; XLA's dilated dx stays.

Usage: PYTHONPATH=. python scripts/bench_encoder.py [--iters 30]
Timing uses host-fetch fencing (block_until_ready does not fence reliably
through the axon tunnel — docs/RESULTS.md caveats).
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

N = 1280  # B=64 x T=20
CHS = (32, 64, 128)
_DN = ("NHWC", "HWIO", "NHWC")


@jax.custom_vjp
def _downsample2x2(x, kernel, bias):
    """kernel==stride (2,2) VALID conv; dilation-free hand-written VJP.

    Input-grad is EXACTLY a k=s=2 transpose conv (`transpose_kernel` form) —
    the non-overlapping structure means no input dilation and no reverse.
    Verified against nn.Conv autodiff in _check_vjp() below.
    """
    y = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), "VALID", dimension_numbers=_DN
    )
    return y + bias


def _downsample2x2_fwd(x, kernel, bias):
    return _downsample2x2(x, kernel, bias), (x, kernel)


def _downsample2x2_bwd(res, dy):
    x, kernel = res
    dx = jax.lax.conv_transpose(
        dy, kernel, (2, 2), "VALID", dimension_numbers=_DN,
        transpose_kernel=True,
    ).astype(x.dtype)
    f = lambda k: jax.lax.conv_general_dilated(
        x, k, (2, 2), "VALID", dimension_numbers=_DN
    )
    (dk,) = jax.vjp(f, jnp.zeros_like(kernel))[1](dy)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(dy.dtype)
    return dx, dk.astype(kernel.dtype), db


_downsample2x2.defvjp(_downsample2x2_fwd, _downsample2x2_bwd)


class Downsample2x2(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return _downsample2x2(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype),
        )


class FastEncoder(nn.Module):
    """Patch-conv encoder candidate: Down(32), Down(64), 3x3 mix @16, Down(128)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for ch in CHS[:-1]:
            h = nn.relu(Downsample2x2(ch, dtype=self.dtype)(h))
        h = nn.relu(nn.Conv(CHS[-2], (3, 3), padding="SAME", dtype=self.dtype)(h))
        return nn.relu(Downsample2x2(CHS[-1], dtype=self.dtype)(h))


@jax.custom_vjp
def _conv4x4s2_phasedx(x, kernel, bias):
    """k=4/s=2 SAME conv; dx decomposed into 4 k=s=2 transpose convs.
    Exact: a 4x4/s2 kernel covers a 2x2 grid of 2x2 blocks, so
    dx = sum_{ay,ax} shift_{(1-2ay,1-2ax)}(conv_transpose(dy,
    K[2ay:2ay+2, 2ax:2ax+2], s=2, VALID)).  REJECTED — see module docstring."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), "SAME", dimension_numbers=_DN
    )
    return y + bias


def _conv4x4s2_phasedx_fwd(x, kernel, bias):
    return _conv4x4s2_phasedx(x, kernel, bias), (x, kernel)


def _conv4x4s2_phasedx_bwd(res, dy):
    x, kernel = res
    h, w = x.shape[1], x.shape[2]
    dx = None
    for ay in (0, 1):
        for ax in (0, 1):
            ka = kernel[2 * ay : 2 * ay + 2, 2 * ax : 2 * ax + 2]
            t = jax.lax.conv_transpose(
                dy, ka, (2, 2), "VALID", dimension_numbers=_DN,
                transpose_kernel=True,
            )
            sy, sx = 1 - 2 * ay, 1 - 2 * ax  # out[i] = t[i + (pad_lo - 2a)]
            t = jnp.pad(
                t,
                ((0, 0), (max(-sy, 0), max(sy, 0)),
                 (max(-sx, 0), max(sx, 0)), (0, 0)),
            )
            t = t[:, max(sy, 0) : max(sy, 0) + h, max(sx, 0) : max(sx, 0) + w]
            dx = t if dx is None else dx + t
    f = lambda kk: jax.lax.conv_general_dilated(
        x, kk, (2, 2), "SAME", dimension_numbers=_DN
    )
    (dk,) = jax.vjp(f, kernel)[1](dy)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(dy.dtype)
    return dx.astype(x.dtype), dk.astype(kernel.dtype), db


_conv4x4s2_phasedx.defvjp(_conv4x4s2_phasedx_fwd, _conv4x4s2_phasedx_bwd)


class PhaseDxConv(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, c, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return _conv4x4s2_phasedx(
            x.astype(self.dtype), kernel.astype(self.dtype),
            bias.astype(self.dtype),
        )


class PhaseDxEncoder(nn.Module):
    """Conv4Encoder with the phase-decomposed input-grad (REJECTED)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for ch in CHS:
            h = nn.relu(PhaseDxConv(ch, dtype=self.dtype)(h))
        return h


class Conv4Encoder(nn.Module):
    """The production ConvEncoder layout (models.base.ConvEncoder)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x.astype(self.dtype)
        for ch in CHS:
            h = nn.relu(
                nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype)(h)
            )
        return h


def _check_vjp():
    """Candidate grads == nn.Conv autodiff, exactly."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 8)), jnp.float32)
    pairs = [
        (nn.Conv(24, (2, 2), strides=(2, 2), padding="VALID"), Downsample2x2(24)),
        (nn.Conv(24, (4, 4), strides=(2, 2), padding="SAME"), PhaseDxConv(24)),
    ]
    for ref, new in pairs:
        p = ref.init(jax.random.PRNGKey(0), x)

        def loss(mod):
            return lambda p, x: jnp.sum(jnp.sin(mod.apply(p, x)))

        g_ref = jax.grad(loss(ref), argnums=(0, 1))(p, x)
        g_new = jax.grad(loss(new), argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
            )


def build(mod, bwd):
    x = jnp.asarray(
        np.random.default_rng(0).uniform(size=(N, 64, 64, 1)), jnp.bfloat16
    )
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(mod.apply(p, x).astype(jnp.float32) ** 2)

    fn = jax.jit(jax.grad(loss) if bwd else loss)
    return fn, params, x


def run(fn, params, x, iters):
    out = fn(params, x)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0])))  # compile + drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    float(np.asarray(jnp.sum(jax.tree.leaves(out)[0])))
    return (time.perf_counter() - t0) / iters * 1e3  # ms/iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    _check_vjp()
    print(f"device: {jax.devices()[0].device_kind}, {N} frames 64x64 -> 8x8x{CHS[-1]} bf16")
    for bwd in (False, True):
        row = []
        for name, mod in (
            ("conv4", Conv4Encoder()), ("fast", FastEncoder()),
            ("phasedx", PhaseDxEncoder()),
        ):
            fn, p, x = build(mod, bwd)
            ms = run(fn, p, x, args.iters)
            row.append(f"{name:>5}={ms:6.3f}ms")
        tag = "fwd+bwd" if bwd else "fwd    "
        print(f"{tag}: " + "  ".join(row))


if __name__ == "__main__":
    main()
