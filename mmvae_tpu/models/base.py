"""Shared model interface and conv building blocks.

Capability parity with the reference's `VAE.encode/decode/reparameterize`
split (SURVEY.md 2.1) but restructured for TPU: sampling is *injected* as
`sample_fn(mu, logvar) -> z` so the train step can route it through the fused
Pallas kernel (`ops.reparameterize`) and own all RNG, keeping modules pure.

Layout conventions:
- frames are NHWC with an explicit trailing channel of 1;
- sequence models take (B, T, H, W); per-frame models take (B, H, W);
- activations optionally run in bfloat16 (`dtype`) for MXU throughput while
  params, mu/logvar heads, and the ELBO reduction stay float32.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# sample_fn(mu, logvar, salt=0) -> z.  `salt` decorrelates multiple draws in
# one forward pass (the hierarchical model samples a global latent AND a set
# of chunk latents); implementations fold it into their RNG.
SampleFn = Callable[..., jax.Array]


class VAEOutput(NamedTuple):
    """Unified forward-pass result consumed by the loss.

    negative ELBO = BCE(logits, target) + KL(mu, logvar || N(0,I)) + extra_kl.
    `target` lets prediction models reconstruct a different slice of the clip
    than they condition on; `extra_kl` carries learned-prior KL terms
    (hierarchical model) that the fused standard-normal kernel cannot express.
    """

    logits: jax.Array  # same shape as target
    target: jax.Array  # frames the likelihood scores, [0,1] or {0,1}; f32, or
    #                    bf16 on the binarized TPU path ({0,1} is bf16-exact —
    #                    the ELBO reduce upcasts to f32 before accumulating)
    mu: jax.Array      # (B, L) top-level posterior mean
    logvar: jax.Array  # (B, L) top-level posterior log-variance
    z: jax.Array       # (B, L) sampled latent
    extra_kl: jax.Array  # scalar f32, additional KL (0 where unused)


def zero_extra_kl() -> jax.Array:
    return jnp.zeros((), jnp.float32)


class ConvEncoder(nn.Module):
    """Strided-conv frame encoder: (N, 64, 64, 1) -> (N, 64/2^k, 64/2^k, C_last).

    TPU notes: NHWC + 4x4/stride-2 convs lower to MXU-friendly XLA convolutions;
    channel widths are powers of two.
    """

    channels: Sequence[int] = (32, 64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = x.astype(self.dtype)
        for ch in self.channels:
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype)(h)
            h = nn.relu(h)
        return h


@jax.custom_vjp
def _upsample2x2(x, kernel, bias):
    """kernel==stride (2,2) ConvTranspose, forward identical to flax's.

    Exists for its hand-written VJP: XLA's transpose rule for the dilated-conv
    lowering spatially REVERSES activation-sized tensors (measured 0.30
    ms/step across the decoder at production shapes).  For k == s the
    transpose conv is non-overlapping, so both grads are plain strided convs:
      dx = conv_k2s2_VALID(dy, K[::-1, ::-1].swapaxes(2, 3))
      dK = (native conv-dW of that same strided conv), un-flipped
    — no data reverse anywhere.  Verified exactly against the autodiff of
    nn.ConvTranspose (tests/test_models.py::test_fast_upsample_vjp).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_transpose(
        x, kernel, (2, 2), "SAME", dimension_numbers=dn, transpose_kernel=False
    )
    return y + bias


def _upsample2x2_fwd(x, kernel, bias):
    return _upsample2x2(x, kernel, bias), (x, kernel)


def _upsample2x2_bwd(res, dy):
    x, kernel = res
    dn = ("NHWC", "HWIO", "NHWC")
    k2 = kernel[::-1, ::-1].swapaxes(2, 3)  # (2, 2, O, C); kernel-sized flip
    dx = jax.lax.conv_general_dilated(
        dy, k2, (2, 2), "VALID", dimension_numbers=dn
    ).astype(x.dtype)
    f = lambda w2: jax.lax.conv_general_dilated(
        dy, w2, (2, 2), "VALID", dimension_numbers=dn
    )
    (dw2,) = jax.vjp(f, jnp.zeros_like(k2))[1](x)
    dk = dw2[::-1, ::-1].transpose(0, 1, 3, 2).astype(kernel.dtype)
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1, 2)).astype(dy.dtype)
    return dx, dk, db


_upsample2x2.defvjp(_upsample2x2_fwd, _upsample2x2_bwd)


class Upsample2x2(nn.Module):
    """Drop-in nn.ConvTranspose(features, (2, 2), strides=(2, 2)): same param
    tree (kernel (2, 2, C, O) + bias), init, and forward; reverse-free VJP
    (see _upsample2x2).  Pass name='ConvTranspose_N' for checkpoint compat."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features)
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )
        return _upsample2x2(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            bias.astype(self.dtype),
        )


class ConvDecoder(nn.Module):
    """Frame decoder, mirror of ConvEncoder; emits 1-channel logits.

    Two upsampling modes (measured on the v5e dev chip, fwd+bwd over 1280
    frames at 8x8x128 input):
    - "fast" (default): ConvTranspose with kernel == stride (2x2) — exactly
      one input tap per output, mathematically a learned pixel shuffle but
      WITHOUT the depth-to-space relayout (6-D transposes are memory-bound
      losers on TPU; measured 3.6x-fewer-FLOP shuffle variants ran slower
      than 4x4 transpose).  Crucially, NO multi-channel tensor ever exists at
      full resolution, and the 3x3 spatial mixing runs right after the FIRST
      upsample (16x16 for the production grid) where channels are widest:
      same mixing FLOPs as mixing later, but a deeper MXU contraction
      (K = 9*128 vs 9*64), 4x less conv-backward `reverse` relayout traffic,
      and the following 2x2 transposes run on narrower tensors.  History:
      round-1 mixed at full 64x64 (decoder = 38% of device time, 20 ms/30-
      step of pure `reverse` flips over 670 MB tensors); round-2 moved it to
      half-res (+32%); round-3 profiling showed the 32x32 mixing backward
      still cost ~1.7 ms/step and moved it here.
    - "fast_mid": "fast" plus a half-width 3x3 mix after the 32x32 upsample —
      the measured middle point of the quality ladder (docs/RESULTS.md).
    - "fast_midw": "fast_mid" with the 32x32 mix at FULL width (chs[-1]) —
      doubles the mid-mix FLOPs to probe whether the fast_mid/fast_hq val
      gap is mid-mix capacity (measured: docs/RESULTS.md round-8 ladder).
    - "fast_hq": same 2x2-transpose skeleton but with the 3x3 mixing at HALF
      resolution (the round-2 layout).  ~14% slower end-to-end than "fast"
      but reaches a ~6% better train ELBO at 20k steps (measured: 3170 vs
      3359 sum/sample) — the quality knob when throughput is not the goal.
    - "transpose": classic 4x4/stride-2 ConvTranspose (the reference-era
      layout, kept for the per-frame Conv VAE's architectural parity).
    """

    channels: Sequence[int] = (128, 64, 32)
    dtype: jnp.dtype = jnp.float32
    upsample: str = "fast"

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        h = h.astype(self.dtype)
        # Upsample2x2 == nn.ConvTranspose(ch, (2,2), strides=(2,2)) with a
        # reverse-free VJP; explicit names keep the historic param tree.
        n_up = 0

        def up(ch):
            nonlocal n_up
            mod = Upsample2x2(ch, dtype=self.dtype, name=f"ConvTranspose_{n_up}")
            n_up += 1
            return mod

        if self.upsample in ("fast", "fast_k4tail"):
            chs = list(self.channels)
            h = up(chs[0])(h)
            h = nn.relu(h)
            # Cross-cell spatial mixing, once, as early (= narrow + wide-
            # channel) as possible.
            mix_ch = chs[1] if len(chs) > 1 else chs[0]
            h = nn.relu(
                nn.Conv(mix_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
            )
            for ch in chs[2:]:
                h = up(ch)(h)
                h = nn.relu(h)
            # Final upsample straight to 1-channel logits: the only full-res
            # tensor in the decoder is the logits themselves.
            if self.upsample == "fast_k4tail":
                # Overlapping 4x4/s2 final transpose: each logit pixel blends
                # a 2x2 neighborhood of 32x32 cells — smoothing at the logits
                # surface for ~1.3 GF/step (the full-res tensors stay
                # 1-channel, so the round-1 reverse pathology can't recur).
                logits = nn.ConvTranspose(
                    1, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, name="k4_tail",
                )(h)
            else:
                logits = up(1)(h)
            return logits.astype(jnp.float32)
        if self.upsample in ("fast_mid", "fast_midw"):
            # "fast" + a HALF-WIDTH 3x3 mix after the 32x32 upsample: the
            # middle point of the fast/fast_hq quality ladder (VERDICT r2
            # next-1 #6).  fast_hq's whole quality edge comes from letting
            # the model smooth the 2x2-block boundaries of the 16->32
            # upsample; a narrow 3x3 there buys that smoothing at ~1/4 of
            # fast_hq's mixing FLOPs while keeping fast's wide-channel
            # 16x16 mix.
            chs = list(self.channels)
            h = up(chs[0])(h)
            h = nn.relu(h)
            mix_ch = chs[1] if len(chs) > 1 else chs[0]
            h = nn.relu(
                nn.Conv(mix_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)
            )
            for ch in chs[2:]:
                h = up(ch)(h)
                h = nn.relu(h)
            mid_w = (
                chs[-1] if self.upsample == "fast_midw" else max(chs[-1] // 2, 8)
            )
            h = nn.relu(
                nn.Conv(
                    mid_w, (3, 3), padding="SAME",
                    dtype=self.dtype, name="mid_mix",
                )(h)
            )
            logits = up(1)(h)
            return logits.astype(jnp.float32)
        if self.upsample == "fast_hq":
            for ch in self.channels[:-1]:
                h = up(ch)(h)
                h = nn.relu(h)
            h = nn.relu(
                nn.Conv(self.channels[-1], (3, 3), padding="SAME", dtype=self.dtype)(h)
            )
            logits = up(1)(h)
            return logits.astype(jnp.float32)
        for ch in self.channels:
            h = nn.ConvTranspose(
                ch, (4, 4), strides=(2, 2), padding="SAME", dtype=self.dtype
            )(h)
            h = nn.relu(h)
        # Final 3x3 conv to single-channel logits, in the activation dtype;
        # only the 1-channel logits are cast to f32 (the ELBO reduce
        # accumulates in f32 anyway).
        logits = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return logits.astype(jnp.float32)


class GaussianHead(nn.Module):
    """Flatten -> (mu, logvar), always f32 (posterior stats feed the KL)."""

    latent_dim: int

    @nn.compact
    def __call__(self, h: jax.Array):
        flat = h.reshape(h.shape[0], -1).astype(jnp.float32)
        mu = nn.Dense(self.latent_dim, dtype=jnp.float32, name="mu")(flat)
        logvar = nn.Dense(self.latent_dim, dtype=jnp.float32, name="logvar")(flat)
        return mu, logvar
