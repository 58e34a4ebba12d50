"""Config 2 (BASELINE.json:8): per-frame Conv VAE, 4-layer enc/dec, latent 64.

Parity with the reference's conv VAE (SURVEY.md 2.1 "Conv VAE": ~4 strided
conv layers down to a small grid, conv-transpose decoder, latent ~64).
TPU-first details: NHWC layout, power-of-two channels, logits output, optional
bf16 activations with f32 heads.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvae_tpu.models.base import (
    ConvDecoder,
    ConvEncoder,
    GaussianHead,
    SampleFn,
    VAEOutput,
    zero_extra_kl,
)


class ConvVAE(nn.Module):
    latent_dim: int = 64
    channels: Sequence[int] = (32, 64, 128, 256)  # 64 -> 32 -> 16 -> 8 -> 4
    image_size: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.channels, dtype=self.dtype)
        self.head = GaussianHead(self.latent_dim)
        self.grid = self.image_size // (2 ** len(self.channels))
        self.dec_in = nn.Dense(
            self.grid * self.grid * self.channels[-1], dtype=self.dtype
        )
        # One ConvTranspose per encoder stride (4 here: grid 4 -> 64).
        dec_channels = tuple(reversed(self.channels[:-1])) + (
            max(self.channels[0] // 2, 8),
        )
        # "transpose" = the reference-era conv-transpose mirror (BASELINE.json:8);
        # the sequence models use the faster pixel-shuffle decoder instead.
        self.decoder = ConvDecoder(dec_channels, dtype=self.dtype, upsample="transpose")

    def encode(self, x: jax.Array):
        """x: (B, H, W) f32 -> (mu, logvar)."""
        h = self.encoder(x[..., None])
        return self.head(h)

    def decode(self, z: jax.Array) -> jax.Array:
        """z: (B, latent) -> logits (B, H, W)."""
        h = nn.relu(self.dec_in(z.astype(self.dtype)))
        h = h.reshape(z.shape[0], self.grid, self.grid, self.channels[-1])
        logits = self.decoder(h)  # one transpose conv per encoder stride
        return logits[..., 0]

    def prior_logits(self, rng: jax.Array, batch: int, seq_len=None) -> jax.Array:
        """Prior-sampling protocol (sample.generate.prior_sample): z ~ N(0,I)."""
        z = jax.random.normal(rng, (batch, self.latent_dim), jnp.float32)
        return self.decode(z)

    def __call__(self, x: jax.Array, sample_fn: SampleFn) -> VAEOutput:
        mu, logvar = self.encode(x)
        z = sample_fn(mu, logvar)
        logits = self.decode(z)
        return VAEOutput(
            logits=logits, target=x, mu=mu, logvar=logvar, z=z,
            extra_kl=zero_extra_kl(),
        )
