"""Config 1 (BASELINE.json:7): MLP VAE on single 64x64 frames, latent 20.

Parity with the reference's fully-connected per-frame VAE (SURVEY.md 2.1
"MLP VAE": FC encoder 4096 -> hidden -> (mu, logvar), FC decoder -> 4096
sigmoid).  Differences by design: the decoder emits *logits* (the stable-BCE
convention used throughout this framework) and the hidden width defaults to
512 — a lane-aligned size that tiles the 128x128 MXU exactly, where the
classic 400 would pad a third of the last tile.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvae_tpu.models.base import SampleFn, VAEOutput, zero_extra_kl


class MLPVAE(nn.Module):
    latent_dim: int = 20
    hidden_dim: int = 512
    image_size: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.image_size * self.image_size
        self.enc_fc = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.enc_mu = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.enc_logvar = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.dec_fc = nn.Dense(self.hidden_dim, dtype=self.dtype)
        self.dec_out = nn.Dense(d, dtype=jnp.float32)

    def encode(self, x: jax.Array):
        """x: (B, H, W) f32 -> (mu, logvar), each (B, latent_dim)."""
        flat = x.reshape(x.shape[0], -1).astype(self.dtype)
        h = nn.relu(self.enc_fc(flat))
        return self.enc_mu(h.astype(jnp.float32)), self.enc_logvar(
            h.astype(jnp.float32)
        )

    def decode(self, z: jax.Array) -> jax.Array:
        """z: (B, latent_dim) -> logits (B, H, W)."""
        h = nn.relu(self.dec_fc(z.astype(self.dtype)))
        logits = self.dec_out(h.astype(jnp.float32))
        return logits.reshape(z.shape[0], self.image_size, self.image_size)

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
