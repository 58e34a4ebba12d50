"""Config 4 (BASELINE.json:10): seq VAE with next-frame prediction head.

10 context frames -> posterior latent -> rollout of the 10 future frames
(SURVEY.md 2.1 "Next-frame prediction").  Structure:

- context clip runs through the same conv-stack + ConvLSTM encoder as the
  sequence VAE; posterior q(z | x_{1:ctx}) comes from the terminal state;
- the decoder ConvLSTM is *initialized from the encoder's terminal state*
  (deterministic motion pathway) and receives a z-token each step
  (stochastic content pathway), then rolls out the future frames;
- BCE scores only the future frames (VAEOutput.target = x[:, ctx:]).
"""

from __future__ import annotations

from typing import Optional, Sequence

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
from mmvae_tpu.models.convlstm import ConvLSTM, ConvLSTMCell


class PredSeqVAE(nn.Module):
    latent_dim: int = 128
    enc_channels: Sequence[int] = (32, 64, 128)
    lstm_features: int = 128
    context_len: int = 10
    image_size: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    unroll: int = 1  # time-scan unroll factor for both ConvLSTMs
    gate_bf16: bool = False  # bf16 pointwise gate math + cell state
    fused: Optional[bool] = None  # fused Pallas time-scan (None = auto on TPU)
    dec_upsample: str = "fast"  # frame-decoder layout: fast | fast_mid | fast_midw | fast_hq | transpose
    enc_x_kernel: int = 3  # encoder LSTM input-projection kernel (1 = matmul)

    def setup(self):
        gate_dtype = jnp.bfloat16 if self.gate_bf16 else jnp.float32
        self.grid = self.image_size // (2 ** len(self.enc_channels))
        self.frame_enc = ConvEncoder(self.enc_channels, dtype=self.dtype)
        self.enc_lstm = ConvLSTM(
            self.lstm_features, name="enc_lstm",
            dtype=self.dtype, remat=self.remat, unroll=self.unroll,
            gate_dtype=gate_dtype, fused=self.fused,
            x_kernel=(self.enc_x_kernel, self.enc_x_kernel),
        )
        self.head = GaussianHead(self.latent_dim)
        self.z_to_token = nn.Dense(self.grid * self.grid * 16, dtype=jnp.float32)
        self.dec_lstm = ConvLSTM(
            self.lstm_features, name="dec_lstm",
            dtype=self.dtype, remat=self.remat, unroll=self.unroll,
            gate_dtype=gate_dtype, fused=self.fused,
        )
        self.frame_dec = ConvDecoder(
            tuple(reversed(self.enc_channels)), dtype=self.dtype,
            upsample=self.dec_upsample,
        )

    def encode_context(self, ctx: jax.Array):
        """(B, Tc, H, W) -> (terminal_state, (mu, logvar))."""
        b, t = ctx.shape[:2]
        frames = ctx.reshape(b * t, *ctx.shape[2:])[..., None]
        feats = self.frame_enc(frames)
        feats = feats.reshape(b, t, *feats.shape[1:])
        state0 = ConvLSTMCell.initial_state(
            b, self.grid, self.grid, self.lstm_features, dtype=self.dtype
        )
        state_t, _ = self.enc_lstm(state0, feats, need_hs=False)
        mu, logvar = self.head(state_t[1])
        return state_t, (mu, logvar)

    def encode(self, x: jax.Array):
        """Posterior from the context prefix (x may be the full clip)."""
        _, (mu, logvar) = self.encode_context(x[:, : self.context_len])
        return mu, logvar

    def rollout(self, state, z: jax.Array, n_future: int) -> jax.Array:
        """Roll the decoder ConvLSTM n_future steps -> logits (B, n, H, W)."""
        b = z.shape[0]
        g = self.grid
        # constant token -> ConvLSTM's single-shot input projection
        token = self.z_to_token(z).reshape(b, 1, g, g, 16).astype(self.dtype)
        _, hs = self.dec_lstm(state, token, length=n_future)
        flat = hs.reshape(b * n_future, *hs.shape[2:])
        logits = self.frame_dec(flat)[..., 0]
        return logits.reshape(b, n_future, self.image_size, self.image_size)

    def prior_logits(self, rng: jax.Array, batch: int, seq_len=None) -> jax.Array:
        """Prior-sampling protocol: z ~ N(0,I), rolled from a zero motion state.

        Without context frames there is no encoder terminal state, so the
        deterministic motion pathway starts from zeros and the frames are
        shaped by the stochastic content pathway alone.
        """
        z = jax.random.normal(rng, (batch, self.latent_dim), jnp.float32)
        state0 = ConvLSTMCell.initial_state(
            batch, self.grid, self.grid, self.lstm_features, dtype=self.dtype
        )
        return self.rollout(state0, z, seq_len or self.context_len)

    def __call__(self, x: jax.Array, sample_fn: SampleFn) -> VAEOutput:
        ctx = x[:, : self.context_len]
        future = x[:, self.context_len :]
        state_t, (mu, logvar) = self.encode_context(ctx)
        z = sample_fn(mu, logvar)
        logits = self.rollout(state_t, z, future.shape[1])
        return VAEOutput(
            logits=logits, target=future, mu=mu, logvar=logvar, z=z,
            extra_kl=zero_extra_kl(),
        )
