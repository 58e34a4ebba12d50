"""Config 3 (BASELINE.json:9): ConvLSTM sequence VAE on 20-frame clips.

Parity with the reference's recurrent sequence VAE (SURVEY.md 2.1): encode the
whole clip to a single latent, decode the whole clip back.  TPU-first
structure (SURVEY.md 3.2):

- the per-frame conv stack runs batched over B*T (one big XLA conv — MXU
  utilization scales with batch), only the recurrence is sequential;
- the ConvLSTM operates at 8x8 spatial resolution (3 stride-2 downsamples),
  so each scan step is cheap and VMEM-resident;
- encode: scan over T frames -> terminal hidden state -> (mu, logvar);
- decode: z -> initial (c, h) + a per-step z-token input, scan T steps,
  then one batched deconv stack back to 64x64 logits.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

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


class ConvLSTMSeqVAE(nn.Module):
    latent_dim: int = 128
    enc_channels: Sequence[int] = (32, 64, 128)  # 64 -> 32 -> 16 -> 8
    lstm_features: int = 128
    image_size: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    unroll: int = 1  # time-scan unroll factor for both ConvLSTMs
    gate_bf16: bool = False  # bf16 pointwise gate math + cell state
    fused: Optional[bool] = None  # fused Pallas time-scan (None = auto on TPU)
    dec_upsample: str = "fast"  # frame-decoder layout: fast | fast_mid | fast_midw | fast_hq | transpose
    enc_x_kernel: int = 3  # encoder LSTM input-projection kernel (1 = matmul)
    token_ch: int = 16  # decoder z-token channels: the per-step information
    # bandwidth from z into the decoder recurrence.  Widening is nearly free
    # at train time — the token is time-constant, so the ConvLSTM's
    # constant-input fast path projects it through conv_x exactly once per
    # clip regardless of width (round-5 architecture probe knob).

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
        # z -> initial decoder state (c, h) and a per-step input token.
        self.z_to_state = nn.Dense(
            2 * self.grid * self.grid * self.lstm_features, dtype=jnp.float32
        )
        self.z_to_token = nn.Dense(
            self.grid * self.grid * self.token_ch, dtype=jnp.float32
        )
        self.dec_lstm = ConvLSTM(
            self.lstm_features, name="dec_lstm",
            dtype=self.dtype, remat=self.remat, unroll=self.unroll,
            gate_dtype=gate_dtype, fused=self.fused,
        )
        self.frame_dec = ConvDecoder(
            tuple(reversed(self.enc_channels)), dtype=self.dtype,
            upsample=self.dec_upsample,
        )

    def encode_features(self, x: jax.Array) -> jax.Array:
        """(B, T, H, W) -> (B, T, g, g, C): per-frame conv stack, batched B*T."""
        b, t = x.shape[:2]
        frames = x.reshape(b * t, *x.shape[2:])[..., None]
        with jax.named_scope("frame_enc"):
            feats = self.frame_enc(frames)
        return feats.reshape(b, t, *feats.shape[1:])

    def encode(self, x: jax.Array):
        """(B, T, H, W) f32 -> (mu, logvar) from the terminal LSTM state."""
        feats = self.encode_features(x)
        b = x.shape[0]
        state0 = ConvLSTMCell.initial_state(
            b, self.grid, self.grid, self.lstm_features, dtype=self.dtype
        )
        with jax.named_scope("enc_lstm"):
            (c_t, h_t), _ = self.enc_lstm(state0, feats, need_hs=False)
        del c_t
        with jax.named_scope("latent_head"):
            return self.head(h_t)

    def _init_decoder(self, z: jax.Array):
        b = z.shape[0]
        g, f = self.grid, self.lstm_features
        ch = self.z_to_state(z).reshape(b, g, g, 2 * f).astype(self.dtype)
        c0, h0 = ch[..., :f], ch[..., f:]
        # Time-constant token: shape (B, 1, g, g, token_ch) — the ConvLSTM's
        # constant-input fast path projects it through conv_x exactly once.
        token = self.z_to_token(z).reshape(
            b, 1, g, g, self.token_ch
        ).astype(self.dtype)
        return (c0, h0), token

    def decode(self, z: jax.Array, t: int) -> jax.Array:
        """z: (B, latent) -> logits (B, t, H, W)."""
        with jax.named_scope("z_init"):
            state0, token = self._init_decoder(z)
        with jax.named_scope("dec_lstm"):
            _, hs = self.dec_lstm(state0, token, length=t)  # (B, t, g, g, F)
        b = z.shape[0]
        flat = hs.reshape(b * t, *hs.shape[2:])
        with jax.named_scope("frame_dec"):
            logits = self.frame_dec(flat)[..., 0]  # batched deconv over B*t
        return logits.reshape(b, t, self.image_size, self.image_size)

    def prior_logits(self, rng: jax.Array, batch: int, seq_len=None) -> jax.Array:
        """Prior-sampling protocol (sample.generate.prior_sample): z ~ N(0,I)."""
        z = jax.random.normal(rng, (batch, self.latent_dim), jnp.float32)
        return self.decode(z, seq_len or 20)

    def __call__(self, x: jax.Array, sample_fn: SampleFn) -> VAEOutput:
        mu, logvar = self.encode(x)
        z = sample_fn(mu, logvar)
        logits = self.decode(z, x.shape[1])
        return VAEOutput(
            logits=logits, target=x, mu=mu, logvar=logvar, z=z,
            extra_kl=zero_extra_kl(),
        )
