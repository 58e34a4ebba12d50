"""Config 5 (BASELINE.json:11): hierarchical temporal-latent video VAE.

100-frame clips, two-level latent hierarchy (SURVEY.md 7 "hard parts" #4):

- frames are chunked into K chunks of Tc frames (default 10 x 10);
- a **global clip latent** z_g ~ q(z_g | all chunk features) captures content
  (digit identity/appearance); its KL against N(0, I) goes through the fused
  Pallas kernel;
- **per-chunk latents** z_k ~ q(z_k | feat_k, z_g) capture within-chunk motion;
  their KL is taken against a **learned autoregressive prior**
  p(z_k | z_g, z_{k-1}) (GRU over chunk index) and returned as
  `VAEOutput.extra_kl` (general Gaussian-Gaussian KL, XLA-computed);
- decoding is chunk-parallel: each chunk's ConvLSTM decodes its Tc frames
  batched over B*K — cross-chunk temporal structure lives in the latent chain,
  so the expensive pixel-level recurrences all run in parallel on the MXU.

TPU structure notes: the only sequential parts are the two cheap dense scans
(posterior aggregation uses none; the prior chain is a K-step lax.scan over
dense ops) and the Tc-step ConvLSTM scans, which are batched over B*K.  With
`remat=True` the decoder rematerializes per-step activations for 100-frame
backprop (long-context mechanism, SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mmvae_tpu.models.base import (
    ConvDecoder,
    ConvEncoder,
    SampleFn,
    VAEOutput,
)
from mmvae_tpu.models.convlstm import ConvLSTM, ConvLSTMCell


def gaussian_kl(mu_q, logvar_q, mu_p, logvar_p) -> jax.Array:
    """KL(N(mu_q, var_q) || N(mu_p, var_p)), summed over all elements, f32."""
    mu_q, logvar_q, mu_p, logvar_p = (
        a.astype(jnp.float32) for a in (mu_q, logvar_q, mu_p, logvar_p)
    )
    return 0.5 * jnp.sum(
        logvar_p
        - logvar_q
        + (jnp.exp(logvar_q) + (mu_q - mu_p) ** 2) * jnp.exp(-logvar_p)
        - 1.0
    )


class HierVideoVAE(nn.Module):
    global_latent: int = 128
    chunk_latent: int = 64
    chunk_len: int = 10
    enc_channels: Sequence[int] = (32, 64, 128)
    lstm_features: int = 128
    chunk_feature: int = 256
    image_size: int = 64
    dtype: jnp.dtype = jnp.float32
    remat: bool = True
    unroll: int = 1  # chunk-scan unroll factor for both ConvLSTMs
    gate_bf16: bool = False  # bf16 pointwise gate math + cell state
    fused: Optional[bool] = None  # fused Pallas time-scan (None = auto on TPU)
    dec_upsample: str = "fast"  # frame-decoder layout: fast | fast_mid | fast_midw | fast_hq | transpose
    enc_x_kernel: int = 3  # chunk LSTM input-projection kernel (1 = matmul)

    def setup(self):
        gate_dtype = jnp.bfloat16 if self.gate_bf16 else jnp.float32
        self.grid = self.image_size // (2 ** len(self.enc_channels))
        g, f = self.grid, self.lstm_features
        self.frame_enc = ConvEncoder(self.enc_channels, dtype=self.dtype)
        self.chunk_lstm = ConvLSTM(
            f, name="chunk_lstm", dtype=self.dtype, remat=self.remat,
            unroll=self.unroll, gate_dtype=gate_dtype, fused=self.fused,
            x_kernel=(self.enc_x_kernel, self.enc_x_kernel),
        )
        self.chunk_proj = nn.Dense(self.chunk_feature, dtype=jnp.float32)
        # Global posterior over mean-pooled chunk features.
        self.g_mu = nn.Dense(self.global_latent, dtype=jnp.float32)
        self.g_logvar = nn.Dense(self.global_latent, dtype=jnp.float32)
        # Chunk posterior q(z_k | feat_k, z_g): parallel over chunks.
        self.q_hidden = nn.Dense(256, dtype=jnp.float32)
        self.q_mu = nn.Dense(self.chunk_latent, dtype=jnp.float32)
        self.q_logvar = nn.Dense(self.chunk_latent, dtype=jnp.float32)
        # Learned prior chain p(z_k | z_g, z_{k-1}): GRU over chunk index.
        self.prior_gru = nn.GRUCell(features=256)
        self.prior_init = nn.Dense(256, dtype=jnp.float32)
        self.p_mu = nn.Dense(self.chunk_latent, dtype=jnp.float32)
        self.p_logvar = nn.Dense(self.chunk_latent, dtype=jnp.float32)
        # Chunk decoder: (z_g, z_k) -> initial ConvLSTM state + step token.
        self.z_to_state = nn.Dense(2 * g * g * f, dtype=jnp.float32)
        self.z_to_token = nn.Dense(g * g * 16, dtype=jnp.float32)
        self.dec_lstm = ConvLSTM(
            f, name="dec_lstm", dtype=self.dtype, remat=self.remat,
            unroll=self.unroll, gate_dtype=gate_dtype, fused=self.fused,
        )
        self.frame_dec = ConvDecoder(
            tuple(reversed(self.enc_channels)), dtype=self.dtype,
            upsample=self.dec_upsample,
        )

    # -- encoding ----------------------------------------------------------

    def chunk_features(self, x: jax.Array) -> jax.Array:
        """(B, T, H, W) -> (B, K, chunk_feature); ConvLSTM batched over B*K."""
        b, t = x.shape[:2]
        k = t // self.chunk_len
        assert k * self.chunk_len == t, "seq_len must be a multiple of chunk_len"
        frames = x.reshape(b * t, *x.shape[2:])[..., None]
        with jax.named_scope("frame_enc"):
            feats = self.frame_enc(frames)  # (B*T, g, g, C)
        feats = feats.reshape(b * k, self.chunk_len, *feats.shape[1:])
        state0 = ConvLSTMCell.initial_state(
            b * k, self.grid, self.grid, self.lstm_features, dtype=self.dtype
        )
        with jax.named_scope("chunk_lstm"):
            (_, h_t), _ = self.chunk_lstm(state0, feats, need_hs=False)
        pooled = h_t.reshape(b * k, -1).astype(jnp.float32)
        return self.chunk_proj(pooled).reshape(b, k, self.chunk_feature)

    def encode(self, x: jax.Array):
        """Global posterior (mu, logvar) — the top-level latent."""
        cf = self.chunk_features(x)
        pooled = jnp.mean(cf, axis=1)
        return self.g_mu(pooled), self.g_logvar(pooled)

    def prior_params(self, z_g: jax.Array, z_chunks: jax.Array):
        """p(z_k | z_g, z_{k-1}) params for all k (teacher-forced on sampled z).

        z_chunks: (B, K, Lc) sampled chunk latents. Returns (mu_p, logvar_p)
        each (B, K, Lc). K-step lax.scan over cheap dense ops.
        """
        b, k, _ = z_chunks.shape
        s = jnp.tanh(self.prior_init(z_g))
        # Python loop (K is small and static); linen shares the GRU params
        # across iterations, and variable creation inside lax.scan is illegal
        # at init time anyway.
        mus, logvars = [], []
        z_prev = jnp.zeros_like(z_chunks[:, 0])
        for i in range(k):
            s, _ = self.prior_gru(s, z_prev)
            mus.append(self.p_mu(s))
            logvars.append(self.p_logvar(s))
            z_prev = z_chunks[:, i]
        return jnp.stack(mus, axis=1), jnp.stack(logvars, axis=1)

    # -- decoding ----------------------------------------------------------

    def decode_chunks(self, z_g: jax.Array, z_chunks: jax.Array) -> jax.Array:
        """(B, Lg), (B, K, Lc) -> logits (B, K*Tc, H, W); chunks in parallel."""
        b, k, _ = z_chunks.shape
        g, f, tc = self.grid, self.lstm_features, self.chunk_len
        zg_rep = jnp.broadcast_to(z_g[:, None], (b, k, z_g.shape[-1]))
        zz = jnp.concatenate([zg_rep, z_chunks], axis=-1).reshape(b * k, -1)
        ch = self.z_to_state(zz).reshape(b * k, g, g, 2 * f).astype(self.dtype)
        state0 = (ch[..., :f], ch[..., f:])
        # constant token -> single-shot input projection in the ConvLSTM
        token = self.z_to_token(zz).reshape(b * k, 1, g, g, 16).astype(self.dtype)
        with jax.named_scope("dec_lstm"):
            _, hs = self.dec_lstm(state0, token, length=tc)  # (B*K, Tc, g, g, F)
        flat = hs.reshape(b * k * tc, *hs.shape[2:])
        with jax.named_scope("frame_dec"):
            logits = self.frame_dec(flat)[..., 0]
        return logits.reshape(b, k * tc, self.image_size, self.image_size)

    # -- training forward ----------------------------------------------------

    def __call__(self, x: jax.Array, sample_fn: SampleFn) -> VAEOutput:
        b, t = x.shape[:2]
        k = t // self.chunk_len
        cf = self.chunk_features(x)  # (B, K, F)

        # Global latent (KL vs N(0,I) via the fused kernel downstream).
        pooled = jnp.mean(cf, axis=1)
        mu_g, logvar_g = self.g_mu(pooled), self.g_logvar(pooled)
        z_g = sample_fn(mu_g, logvar_g)

        # Chunk posteriors — parallel over K, one batched sample call.
        zg_rep = jnp.broadcast_to(z_g[:, None], (b, k, z_g.shape[-1]))
        qin = jnp.concatenate([cf, zg_rep], axis=-1).reshape(b * k, -1)
        hq = jnp.tanh(self.q_hidden(qin))
        mu_c = self.q_mu(hq).reshape(b, k, self.chunk_latent)
        logvar_c = self.q_logvar(hq).reshape(b, k, self.chunk_latent)
        z_c = sample_fn(
            mu_c.reshape(b * k, -1), logvar_c.reshape(b * k, -1), salt=1
        ).reshape(b, k, self.chunk_latent)

        # Learned-prior KL for the chunk level (XLA; general Gaussian form).
        mu_p, logvar_p = self.prior_params(z_g, z_c)
        extra_kl = gaussian_kl(mu_c, logvar_c, mu_p, logvar_p)

        logits = self.decode_chunks(z_g, z_c)
        return VAEOutput(
            logits=logits, target=x, mu=mu_g, logvar=logvar_g, z=z_g,
            extra_kl=extra_kl,
        )

    # -- generation ----------------------------------------------------------

    def generate(self, rng: jax.Array, batch: int, n_chunks: int) -> jax.Array:
        """Prior sample: z_g ~ N(0,I); z_k ~ p(z_k|z_g, z_{k-1}); decode.

        Returns logits (B, n_chunks*Tc, H, W).
        """
        rng_g, rng_c = jax.random.split(rng)
        z_g = jax.random.normal(rng_g, (batch, self.global_latent))
        s = jnp.tanh(self.prior_init(z_g))
        z_prev = jnp.zeros((batch, self.chunk_latent))
        keys = jax.random.split(rng_c, n_chunks)
        zs = []
        for i in range(n_chunks):  # Python loop: n_chunks static, params shared
            s, _ = self.prior_gru(s, z_prev)
            mu, logvar = self.p_mu(s), self.p_logvar(s)
            z_prev = mu + jnp.exp(0.5 * logvar) * jax.random.normal(keys[i], mu.shape)
            zs.append(z_prev)
        z_chunks = jnp.stack(zs, axis=1)  # (B, K, Lc)
        return self.decode_chunks(z_g, z_chunks)

    def prior_logits(self, rng: jax.Array, batch: int, seq_len=None) -> jax.Array:
        """Prior-sampling protocol: the learned autoregressive chunk prior."""
        return self.generate(rng, batch, (seq_len or 100) // self.chunk_len)
