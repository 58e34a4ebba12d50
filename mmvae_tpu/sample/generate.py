"""Sampling / reconstruction / rollout (SURVEY.md C17, call stack 3.3).

Contract (BASELINE.json:5): "the sampling/rollout path reproduces reference
frame generations to output fidelity".  Three entry points mirroring the
reference's notebook workflows (SURVEY.md 2.1 "Sampling/viz"):

- `reconstruct(model, params, x, rng)`: encode -> sample -> decode -> sigmoid.
- `prior_sample(model, params, rng, batch, ...)`: decode z ~ N(0, I) (or the
  learned prior chain for the hierarchical model).
- `rollout(model, params, ctx, n_future, rng)`: context -> future frames
  (prediction model), autoregressive over the decoder ConvLSTM.

All return f32 frames in [0, 1]; `save_grid`/`save_gif` dump PNG grids and
GIFs of sequences.  Device->host transfer happens once, at the end (3.3).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.models.base import VAEOutput


def _sample_fn_from(rng: jax.Array):
    def sample_fn(mu, logvar, salt=0):
        key = jax.random.fold_in(rng, salt)
        return mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)

    return sample_fn


def reconstruct(model, params, x: jax.Array, rng: jax.Array) -> np.ndarray:
    """Posterior reconstruction of preprocessed frames x (f32 in [0,1])."""
    out: VAEOutput = model.apply(params, x, _sample_fn_from(rng))
    return np.asarray(jax.nn.sigmoid(out.logits))


def prior_sample(
    model,
    params,
    rng: jax.Array,
    batch: int,
    *,
    seq_len: Optional[int] = None,
) -> np.ndarray:
    """Decode latents from the prior.

    Dispatch is a protocol, not a type check: every model implements
    `prior_logits(rng, batch, seq_len) -> logits` (z ~ N(0, I) for the flat
    VAEs, the learned autoregressive chunk prior for the hierarchical one),
    so subclasses and renamed models keep working.
    """
    fn = getattr(model, "prior_logits", None)
    if fn is None:
        raise TypeError(
            f"prior_sample: {type(model).__name__} does not implement the "
            "prior-sampling protocol (a `prior_logits(rng, batch, seq_len)` "
            "method returning frame logits)"
        )
    logits = model.apply(params, rng, batch, seq_len, method=fn)
    return np.asarray(jax.nn.sigmoid(logits))


def rollout(
    model, params, ctx: jax.Array, n_future: int, rng: jax.Array
) -> np.ndarray:
    """Context frames -> n_future predicted frames (prediction model).

    ctx: (B, Tc, H, W) f32 in [0,1].  The latent is drawn from the posterior
    q(z | ctx); the decoder ConvLSTM starts from the context encoder's
    terminal state (see models.pred_vae).
    """

    def fwd(mdl, x):
        state_t, (mu, logvar) = mdl.encode_context(x)
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mu.shape)
        return mdl.rollout(state_t, z, n_future)

    logits = model.apply(params, ctx, method=fwd)
    return np.asarray(jax.nn.sigmoid(logits))


# -- image/video dumping -----------------------------------------------------


def _to_u8(frames: np.ndarray) -> np.ndarray:
    return (np.clip(frames, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def save_grid(frames: np.ndarray, path: str, ncols: Optional[int] = None) -> None:
    """Tile (N, H, W) frames into a PNG grid."""
    from PIL import Image

    frames = _to_u8(frames.reshape(-1, *frames.shape[-2:]))
    n, h, w = frames.shape
    ncols = ncols or int(np.ceil(np.sqrt(n)))
    nrows = int(np.ceil(n / ncols))
    grid = np.zeros((nrows * h, ncols * w), np.uint8)
    for i, f in enumerate(frames):
        r, c = divmod(i, ncols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = f
    Image.fromarray(grid, mode="L").save(path)


def save_gif(seq: np.ndarray, path: str, fps: int = 8) -> None:
    """(T, H, W) or (B, T, H, W) -> animated GIF (batch tiled horizontally)."""
    from PIL import Image

    if seq.ndim == 4:  # tile batch side by side
        seq = np.concatenate(list(seq), axis=-1)
    u8 = _to_u8(seq)
    imgs = [Image.fromarray(f, mode="L") for f in u8]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )
