"""On-device Moving MNIST generation — fresh clips inside the jitted step.

The host generator (`data.loader.generate_moving_mnist`) is the capability
oracle; this module re-derives the SAME process as a pure jittable function
so the train step can draw unlimited fresh clips at device speed (no fixed
dataset, no host generation, no host->device traffic).  Motivation is
measured, not speculative: at the 20k-step convergence protocol the binding
quality constraint is OVERFITTING on the fixed 10k-clip split (val bottoms
and rises while train keeps falling; LR-decay and weight-decay probes both
made val WORSE — docs/RESULTS.md round 9).  Fresh data per step removes the
train/val gap at its source.

TPU-first design (no reference equivalent — the reference trains on a fixed
.npy):

- **Closed-form bounce trajectories.**  The host generator integrates
  position step-by-step with per-step elastic reflection.  Reflection off
  [0, lim] walls is a triangular fold of the free trajectory, so position at
  time t has the closed form ``lim - |((p0 + v*t) mod 2*lim) - lim|`` — every
  (clip, digit, frame) position computed in one vectorized expression, no
  scan, no data-dependent control flow.
- **Sprite compositing as one-hot matmuls (MXU).**  Placing a 16x16 sprite
  at integer (y, x) on a 64x64 canvas is ``P_y @ S @ P_x^T`` with one-hot
  placement matrices built from iota comparisons.  Batched over
  (clip, digit, frame) this is two tiny einsums (~0.4 GF/step at the
  training batch) that XLA maps straight onto the MXU — no scatter, no
  dynamic_update_slice, fully static shapes.
- Digit identity / start / angle / speed match the host distributions
  (U{0..9}, U[0,lim)^2, U[0,2pi), U[2,4.5)); compositing saturates at 1.0
  and quantizes to uint8 exactly like the host (`*255` truncation).  The
  RNG differs (threefry keys vs numpy Generator), so parity is
  distributional, not bitwise — tests/test_ongen.py checks the invariants
  (support, bounce containment, mean intensity, marginal uniformity).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmvae_tpu.data.loader import _digit_sprite

SPRITE_SIZE = 16


def sprite_table(size: int = SPRITE_SIZE) -> np.ndarray:
    """(10, size, size) float32 digit sprites — identical to the host ones."""
    return np.stack([_digit_sprite(d, size) for d in range(10)]).astype(np.float32)


def generate_clips(
    key: jax.Array,
    batch: int,
    *,
    seq_len: int = 20,
    image_size: int = 64,
    num_digits: int = 2,
    sprites: Optional[jax.Array] = None,
) -> jax.Array:
    """Fresh uint8 clips (batch, seq_len, image_size, image_size), in-graph.

    Pure function of `key`; all shapes static — safe under jit / scan /
    shard_map (fold the shard index into the seed upstream for decorrelated
    shards, as the train step already does for its other streams).

    `sprites` injects a custom (K, S, S) float [0, 1] bank (same hook as the
    host generator, `loader.load_sprite_bank`); identity sampling is uniform
    over K.  Default: the 10-glyph font table (a compile-time constant).
    """
    if sprites is None:
        sprites = sprite_table()  # 10 KB compile-time constant
    sprites = jnp.asarray(sprites, jnp.float32)
    sp = sprites.shape[-1]
    lim = float(image_size - sp)

    k_digit, k_pos, k_theta, k_speed = jax.random.split(key, 4)
    shape = (batch, num_digits)
    digits = jax.random.randint(k_digit, shape, 0, sprites.shape[0])
    pos0 = jax.random.uniform(k_pos, shape + (2,), maxval=lim)
    theta = jax.random.uniform(k_theta, shape, maxval=2.0 * np.pi)
    speed = jax.random.uniform(k_speed, shape, minval=2.0, maxval=4.5)
    vel = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1) * speed[..., None]

    # Closed-form reflected trajectory: (B, D, T, 2) float positions in
    # [0, lim], then integer placement by truncation (positions are >= 0,
    # matching the host's astype(int)).
    t = jnp.arange(seq_len, dtype=jnp.float32)
    free = pos0[:, :, None, :] + vel[:, :, None, :] * t[None, None, :, None]
    folded = lim - jnp.abs(jnp.mod(free, 2.0 * lim) - lim)
    yx = folded.astype(jnp.int32)  # (B, D, T, 2)

    # One-hot placement matmuls: canvas[r, c] = sum_ij oh_y[r, i] S[i, j]
    # oh_x[c, j], batched over (B, D, T) with the digit sum fused into the
    # final contraction.
    canvas_idx = jnp.arange(image_size, dtype=jnp.int32)
    win = jnp.arange(sp, dtype=jnp.int32)
    # (B, D, T, image, sp): row r participates iff r - y in [0, sp)
    oh_y = (canvas_idx[:, None] - yx[..., 0][..., None, None] == win).astype(
        jnp.float32
    )
    oh_x = (canvas_idx[:, None] - yx[..., 1][..., None, None] == win).astype(
        jnp.float32
    )
    s_bd = sprites[digits]  # (B, D, sp, sp)
    half = jnp.einsum("bdij,bdtcj->bdtic", s_bd, oh_x)
    frames = jnp.einsum("bdtri,bdtic->btrc", oh_y, half)  # digit sum fused
    frames = jnp.clip(frames, 0.0, 1.0)
    return (frames * 255.0).astype(jnp.uint8)


def clip_batch_fn(
    batch: int,
    sample_shape: Tuple[int, ...],
    *,
    num_digits: int = 2,
    per_frame: bool = False,
    sprites: Optional[jax.Array] = None,
):
    """Closure (key) -> uint8 batch shaped like the training data.

    `sample_shape` is one sample's uint8 shape, (T, H, W) for clip models or
    (H, W) for the per-frame configs.  Per-frame batches are 1-frame clips
    squeezed: the reflected position at ANY t is uniform on [0, lim] (a fold
    of uniform + independent shift), so t=0 frames already have the marginal
    frame distribution the shuffled per-frame loader yields.  `sprites`
    injects a custom bank (see `generate_clips`).
    """
    if sprites is not None:
        sprites = jnp.asarray(sprites, jnp.float32)
    if per_frame or len(sample_shape) == 2:
        h, w = sample_shape[-2:]
        assert h == w, f"square frames only, got {sample_shape}"

        def gen_frames(key):
            clips = generate_clips(
                key, batch, seq_len=1, image_size=h, num_digits=num_digits,
                sprites=sprites,
            )
            return clips[:, 0]

        return gen_frames

    t, h, w = sample_shape
    assert h == w, f"square frames only, got {sample_shape}"

    def gen_clips(key):
        return generate_clips(
            key, batch, seq_len=t, image_size=h, num_digits=num_digits,
            sprites=sprites,
        )

    return gen_clips
