"""Quantitative generation fidelity (round-1 verdict item 8).

Contract (BASELINE.json:5): "the sampling/rollout path reproduces reference
frame generations to output fidelity".  Shape/finiteness checks live in
test_sample.py; these tests assert actual fidelity after a short
deterministic train: per-pixel reconstruction BCE and context->future rollout
BCE must beat the base-rate predictor (a constant mean-pixel frame) with
margin.  Thresholds are calibrated with ~25% headroom over measured values on
the CPU harness (recon 0.161, rollout 0.159; base rates ~0.20-0.21).
"""

import numpy as np

import jax
import jax.numpy as jnp

from test_train_smoke import _tiny_config

from mmvae_tpu.data import transforms
from mmvae_tpu.data.loader import generate_moving_mnist
from mmvae_tpu.sample import generate as gen
from mmvae_tpu.train.loop import build_model, fit


def _bce_per_pixel(probs: np.ndarray, target: np.ndarray) -> float:
    eps = 1e-6
    p = np.clip(probs, eps, 1 - eps)
    return float(np.mean(-(target * np.log(p) + (1 - target) * np.log(1 - p))))


def _binarized(clips: np.ndarray) -> np.ndarray:
    x = np.asarray(transforms.normalize(jnp.asarray(clips)))
    return (x > 0.5).astype(np.float32)


class TestReconstructionFidelity:
    def test_mlp_recon_beats_base_rate(self):
        cfg = _tiny_config("mlp_vae")
        cfg.train.steps = 200
        cfg.train.log_every = 200
        state, _ = fit(cfg)
        model = build_model(cfg)

        frames = _binarized(generate_moving_mnist(8, seq_len=4, seed=5))[:, 0]
        recon = gen.reconstruct(
            model, state.params, jnp.asarray(frames), jax.random.key(1)
        )
        bce = _bce_per_pixel(recon, frames)
        base = _bce_per_pixel(np.full_like(frames, frames.mean()), frames)
        assert bce < 0.9 * base, f"recon bce/px {bce:.3f} vs base-rate {base:.3f}"
        assert bce < 0.20, f"recon bce/px {bce:.3f} above absolute threshold"


class TestRolloutFidelity:
    def test_pred_rollout_beats_base_rate(self):
        cfg = _tiny_config("pred_vae")
        cfg.train.steps = 300
        cfg.train.log_every = 300
        state, _ = fit(cfg)
        model = build_model(cfg)

        clips = _binarized(generate_moving_mnist(8, seq_len=4, seed=6))
        ctx, future = clips[:, :2], clips[:, 2:]
        ro = gen.rollout(model, state.params, jnp.asarray(ctx), 2, jax.random.key(0))
        bce = _bce_per_pixel(ro, future)
        base = _bce_per_pixel(np.full_like(future, future.mean()), future)
        assert bce < 0.95 * base, f"rollout bce/px {bce:.3f} vs base-rate {base:.3f}"
        assert bce < 0.20, f"rollout bce/px {bce:.3f} above absolute threshold"
