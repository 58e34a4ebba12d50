"""Integration smoke: short end-to-end training of every config (SURVEY.md 4.2).

Each of the 5 contract configs (BASELINE.json:6-12) trains for a few dozen
steps on tiny synthetic data; loss must decrease, checkpoints must round-trip,
sampling must produce finite frames.
"""

import numpy as np
import pytest

import jax

from mmvae_tpu.configs import CONFIG_REGISTRY, get_config

# CPU-harness-sized overrides per config (tiny widths, tiny data).
TINY_OVERRIDES = {
    "mlp_vae": [
        "model.kwargs.latent_dim=8", "model.kwargs.hidden_dim=32",
        "data.batch_size=32",
    ],
    "conv_vae": [
        "model.kwargs.latent_dim=8", "data.batch_size=16",
    ],
    "seq_vae": [
        "model.kwargs.latent_dim=8", "data.batch_size=4", "data.seq_len=4",
    ],
    "pred_vae": [
        "model.kwargs.latent_dim=8", "model.kwargs.context_len=2",
        "data.batch_size=4", "data.seq_len=4",
    ],
    "hier_vae": [
        "model.kwargs.chunk_len=2", "model.kwargs.global_latent=8",
        "model.kwargs.chunk_latent=4", "data.batch_size=2", "data.seq_len=4",
    ],
}
SMALL_MODEL = [
    "data.num_sequences=32", "train.log_every=10",
    "optim.lr=3e-3", "train.data_parallel=false",
    "model.dtype=float32",  # bf16 emulation is slow on the CPU harness
]
NARROW = {
    "seq_vae": {"enc_channels": (4, 8), "lstm_features": 8},
    "pred_vae": {"enc_channels": (4, 8), "lstm_features": 8},
    "hier_vae": {"enc_channels": (4, 8), "lstm_features": 8, "chunk_feature": 16},
    "conv_vae": {"channels": (4, 8, 8, 8)},
}


def _tiny_config(name):
    cfg = get_config(name, tuple(TINY_OVERRIDES[name] + SMALL_MODEL))
    cfg.model.kwargs.update(NARROW.get(name, {}))
    return cfg


@pytest.mark.parametrize("name", list(CONFIG_REGISTRY))
def test_train_decreases_loss(name):
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config(name)
    cfg.train.steps = 30
    cfg.train.log_every = 5
    state, history = fit(cfg)
    assert len(history) >= 2
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"{name}: loss did not decrease: {losses}"
    assert int(np.asarray(state.step)) == 30


def test_beta_kl_warmup():
    """beta=0 must zero the KL gradient: posterior stays near init while BCE
    falls; with warmup the objective anneals in. Smoke: trains and reports
    UNSCALED loss metrics regardless of beta."""
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.optim.beta = 0.5
    cfg.optim.kl_warmup_steps = 10
    cfg.train.steps = 20
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0]
    # metrics report plain ELBO components
    assert all(h["kl"] >= 0 or np.isfinite(h["kl"]) for h in history)


def test_device_resident_training_decreases_loss():
    """On-device batch gather path (HBM-resident dataset)."""
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.data.device_resident = True
    cfg.train.steps = 30
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0]


def test_device_resident_per_clip():
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("seq_vae")
    cfg.data.device_resident = True
    cfg.train.steps = 20
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert losses[-1] < losses[0]


def test_resident_epoch_indices_cover_each_row_once():
    """data.resident_epochs=True must give shuffled-epoch (no-replacement)
    semantics: within one epoch every row appears exactly once, and epochs
    reshuffle (VERDICT r1 item 7)."""
    import jax.numpy as jnp

    from mmvae_tpu.train.loop import resident_row_indices

    n_rows, batch = 24, 6
    steps_per_epoch = n_rows // batch
    fn = jax.jit(
        lambda s: resident_row_indices(s, n_rows, batch, seed_base=3)
    )
    epochs = []
    for e in range(3):
        rows = np.concatenate(
            [
                np.asarray(fn(jnp.int32(e * steps_per_epoch + k)))
                for k in range(steps_per_epoch)
            ]
        )
        assert sorted(rows.tolist()) == list(range(n_rows)), (
            f"epoch {e} is not a permutation: {sorted(rows.tolist())}"
        )
        epochs.append(rows)
    assert not np.array_equal(epochs[0], epochs[1]), "epochs did not reshuffle"
    # per-shard decorrelation under DP
    a = np.asarray(
        jax.jit(
            lambda s: resident_row_indices(
                s, n_rows, batch, 3, shard_index=jnp.int32(0)
            )
        )(jnp.int32(0))
    )
    b = np.asarray(
        jax.jit(
            lambda s: resident_row_indices(
                s, n_rows, batch, 3, shard_index=jnp.int32(1)
            )
        )(jnp.int32(0))
    )
    assert not np.array_equal(a, b)


def test_device_resident_epoch_mode_trains():
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.data.device_resident = True
    cfg.data.resident_epochs = True
    cfg.train.steps = 30
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_checkpoint_roundtrip(tmp_path):
    from mmvae_tpu.train import checkpoint as ckpt
    from mmvae_tpu.train.loop import build_model, fit, _sample_shape
    from mmvae_tpu.train.state import create_train_state

    cfg = _tiny_config("mlp_vae")
    cfg.train.steps = 12
    cfg.train.checkpoint_every = 6
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    state, _ = fit(cfg)

    model = build_model(cfg)
    template = create_train_state(
        model, cfg.optim, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    restored, step, data_step = ckpt.restore_latest(cfg.train.checkpoint_dir, template)
    assert step == 12 and data_step == 12
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues(tmp_path):
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.train.steps = 10
    cfg.train.checkpoint_every = 5
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    fit(cfg)

    cfg.train.resume = True
    cfg.train.steps = 14
    state, _ = fit(cfg)
    assert int(np.asarray(state.step)) == 14


def test_metrics_csv(tmp_path):
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.train.steps = 10
    cfg.train.log_every = 5
    cfg.train.metrics_csv = str(tmp_path / "m.csv")
    fit(cfg)
    rows = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert rows[0].startswith("step,loss,bce,kl")
    assert len(rows) >= 2
