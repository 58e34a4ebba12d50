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


def test_lr_schedule_values_and_training():
    """make_lr: constant stays a float (checkpoint-stable optimizer pytree);
    cosine/linear decay from lr to lr*end_ratio over the horizon, warmup
    ramps from 0; get_config defaults the horizon to train.steps.  Training
    under a cosine schedule still decreases the loss."""
    import numpy as np
    from mmvae_tpu.train.loop import fit
    from mmvae_tpu.train.state import make_lr

    cfg = _tiny_config("mlp_vae")
    assert make_lr(cfg.optim) == cfg.optim.lr  # plain float, not a schedule

    cfg.optim.lr_schedule = "cosine"
    cfg.optim.lr_warmup_steps = 5
    cfg.optim.lr_decay_steps = 20
    cfg.optim.lr_end_ratio = 0.1
    sched = make_lr(cfg.optim)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), cfg.optim.lr)
    assert np.isclose(float(sched(20)), 0.1 * cfg.optim.lr)

    cfg.optim.lr_schedule = "linear"
    sched = make_lr(cfg.optim)
    assert np.isclose(float(sched(5)), cfg.optim.lr)
    mid = float(sched(12))
    assert 0.1 * cfg.optim.lr < mid < cfg.optim.lr
    assert np.isclose(float(sched(20)), 0.1 * cfg.optim.lr)

    # get_config resolves a zero horizon to the run length.
    cfg2 = get_config(
        "mlp_vae", ("optim.lr_schedule=cosine", "train.steps=123")
    )
    assert cfg2.optim.lr_decay_steps == 123

    # unknown schedule / missing horizon raise
    cfg.optim.lr_schedule = "step"
    with pytest.raises(ValueError):
        make_lr(cfg.optim)
    cfg.optim.lr_schedule = "cosine"
    cfg.optim.lr_decay_steps = 0
    with pytest.raises(ValueError):
        make_lr(cfg.optim)

    cfg = _tiny_config("mlp_vae")
    cfg.optim.lr_schedule = "cosine"
    cfg.optim.lr_warmup_steps = 5
    cfg.optim.lr_decay_steps = 30
    cfg.train.steps = 30
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_weight_decay_shrinks_params():
    """optim.weight_decay > 0 switches to decoupled AdamW: with zero-ish
    gradients the params must shrink toward 0; training still decreases
    the loss."""
    import jax.numpy as jnp
    from mmvae_tpu.train.loop import fit
    from mmvae_tpu.train.state import make_optimizer

    cfg = _tiny_config("mlp_vae")
    cfg.optim.weight_decay = 0.1
    tx = make_optimizer(cfg.optim)
    p = {"w": jnp.ones((4,))}
    opt = tx.init(p)
    upd, _ = tx.update({"w": jnp.zeros((4,))}, opt, p)
    # decoupled decay: update = -lr * wd * p even at zero gradient
    assert float(upd["w"][0]) < 0.0

    cfg.optim.weight_decay = 1e-4
    cfg.train.steps = 30
    cfg.train.log_every = 5
    _, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_ema_params_tracked_and_evaluated(tmp_path):
    """optim.ema_decay > 0: the state carries an EMA of params (a trailing
    average — after a step it must differ from both init and the live
    params), the training eval reports val_*_ema columns, and the EMA
    round-trips through a checkpoint."""
    import jax
    import jax.numpy as jnp
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.optim.ema_decay = 0.9
    cfg.train.steps = 20
    cfg.train.log_every = 5
    cfg.train.eval_every = 10
    cfg.train.eval_batches = 1
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    state, history = fit(cfg)

    assert state.ema_params is not None
    leaves = jax.tree.leaves(state.params)
    ema_leaves = jax.tree.leaves(state.ema_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves, ema_leaves)
    ), "EMA should trail the live params"
    assert any("val_loss_ema" in h for h in history)

    # Round-trip: restore pulls the EMA back.
    from mmvae_tpu.train import checkpoint as ckpt
    from mmvae_tpu.train.loop import build_model, _sample_shape
    from mmvae_tpu.train.state import create_train_state

    fresh = create_train_state(
        build_model(cfg), cfg.optim, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    restored, step, _ = ckpt.restore_latest(cfg.train.checkpoint_dir, fresh)
    assert step == 20
    for a, b in zip(
        jax.tree.leaves(restored.ema_params), jax.tree.leaves(state.ema_params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # ema_decay=0 keeps the pytree EMA-free (old-checkpoint compatible).
    cfg2 = _tiny_config("mlp_vae")
    state2 = create_train_state(
        build_model(cfg2), cfg2.optim, jax.random.PRNGKey(0),
        _sample_shape(cfg2),
    )
    assert state2.ema_params is None

    # Standalone eval of the EMA params (the `mmvae eval --ema` path) —
    # works even when the eval config doesn't set ema_decay, and scores
    # different params than the raw eval.
    from mmvae_tpu.train.loop import evaluate

    cfg_eval = _tiny_config("mlp_vae")
    cfg_eval.train.eval_batches = 1
    raw = evaluate(cfg_eval, cfg.train.checkpoint_dir, max_batches=1)
    ema = evaluate(
        cfg_eval, cfg.train.checkpoint_dir, max_batches=1, use_ema=True
    )
    assert np.isfinite(raw["val_loss"]) and np.isfinite(ema["val_loss"])
    assert raw["val_loss"] != ema["val_loss"]


def test_on_device_generate_training():
    """data.on_device_generate: the step generates fresh clips in-graph —
    no train dataset, loss decreases, eval (fixed val split) still runs,
    and steps_per_call fusion composes with the generated stream."""
    from mmvae_tpu.train.loop import fit

    for name in ("seq_vae", "mlp_vae"):  # clip model + per-frame model
        cfg = _tiny_config(name)
        cfg.data.on_device_generate = True
        cfg.train.steps = 30
        cfg.train.log_every = 5
        cfg.train.eval_every = 15
        cfg.train.eval_batches = 1
        state, history = fit(cfg)
        losses = [h["loss"] for h in history]
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0], f"{name} ongen: {losses}"
        assert any("val_loss" in h for h in history)


def test_on_device_generate_dp_and_steps_per_call():
    """ongen under shard_map DP (8 fake devices) + fused multi-step
    dispatch: shards generate disjoint clips and training is finite and
    decreasing."""
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("seq_vae")
    cfg.data.on_device_generate = True
    cfg.train.data_parallel = True
    cfg.data.batch_size = 8  # divides the 8 fake devices
    cfg.train.steps = 30
    cfg.train.log_every = 5
    cfg.train.eval_every = 0
    cfg.train.steps_per_call = 5
    state, history = fit(cfg)
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"ongen dp: {losses}"


def test_ongen_guards_canonical_val_mismatch(tmp_path, capsys):
    """on_device_generate with a val split resolved from the CANONICAL file
    must fail loudly without a sprite bank (font sprites can never match the
    real MNIST crops: silent train/val mismatch, VERDICT r3 missing-1), and
    run — with a visible warning — when a custom bank is supplied."""
    from mmvae_tpu.data.loader import generate_moving_mnist
    from mmvae_tpu.train.loop import fit

    # Canonical-format fixture: time-major (20, N, 64, 64) uint8, as the
    # Toronto mnist_test_seq.npy ships.
    batchmajor = generate_moving_mnist(8, seq_len=20, seed=0)
    canon = tmp_path / "mnist_test_seq.npy"
    np.save(canon, np.ascontiguousarray(batchmajor.transpose(1, 0, 2, 3)))

    cfg = _tiny_config("seq_vae")
    cfg.data.path = str(canon)
    cfg.data.on_device_generate = True
    cfg.train.steps = 2
    cfg.train.log_every = 1
    cfg.train.eval_every = 2  # an eval WILL run -> the mismatch is real
    with pytest.raises(ValueError, match="sprite_bank"):
        fit(cfg)

    # Throughput-only run (eval fully disabled): nothing to mismatch — warn
    # and proceed instead of blocking (ADVICE r4).
    cfg.train.eval_every = 0
    _, history = fit(cfg)
    assert all(np.isfinite(h["loss"]) for h in history)
    assert "eval is disabled" in capsys.readouterr().err

    # With a custom bank the run proceeds (the user asserts their bank
    # matches the digit source) but the choice is surfaced on stderr.
    bank = tmp_path / "bank.npy"
    np.save(bank, np.ones((2, 8, 8), np.float32) * 0.5)
    cfg.data.sprite_bank = str(bank)
    _, history = fit(cfg)
    assert all(np.isfinite(h["loss"]) for h in history)
    assert "sprite_bank" in capsys.readouterr().err


def test_ongen_sprite_bank_feeds_training(tmp_path):
    """data.sprite_bank plumbs through fit -> make_train_step -> ongen: with
    a constant-valued bank and procedural data, training runs and the
    generated distribution is the bank's (checked via the generator closure
    the step builds)."""
    from mmvae_tpu.data import ongen as ongen_mod
    from mmvae_tpu.train.loop import fit

    bank = tmp_path / "bank.npy"
    np.save(bank, np.ones((2, 8, 8), np.float32) * 0.5)

    cfg = _tiny_config("seq_vae")
    cfg.data.on_device_generate = True
    cfg.data.sprite_bank = str(bank)
    cfg.train.steps = 4
    cfg.train.log_every = 2
    cfg.train.eval_every = 0
    _, history = fit(cfg)
    assert all(np.isfinite(h["loss"]) for h in history)

    # The same bank through the generator the step uses: constant sprites ->
    # composited pixel support is exactly {0, 127} (0.5*255 truncated).
    gen = ongen_mod.clip_batch_fn(
        4, (cfg.data.seq_len, 64, 64), num_digits=cfg.data.num_digits,
        sprites=np.load(bank),
    )
    vals = np.unique(np.asarray(gen(jax.random.PRNGKey(0))))
    # 0.5 -> 127; two overlapping 0.5 sprites clip to 1.0 -> 255.
    assert set(vals.tolist()) <= {0, 127, 255}, vals


def test_eval_batches_staged_on_device_once(monkeypatch):
    """run_eval stages the (deterministic, run-constant) val batches on
    device ONCE and reuses them: re-uploading identical bytes every eval
    dominated eval wall time on the tunneled dev chip (r11 200k run: ~34 s
    per eval interval, ~90% host->device transfer of unchanged data)."""
    from mmvae_tpu.data.loader import MovingMNIST
    from mmvae_tpu.train.loop import fit

    calls = {"n": 0}
    orig = MovingMNIST.batches

    def counting_batches(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(MovingMNIST, "batches", counting_batches)

    cfg = _tiny_config("seq_vae")
    cfg.data.device_resident = True  # the train path never calls batches()
    cfg.train.steps = 20
    cfg.train.log_every = 5
    cfg.train.eval_every = 5  # four eval passes
    _, history = fit(cfg)
    evals = [h for h in history if "val_loss" in h]
    assert len(evals) >= 3, [sorted(h) for h in history]
    assert all(np.isfinite(h["val_loss"]) for h in evals)
    # One materialization of the val stream despite >= 3 eval passes.
    assert calls["n"] == 1, f"val stream rebuilt {calls['n']}x"
    # The eval passes see evolving params (not a cached metric).
    assert len({round(h["val_loss"], 4) for h in evals}) > 1


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


def test_standalone_evaluate_from_checkpoint(tmp_path, capsys):
    """`mmvae eval` — the reference's test(epoch) as a standalone pass: val
    ELBO from a checkpoint must be finite, better than an untrained model's,
    and the CLI must emit it as one JSON line."""
    import json

    from mmvae_tpu import cli
    from mmvae_tpu.train.loop import evaluate, fit

    cfg = _tiny_config("mlp_vae")
    cfg.train.steps = 30
    cfg.train.checkpoint_every = 30
    cfg.train.checkpoint_dir = str(tmp_path / "ck")
    fit(cfg)

    trained = evaluate(cfg, cfg.train.checkpoint_dir)
    assert trained["step"] == 30
    # Full-coverage contract (VERDICT r2 weak-3): every held-out sample is
    # scored exactly once, including the short tail batch.  val split = 4
    # clips x 20 frames = 80 frames; batch 32 -> 2 full + 1 tail of 16.
    n_val = cfg.data.num_sequences - int(
        cfg.data.num_sequences * cfg.data.train_fraction
    )
    avail = n_val * cfg.data.seq_len  # per-frame config
    assert trained["samples"] == avail
    assert trained["batches"] == -(-avail // cfg.data.batch_size)
    assert avail % cfg.data.batch_size != 0, "fixture must exercise the tail"
    assert np.isfinite(trained["val_loss"])
    # Walking the tiny val split twice with the same seed is deterministic.
    again = evaluate(cfg, cfg.train.checkpoint_dir)
    assert again == trained

    # A missing/typo'd checkpoint dir must raise, not score init params
    # (and must not create the directory as a side effect).
    missing = tmp_path / "nonexistent"
    with pytest.raises(FileNotFoundError):
        evaluate(cfg, str(missing))
    assert not missing.exists()

    # Untrained comparison goes through the explicit params= escape hatch.
    from mmvae_tpu.train.loop import _sample_shape, build_model
    from mmvae_tpu.train.state import create_train_state

    model = build_model(cfg)
    init = create_train_state(
        model, cfg.optim, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    untrained = evaluate(cfg, params=init.params)
    assert untrained["step"] == -1
    assert trained["val_loss"] < untrained["val_loss"]

    argv = ["eval", "--config", "mlp_vae", "--ckpt", cfg.train.checkpoint_dir]
    for ov in TINY_OVERRIDES["mlp_vae"] + SMALL_MODEL:
        argv += ["--set", ov]
    assert cli.main(argv) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["step"] == 30 and np.isfinite(out["val_loss"])

    # CLI with a bad --ckpt: nonzero exit, no JSON on stdout (ADVICE r2).
    argv_bad = ["eval", "--config", "mlp_vae", "--ckpt", str(missing)]
    for ov in TINY_OVERRIDES["mlp_vae"] + SMALL_MODEL:
        argv_bad += ["--set", ov]
    assert cli.main(argv_bad) == 2
    captured = capsys.readouterr()
    assert captured.out.strip() == ""
    assert "error" in captured.err


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


def test_steps_per_call_chunk_matches_sequential():
    """chunk_steps(step, K) must be step-for-step identical to K sequential
    dispatches: seeds derive from the in-graph step counter and the resident
    gather is in-graph, so chunking only changes dispatch granularity."""
    import jax.numpy as jnp

    from mmvae_tpu.data import transforms
    from mmvae_tpu.train.loop import (
        build_model, chunk_steps, make_train_step, _sample_shape,
    )
    from mmvae_tpu.train.state import create_train_state

    cfg = _tiny_config("mlp_vae")
    model = build_model(cfg)
    state0 = create_train_state(
        model, cfg.optim, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    data = transforms.pack_resident(
        np.random.default_rng(0).integers(
            0, 256, (10, 4, 64, 64), dtype=np.uint8
        ),
        per_frame=True,
    )
    data = jnp.asarray(data)
    step = make_train_step(
        model,
        binarize=cfg.data.binarize,
        use_pallas=False,
        resident_batch=8,
        resident_shape=(64, 64),
        per_frame=True,
    )
    seq_step = jax.jit(step)
    s_seq = state0
    seq_metrics = []
    for _ in range(6):
        s_seq, m = seq_step(s_seq, data)
        seq_metrics.append(float(np.asarray(m["loss"])))

    chunked = jax.jit(chunk_steps(step, 3))
    s_chunk = state0
    chunk_metrics = []
    for _ in range(2):
        s_chunk, ms = chunked(s_chunk, data)
        chunk_metrics.extend(np.asarray(ms["loss"]).tolist())

    assert int(np.asarray(s_chunk.step)) == 6
    np.testing.assert_allclose(chunk_metrics, seq_metrics, rtol=2e-6)
    for a, b in zip(
        jax.tree.leaves(s_chunk.params), jax.tree.leaves(s_seq.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7
        )


def test_fit_steps_per_call():
    """fit() with train.steps_per_call > 1 trains the same number of steps
    with 1/K dispatches; metrics/logging land on the same cadence boundaries."""
    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.data.device_resident = True
    cfg.train.steps = 30
    cfg.train.log_every = 10
    cfg.train.steps_per_call = 5
    state, history = fit(cfg)
    assert int(np.asarray(state.step)) == 30
    losses = [h["loss"] for h in history]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert [h["step"] for h in history] == [10, 20, 30]


def test_steps_per_call_validation():
    import pytest as _pytest

    from mmvae_tpu.train.loop import fit

    cfg = _tiny_config("mlp_vae")
    cfg.data.device_resident = False  # streaming: unsupported
    cfg.train.steps_per_call = 2
    cfg.train.steps = 4
    with _pytest.raises(ValueError, match="device-resident"):
        fit(cfg)

    cfg = _tiny_config("mlp_vae")
    cfg.data.device_resident = True
    cfg.train.steps_per_call = 4
    cfg.train.steps = 10  # not a multiple of 4
    with _pytest.raises(ValueError, match="multiple of"):
        fit(cfg)


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
