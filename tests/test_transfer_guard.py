"""Steady-state transfer-guard lock (round-1 verdict item 4).

Round 1's single biggest perf win was removing per-step host<->device syncs
(5.7x, device-resident data path).  These tests lock that in: N post-warmup
resident-mode train steps must run under `jax.transfer_guard('disallow')`
without raising — i.e. the hot loop performs zero implicit transfers.  A
negative control proves the guard actually bites.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_train_smoke import _tiny_config


def _resident_step_and_data():
    from mmvae_tpu.data.transforms import pack_resident
    from mmvae_tpu.train.loop import build_model, make_train_step, _sample_shape
    from mmvae_tpu.train.state import create_train_state

    cfg = _tiny_config("mlp_vae")
    model = build_model(cfg)
    state = create_train_state(
        model, cfg.optim, jax.random.PRNGKey(0), _sample_shape(cfg)
    )
    step = jax.jit(
        make_train_step(
            model, binarize=True, resident_batch=8,
            resident_shape=(64, 64), per_frame=True,
        ),
        donate_argnums=(0,),
    )
    data = pack_resident(
        np.random.default_rng(0).integers(0, 256, (32, 4, 64, 64), np.uint8),
        per_frame=True,
    )
    data_dev = jax.device_put(data)  # explicit: the one allowed upload
    return step, state, data_dev


class TestSteadyStateNoImplicitTransfers:
    def test_resident_steps_under_disallow_guard(self):
        step, state, data_dev = _resident_step_and_data()
        state, metrics = step(state, data_dev)  # warmup/compile outside guard
        with jax.transfer_guard("disallow"):
            for _ in range(4):
                state, metrics = step(state, data_dev)
        assert np.isfinite(float(np.asarray(metrics["loss"])))

    def test_guard_bites_on_implicit_host_batch(self):
        step, state, data_dev = _resident_step_and_data()
        state, _ = step(state, data_dev)
        host_batch = np.zeros(data_dev.shape, np.int32)
        with jax.transfer_guard("disallow"):
            with pytest.raises(Exception, match="[Dd]isallow"):
                step(state, host_batch)  # implicit h2d must raise

    def test_fit_with_transfer_guard_flag(self):
        from mmvae_tpu.train.loop import fit

        cfg = _tiny_config("mlp_vae")
        cfg.data.device_resident = True
        cfg.train.transfer_guard = True
        cfg.train.steps = 12
        cfg.train.log_every = 4
        _, history = fit(cfg)
        assert history and np.isfinite(history[-1]["loss"])
