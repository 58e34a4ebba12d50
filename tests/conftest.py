"""Test harness: force an 8-fake-device CPU backend BEFORE jax initializes.

SURVEY.md 4.2 "Distributed without a cluster": the dev box has one TPU chip, so
DP/shard_map tests run on 8 virtual CPU devices via
``--xla_force_host_platform_device_count=8``.  Pallas kernels automatically run
in interpret mode off-TPU (see ops/elbo_pallas._interpret_default).

Set MMVAE_TEST_TPU=1 to run the suite on the real TPU instead (single chip;
DP tests then skip if fewer than 2 devices).
"""

import os

if os.environ.get("MMVAE_TEST_TPU"):
    # On-chip suite: persistent XLA compile cache (same location as the CLI,
    # mmvae_tpu/cli.py) — the suite's dozens of small train-step compiles
    # dominate its wall time on the tunneled dev chip; a warm cache cuts
    # repeat runs dramatically.
    _cache = os.path.expanduser("~/.cache/mmvae_tpu/xla_cache")
    try:
        os.makedirs(_cache, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # The axon TPU plugin overrides the JAX_PLATFORMS env var via its
    # sitecustomize hook; the programmatic config wins over that.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped and pinned: a session-scoped generator makes each test's
    # data depend on which tests ran before it, so tight f32 tolerances pass
    # or fail based on subset/ordering (reproduced: test_elbo's big1-small1
    # case at rtol=1e-6 flips when run after test_data).  Fresh per test ==
    # order-independent.
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_dataset():
    """Small synthetic Moving MNIST: 64 sequences of 8 frames."""
    from mmvae_tpu.data import generate_moving_mnist

    return generate_moving_mnist(64, seq_len=8, seed=0)
