"""Fused Pallas normalize/binarize kernel (ops.preprocess_pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.data.transforms import normalize
from mmvae_tpu.ops.preprocess_pallas import preprocess_pallas


class TestPreprocessPallas:
    def test_normalize_matches_xla(self, rng):
        u8 = jnp.asarray(rng.integers(0, 256, (4, 8, 64, 64), dtype=np.uint8))
        out = preprocess_pallas(u8, jnp.int32(0), binarize=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(normalize(u8)), atol=1e-7
        )

    def test_binarize_distribution(self, rng):
        # On CPU this exercises the documented XLA fallback; with
        # MMVAE_TEST_TPU=1 it exercises the on-core-PRNG kernel.
        u8 = jnp.asarray(np.full((16, 64, 64), 77, np.uint8))
        out = preprocess_pallas(u8, jnp.int32(3), binarize=True)
        vals = np.unique(np.asarray(out))
        assert set(vals) <= {0.0, 1.0}
        assert abs(float(out.mean()) - 77 / 255) < 0.02

    def test_binarize_extremes(self):
        u8 = jnp.concatenate(
            [jnp.zeros((1, 64, 64), jnp.uint8), jnp.full((1, 64, 64), 255, jnp.uint8)]
        )
        out = preprocess_pallas(u8, jnp.int32(1), binarize=True)
        assert float(out[0].sum()) == 0.0
        assert float(out[1].mean()) == 1.0

    def test_seed_changes_draw(self, rng):
        u8 = jnp.asarray(np.full((8, 64, 64), 128, np.uint8))
        a = preprocess_pallas(u8, jnp.int32(1), binarize=True)
        b = preprocess_pallas(u8, jnp.int32(1), binarize=True)
        c = preprocess_pallas(u8, jnp.int32(2), binarize=True)
        assert jnp.array_equal(a, b)
        assert not jnp.array_equal(a, c)

    def test_indivisible_size_raises(self):
        with pytest.raises(ValueError):
            preprocess_pallas(jnp.zeros((3, 9), jnp.uint8), jnp.int32(0), binarize=False)
