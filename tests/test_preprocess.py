"""Fused Pallas normalize/binarize kernel (ops.preprocess_pallas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.data.transforms import normalize, pack_resident
from mmvae_tpu.ops.preprocess_pallas import (
    preprocess_packed_pallas,
    preprocess_pallas,
)


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

    def test_bf16_binarize_bitwise_matches_f32(self, rng):
        # {0,1} draws are exact in bf16: same seed => identical data, half
        # the HBM traffic.  (The train loop uses bf16 frames when the model
        # computes in bf16 — loop.make_loss_fn frame_dtype.)
        u8 = jnp.asarray(rng.integers(0, 256, (8, 64, 64), dtype=np.uint8))
        f32 = preprocess_pallas(u8, jnp.int32(5), binarize=True)
        bf16 = preprocess_pallas(
            u8, jnp.int32(5), binarize=True, out_dtype=jnp.bfloat16
        )
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32), np.asarray(bf16.astype(jnp.float32))
        )

    def test_bf16_normalize_rounds(self, rng):
        u8 = jnp.asarray(rng.integers(0, 256, (8, 64, 64), dtype=np.uint8))
        out = preprocess_pallas(
            u8, jnp.int32(0), binarize=False, out_dtype=jnp.bfloat16
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)),
            np.asarray(normalize(u8)),
            atol=1 / 255,  # bf16 has ~3 decimal digits; u8/255 rounds
        )


class TestPreprocessPackedPallas:
    """int32-packed variant: byte unpack fused into the kernel.

    On CPU these exercise the documented XLA fallback; with MMVAE_TEST_TPU=1
    they exercise the in-kernel lane unpack (repeat + lane-indexed shift) on
    the real chip — `test_normalize_matches_unpack` is then an EXACT check of
    the byte-order semantics against the bitcast path."""

    def _packed(self, rng, n=4, shape=(8, 64, 64)):
        u8 = rng.integers(0, 256, (n,) + shape, dtype=np.uint8)
        return jnp.asarray(pack_resident(u8)), jnp.asarray(u8), shape

    def test_normalize_matches_unpack(self, rng):
        packed, u8, shape = self._packed(rng)
        out = preprocess_packed_pallas(packed, jnp.int32(0), shape, binarize=False)
        assert out.shape == u8.shape
        np.testing.assert_array_equal(np.asarray(out), np.asarray(normalize(u8)))

    def test_binarize_distribution(self, rng):
        u8 = np.full((8, 4, 64, 64), 77, np.uint8)
        packed = jnp.asarray(pack_resident(u8))
        out = preprocess_packed_pallas(packed, jnp.int32(3), (4, 64, 64))
        vals = np.unique(np.asarray(out))
        assert set(vals) <= {0.0, 1.0}
        assert abs(float(out.mean()) - 77 / 255) < 0.02

    def test_binarize_extremes(self):
        u8 = np.concatenate(
            [np.zeros((1, 64, 64), np.uint8), np.full((1, 64, 64), 255, np.uint8)]
        )
        packed = jnp.asarray(pack_resident(u8[:, None]))
        out = preprocess_packed_pallas(packed, jnp.int32(1), (1, 64, 64))
        assert float(out[0].sum()) == 0.0
        assert float(out[1].mean()) == 1.0

    def test_seed_changes_draw(self):
        u8 = np.full((8, 1, 64, 64), 128, np.uint8)
        packed = jnp.asarray(pack_resident(u8))
        a = preprocess_packed_pallas(packed, jnp.int32(1), (1, 64, 64))
        b = preprocess_packed_pallas(packed, jnp.int32(1), (1, 64, 64))
        c = preprocess_packed_pallas(packed, jnp.int32(2), (1, 64, 64))
        assert jnp.array_equal(a, b)
        assert not jnp.array_equal(a, c)

    def test_bf16_binarize_bitwise_matches_f32(self, rng):
        packed, u8, shape = self._packed(rng)
        f32 = preprocess_packed_pallas(packed, jnp.int32(5), shape)
        bf16 = preprocess_packed_pallas(
            packed, jnp.int32(5), shape, out_dtype=jnp.bfloat16
        )
        assert bf16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32), np.asarray(bf16.astype(jnp.float32))
        )
