"""Pallas fused ELBO kernels vs the XLA oracle (forward AND gradients).

SURVEY.md 4.2 "Unit: ops".  On CPU the kernels run in interpret mode; the same
tests pass on the real TPU with MMVAE_TEST_TPU=1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.ops import (
    elbo_parts_ref,
    elbo_reduce_pallas,
    reparameterize_pallas,
    reparameterize_ref,
)
from mmvae_tpu.ops.dispatch import elbo_parts, reparameterize


def _rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


SHAPES = [
    ((4, 64, 64), (4, 20)),          # per-frame MLP VAE
    ((2, 8, 64, 64), (2, 64)),       # sequence VAE
    ((3, 17), (3, 5)),               # deliberately unaligned
    ((1, 4096), (1, 128)),
]


class TestElboReduce:
    @pytest.mark.parametrize("big,small", SHAPES)
    def test_forward_matches_oracle(self, rng, big, small):
        logits = _rand(rng, big, 2.0)
        x = jnp.asarray((rng.uniform(size=big) < 0.4).astype(np.float32))
        mu = _rand(rng, small)
        lv = _rand(rng, small, 0.5)
        b_ref, k_ref = elbo_parts_ref(logits, x, mu, lv)
        b_p, k_p = jax.jit(elbo_reduce_pallas)(logits, x, mu, lv)
        # The BCE is an f32 sum of up to ~131k O(1) terms; kernel and oracle
        # accumulate in different orders, so the defensible tolerance is
        # ~sqrt(N)*eps_f32 ~= 4e-5 relative worst-case — 5e-6 observed-max.
        np.testing.assert_allclose(float(b_p), float(b_ref), rtol=5e-6)
        np.testing.assert_allclose(float(k_p), float(k_ref), rtol=1e-5)

    @pytest.mark.parametrize("big,small", SHAPES[:2])
    def test_grads_match_oracle(self, rng, big, small):
        logits = _rand(rng, big, 2.0)
        x = jnp.asarray((rng.uniform(size=big) < 0.4).astype(np.float32))
        mu = _rand(rng, small)
        lv = _rand(rng, small, 0.5)

        def lp(l, m, v):
            b, k = elbo_reduce_pallas(l, x, m, v)
            return b + 0.7 * k

        def lr(l, m, v):
            b, k = elbo_parts_ref(l, x, m, v)
            return b + 0.7 * k

        gp = jax.jit(jax.grad(lp, argnums=(0, 1, 2)))(logits, mu, lv)
        gr = jax.jit(jax.grad(lr, argnums=(0, 1, 2)))(logits, mu, lv)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_extreme_logits_stable(self, rng):
        """BCE-from-logits must not overflow at |logits| = 80."""
        logits = jnp.asarray(np.array([[80.0, -80.0, 0.0, 35.0]], np.float32))
        x = jnp.asarray(np.array([[1.0, 0.0, 1.0, 0.0]], np.float32))
        mu = jnp.zeros((1, 4))
        lv = jnp.zeros((1, 4))
        b, k = jax.jit(elbo_reduce_pallas)(logits, x, mu, lv)
        b_ref, _ = elbo_parts_ref(logits, x, mu, lv)
        assert np.isfinite(float(b))
        np.testing.assert_allclose(float(b), float(b_ref), rtol=1e-6)

    def test_kl_zero_at_standard_normal(self):
        mu = jnp.zeros((8, 16))
        lv = jnp.zeros((8, 16))
        _, k = jax.jit(elbo_reduce_pallas)(jnp.zeros((8, 4)), jnp.zeros((8, 4)), mu, lv)
        assert abs(float(k)) < 1e-5

    def test_dispatch_matches(self, rng):
        logits = _rand(rng, (2, 8, 8))
        x = jnp.asarray((rng.uniform(size=(2, 8, 8)) < 0.5).astype(np.float32))
        mu, lv = _rand(rng, (2, 4)), _rand(rng, (2, 4))
        b1, k1 = elbo_parts(logits, x, mu, lv, use_pallas=True)
        b2, k2 = elbo_parts(logits, x, mu, lv, use_pallas=False)
        np.testing.assert_allclose(float(b1), float(b2), rtol=1e-6)
        np.testing.assert_allclose(float(k1), float(k2), rtol=1e-5)


class TestReparameterize:
    def test_moments(self):
        z = jax.jit(reparameterize_pallas)(
            jnp.zeros((512, 128)), jnp.zeros((512, 128)), jnp.int32(7)
        )
        zn = np.asarray(z)
        assert abs(zn.mean()) < 0.02
        assert abs(zn.std() - 1.0) < 0.02
        assert abs((zn**4).mean() - 3.0) < 0.15  # normal kurtosis

    def test_mean_scale_applied(self, rng):
        mu = jnp.full((256, 128), 5.0)
        lv = jnp.full((256, 128), jnp.log(0.25))  # sigma = 0.5
        z = jax.jit(reparameterize_pallas)(mu, lv, jnp.int32(3))
        zn = np.asarray(z)
        assert abs(zn.mean() - 5.0) < 0.02
        assert abs(zn.std() - 0.5) < 0.02

    def test_deterministic_per_seed(self, rng):
        mu, lv = _rand(rng, (4, 8)), _rand(rng, (4, 8), 0.3)
        f = jax.jit(lambda m, v, s: reparameterize_pallas(m, v, s))
        a = f(mu, lv, jnp.int32(1))
        b = f(mu, lv, jnp.int32(1))
        c = f(mu, lv, jnp.int32(2))
        assert jnp.array_equal(a, b)
        assert not jnp.array_equal(a, c)

    def test_vjp_analytic(self, rng):
        mu, lv = _rand(rng, (6, 10)), _rand(rng, (6, 10), 0.3)

        def f(m, v):
            return jnp.sum(reparameterize_pallas(m, v, jnp.int32(3)) ** 2)

        dmu, dlv = jax.jit(jax.grad(f, argnums=(0, 1)))(mu, lv)
        z = jax.jit(lambda m, v: reparameterize_pallas(m, v, jnp.int32(3)))(mu, lv)
        np.testing.assert_allclose(np.asarray(dmu), np.asarray(2 * z), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dlv), np.asarray(z * (z - mu)), atol=1e-5
        )

    def test_dispatch_ref_path(self, rng):
        mu, lv = _rand(rng, (4, 8)), _rand(rng, (4, 8), 0.3)
        z = reparameterize(jax.random.key(0), mu, lv, use_pallas=False)
        z2 = reparameterize_ref(jax.random.key(0), mu, lv)
        assert jnp.array_equal(z, z2)
