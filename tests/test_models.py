"""Model-layer tests: shapes, gradient step decreases loss, scan correctness.

SURVEY.md 4.2 "Unit: models".  Small widths keep the 1-core CPU harness fast.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmvae_tpu.models import MODEL_REGISTRY
from mmvae_tpu.models.convlstm import ConvLSTMCell
from mmvae_tpu.models.hier_vae import gaussian_kl

TINY = {
    "mlp_vae": ({"latent_dim": 8, "hidden_dim": 32}, (4, 64, 64)),
    "conv_vae": ({"latent_dim": 8, "channels": (4, 8, 8, 8)}, (4, 64, 64)),
    "seq_vae": (
        {"latent_dim": 8, "enc_channels": (4, 8), "lstm_features": 8},
        (2, 6, 64, 64),
    ),
    "pred_vae": (
        {"latent_dim": 8, "enc_channels": (4, 8), "lstm_features": 8, "context_len": 3},
        (2, 6, 64, 64),
    ),
    "hier_vae": (
        {
            "global_latent": 8,
            "chunk_latent": 4,
            "chunk_len": 3,
            "enc_channels": (4, 8),
            "lstm_features": 8,
            "chunk_feature": 16,
        },
        (2, 6, 64, 64),
    ),
}


def _sample_fn(key):
    def fn(mu, logvar, salt=0):
        k = jax.random.fold_in(key, salt)
        return mu + jnp.exp(0.5 * logvar) * jax.random.normal(k, mu.shape)

    return fn


def _x(shape, seed=0):
    return jnp.asarray(
        (np.random.default_rng(seed).uniform(size=shape) < 0.3).astype(np.float32)
    )


@pytest.fixture(scope="module")
def inits():
    """Init each tiny model once per module."""
    out = {}
    key = jax.random.key(0)
    for name, (kw, shape) in TINY.items():
        model = MODEL_REGISTRY[name](**kw)
        params = model.init(key, _x(shape), _sample_fn(key))
        out[name] = (model, params, shape)
    return out


@pytest.mark.parametrize("name", list(TINY))
class TestForward:
    def test_shapes(self, inits, name):
        model, params, shape = inits[name]
        out = model.apply(params, _x(shape), _sample_fn(jax.random.key(1)))
        assert out.logits.shape == out.target.shape
        assert out.mu.shape == out.logvar.shape == out.z.shape
        assert out.mu.ndim == 2
        assert np.isfinite(np.asarray(out.logits)).all()
        if name == "pred_vae":
            # prediction model scores only the future slice
            assert out.target.shape[1] == shape[1] - TINY[name][0]["context_len"]
        else:
            assert out.target.shape == _x(shape).shape

    def test_one_gradient_step_decreases_loss(self, inits, name):
        import optax

        from mmvae_tpu.ops.elbo_ref import elbo_parts_ref

        model, params, shape = inits[name]
        x = _x(shape)
        sfn = _sample_fn(jax.random.key(2))

        def loss_fn(p):
            out = model.apply(p, x, sfn)
            bce, kl = elbo_parts_ref(out.logits, out.target, out.mu, out.logvar)
            return (bce + kl + out.extra_kl) / out.mu.shape[0]

        tx = optax.adam(1e-3)
        opt = tx.init(params)
        l0, g = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(g, opt, params)
        p1 = optax.apply_updates(params, upd)
        l1 = loss_fn(p1)
        assert float(l1) < float(l0)

    def test_deterministic_given_rng(self, inits, name):
        model, params, shape = inits[name]
        x = _x(shape)
        o1 = model.apply(params, x, _sample_fn(jax.random.key(3)))
        o2 = model.apply(params, x, _sample_fn(jax.random.key(3)))
        assert jnp.array_equal(o1.logits, o2.logits)


class TestConvLSTM:
    def test_scan_equals_python_loop(self):
        """nn.scan over time must equal stepping the cell manually."""
        from mmvae_tpu.models.convlstm import scan_convlstm

        key = jax.random.key(0)
        b, t, h, w, cin, f = 2, 5, 8, 8, 3, 4
        xs = jnp.asarray(np.random.default_rng(0).normal(size=(b, t, h, w, cin)), jnp.float32)

        cell = ConvLSTMCell(features=f)
        s0 = ConvLSTMCell.initial_state(b, h, w, f)
        cell_params = cell.init(key, s0, xs[:, 0])

        # manual loop
        s = s0
        outs = []
        for i in range(t):
            s, y = cell.apply(cell_params, s, xs[:, i])
            outs.append(y)
        manual = jnp.stack(outs, axis=1)

        from flax import linen as nn

        class Scanned(nn.Module):
            @nn.compact
            def __call__(self, s0, xs):
                lstm = scan_convlstm(ConvLSTMCell, f, name="cell")
                return lstm(s0, xs)

        scanned = Scanned()
        sp = scanned.init(key, s0, xs)
        # graft the same params in
        sp = {"params": {"cell": cell_params["params"]}}
        _, ys = scanned.apply(sp, s0, xs)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(manual), atol=1e-5)

    def test_hoisted_equals_concat_cell(self):
        """ConvLSTM (hoisted conv_x + conv_h) == concat-form cell when the
        concat kernel is split row-wise into [input; hidden] kernels."""
        from mmvae_tpu.models.convlstm import ConvLSTM

        key = jax.random.key(0)
        b, t, h, w, cin, f = 2, 4, 8, 8, 3, 4
        xs = jnp.asarray(
            np.random.default_rng(0).normal(size=(b, t, h, w, cin)), jnp.float32
        )
        s0 = ConvLSTMCell.initial_state(b, h, w, f)

        cell = ConvLSTMCell(features=f)
        cp = cell.init(key, s0, xs[:, 0])
        kernel = cp["params"]["gates"]["kernel"]  # (kh, kw, cin+f, 4f)
        bias = cp["params"]["gates"]["bias"]

        s = s0
        outs = []
        for i in range(t):
            s, y = cell.apply(cp, s, xs[:, i])
            outs.append(y)
        manual = jnp.stack(outs, axis=1)

        lstm = ConvLSTM(features=f)
        lp = lstm.init(key, s0, xs)
        lp = {
            "params": {
                "input": {"kernel": kernel[:, :, :cin, :], "bias": bias},
                "step": {"hidden": {"kernel": kernel[:, :, cin:, :]}},
            }
        }
        _, hs = lstm.apply(lp, s0, xs)
        np.testing.assert_allclose(np.asarray(hs), np.asarray(manual), atol=1e-5)

    def test_constant_token_fast_path(self):
        """(B,1,...) + length=T must equal explicitly tiled inputs."""
        from mmvae_tpu.models.convlstm import ConvLSTM

        key = jax.random.key(1)
        b, t, h, w, cin, f = 2, 5, 4, 4, 3, 4
        tok = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, 1, h, w, cin)), jnp.float32
        )
        s0 = ConvLSTMCell.initial_state(b, h, w, f)
        lstm = ConvLSTM(features=f)
        params = lstm.init(key, s0, tok, length=t)
        _, hs_fast = lstm.apply(params, s0, tok, length=t)
        tiled = jnp.broadcast_to(tok, (b, t, h, w, cin))
        _, hs_tiled = lstm.apply(params, s0, tiled)
        np.testing.assert_allclose(
            np.asarray(hs_fast), np.asarray(hs_tiled), atol=1e-6
        )

    def test_forget_gate_keeps_state(self):
        """With zero input and saturated forget gate, cell state persists."""
        b, h, w, f = 1, 4, 4, 2
        cell = ConvLSTMCell(features=f)
        key = jax.random.key(0)
        c0 = jnp.ones((b, h, w, f))
        h0 = jnp.zeros((b, h, w, f))
        x = jnp.zeros((b, h, w, 1))
        params = cell.init(key, (c0, h0), x)
        (c1, _), _ = cell.apply(params, (c0, h0), x)
        # forget bias +1 => f ~ sigmoid(1) ~ 0.73 with zero weights at init
        assert float(jnp.abs(c1).mean()) > 0.3


class TestHierSpecifics:
    def test_gaussian_kl_zero_when_equal(self):
        mu = jnp.ones((3, 4))
        lv = jnp.full((3, 4), -0.5)
        # 1e-4: TPU exp/log transcendentals differ from CPU in the last ulps
        assert abs(float(gaussian_kl(mu, lv, mu, lv))) < 1e-4

    def test_gaussian_kl_matches_standard_form(self, rng):
        """vs p = N(0, I) it must equal the classic VAE KL."""
        mu = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32))
        lv = jnp.asarray(rng.normal(size=(5, 6)).astype(np.float32) * 0.3)
        general = gaussian_kl(mu, lv, jnp.zeros_like(mu), jnp.zeros_like(lv))
        classic = -0.5 * jnp.sum(1 + lv - mu**2 - jnp.exp(lv))
        np.testing.assert_allclose(float(general), float(classic), rtol=1e-5)

    def test_generate(self, inits):
        model, params, shape = inits["hier_vae"]
        logits = model.apply(params, jax.random.key(0), 2, 2, method=model.generate)
        assert logits.shape == (2, 2 * model.chunk_len, 64, 64)
        assert np.isfinite(np.asarray(logits)).all()

    def test_extra_kl_nonnegative(self, inits):
        model, params, shape = inits["hier_vae"]
        out = model.apply(params, _x(shape), _sample_fn(jax.random.key(1)))
        assert float(out.extra_kl) >= 0.0


class TestDecoderModes:
    """ConvDecoder layout knob: all modes emit (N, 64, 64, 1) logits and
    train; "fast_hq" reproduces the round-2 half-res-mixing layout."""

    @pytest.mark.parametrize(
        "mode",
        ["fast", "fast_mid", "fast_midw", "fast_k4tail", "fast_hq", "transpose"],
    )
    def test_decoder_mode_shapes(self, mode):
        import jax
        import jax.numpy as jnp

        from mmvae_tpu.models.base import ConvDecoder

        m = ConvDecoder((16, 8, 4), upsample=mode)
        p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 16)))
        out = m.apply(p, jnp.zeros((2, 8, 8, 16)))
        assert out.shape == (2, 64, 64, 1)
        assert out.dtype == jnp.float32

    def test_seq_vae_token_ch_kwarg(self):
        """token_ch widens the decoder z-token (r5 architecture-probe knob);
        default 16 keeps the historical param tree."""
        import jax
        import jax.numpy as jnp

        from mmvae_tpu.models.seq_vae import ConvLSTMSeqVAE

        m = ConvLSTMSeqVAE(
            latent_dim=8, enc_channels=(4, 8), lstm_features=8,
            token_ch=64, fused=False,
        )
        x = jnp.zeros((2, 3, 64, 64))
        p = m.init(jax.random.PRNGKey(0), x, lambda mu, lv, salt=0: mu)
        tok_kernel = p["params"]["z_to_token"]["kernel"]
        assert tok_kernel.shape == (8, 16 * 16 * 64)
        out = m.apply(p, x, lambda mu, lv, salt=0: mu)
        assert out.logits.shape == (2, 3, 64, 64)
        default = ConvLSTMSeqVAE(
            latent_dim=8, enc_channels=(4, 8), lstm_features=8, fused=False
        )
        pd = default.init(jax.random.PRNGKey(0), x, lambda mu, lv, salt=0: mu)
        assert pd["params"]["z_to_token"]["kernel"].shape == (8, 16 * 16 * 16)

    def test_seq_vae_dec_upsample_kwarg(self):
        import jax
        import jax.numpy as jnp

        from mmvae_tpu.models.seq_vae import ConvLSTMSeqVAE

        m = ConvLSTMSeqVAE(
            latent_dim=8, enc_channels=(4, 8), lstm_features=8,
            dec_upsample="fast_hq", fused=False,
        )
        x = jnp.zeros((2, 3, 64, 64))
        p = m.init(jax.random.PRNGKey(0), x, lambda mu, lv, salt=0: mu)
        out = m.apply(p, x, lambda mu, lv, salt=0: mu)
        assert out.logits.shape == (2, 3, 64, 64)


def test_fast_upsample_vjp():
    """Upsample2x2 (reverse-free VJP) == nn.ConvTranspose((2,2),s=(2,2)):
    identical param tree, forward, and gradients (to f32 accumulation)."""
    import numpy as np
    from flax import linen as nn
    from mmvae_tpu.models.base import Upsample2x2

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)), jnp.float32)
    ref = nn.ConvTranspose(24, (2, 2), strides=(2, 2))
    new = Upsample2x2(24)
    p = ref.init(jax.random.PRNGKey(0), x)
    p2 = new.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p) == jax.tree.structure(p2)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.testing.assert_allclose(
        new.apply(p, x), ref.apply(p, x), rtol=1e-6, atol=1e-6
    )

    def loss(mod):
        return lambda p, x: jnp.sum(jnp.sin(mod.apply(p, x)))

    g_ref = jax.grad(loss(ref), argnums=(0, 1))(p, x)
    g_new = jax.grad(loss(new), argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
        )
