"""Fused Pallas ConvLSTM time-scan kernel == lax.scan ConvLSTM (fwd + grads).

The fused path (ops/convlstm_pallas.py) must be a drop-in replacement for the
scanned hidden recurrence: identical param tree, identical numerics (to f32
accumulation-order tolerance), identical VJP — including the time-constant
decoder input path and the initial-state gradient the decoder relies on.
Runs in interpret mode off-TPU, compiled on the real chip (MMVAE_TEST_TPU=1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmvae_tpu.models.convlstm import ConvLSTM, ConvLSTMCell

B, T, HW_SIDE, F, CIN = 2, 4, 4, 128, 16  # lane-aligned F for on-TPU runs

# On the real chip the scanned baseline's convs run on the MXU; force full
# f32 precision so the comparison isolates the kernel's math, and keep a
# small extra allowance for the remaining accumulation-order differences
# (the kernel sums 9 shifted matmuls; XLA's conv reduces in its own order).
_ON_TPU = bool(os.environ.get("MMVAE_TEST_TPU"))
_GRAD_TOL = 1e-3 if _ON_TPU else 2e-4


@pytest.fixture(autouse=True)
def _full_precision_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


def _make_pair(fused_kwargs=None, **kwargs):
    # Pin both flags explicitly: the default is auto (fused on TPU), which
    # would silently compare the fused path against itself on the real chip.
    scanned = ConvLSTM(features=F, fused=False, **kwargs)
    fused = ConvLSTM(features=F, fused=True, **(fused_kwargs or kwargs))
    return scanned, fused


def _init(module, xs, length=None):
    state0 = ConvLSTMCell.initial_state(B, HW_SIDE, HW_SIDE, F)
    params = module.init(jax.random.PRNGKey(0), state0, xs, length=length)
    return state0, params


class TestFusedConvLSTM:
    def setup_method(self):
        rng = np.random.default_rng(42)
        self.xs = jnp.asarray(
            rng.normal(size=(B, T, HW_SIDE, HW_SIDE, CIN)), jnp.float32
        )
        self.token = jnp.asarray(
            rng.normal(size=(B, 1, HW_SIDE, HW_SIDE, CIN)), jnp.float32
        )
        rng2 = np.random.default_rng(7)
        self.c0 = jnp.asarray(
            rng2.normal(size=(B, HW_SIDE, HW_SIDE, F)) * 0.5, jnp.float32
        )
        self.h0 = jnp.asarray(
            rng2.normal(size=(B, HW_SIDE, HW_SIDE, F)) * 0.5, jnp.float32
        )

    def test_param_trees_identical(self):
        scanned, fused = _make_pair()
        _, p_s = _init(scanned, self.xs)
        _, p_f = _init(fused, self.xs)
        flat_s = jax.tree_util.tree_map(jnp.shape, p_s)
        flat_f = jax.tree_util.tree_map(jnp.shape, p_f)
        assert flat_s == flat_f  # same paths, same shapes -> ckpt-compatible

    def test_forward_matches_scan(self):
        scanned, fused = _make_pair()
        state0, params = _init(scanned, self.xs)
        state0 = (self.c0, self.h0)
        (c_s, h_s), hs_s = scanned.apply(params, state0, self.xs)
        (c_f, h_f), hs_f = fused.apply(params, state0, self.xs)
        np.testing.assert_allclose(hs_f, hs_s, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(c_f, c_s, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(h_f, h_s, rtol=2e-5, atol=2e-5)

    def test_forward_const_input(self):
        """Decoder path: (B, 1, ...) token + length=T (single-shot conv_x)."""
        scanned, fused = _make_pair()
        state0, params = _init(scanned, self.token, length=T)
        state0 = (self.c0, self.h0)
        (c_s, h_s), hs_s = scanned.apply(params, state0, self.token, length=T)
        (c_f, h_f), hs_f = fused.apply(params, state0, self.token, length=T)
        np.testing.assert_allclose(hs_f, hs_s, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(c_f, c_s, rtol=2e-5, atol=2e-5)

    def _loss(self, module, weights):
        """Scalar probe touching every output: hs (all steps) + final state."""
        w_hs, w_c, w_h = weights

        def loss(params, state0, xs, length=None):
            (c_t, h_t), hs = module.apply(params, state0, xs, length=length)
            return (
                jnp.sum(hs.astype(jnp.float32) * w_hs)
                + jnp.sum(c_t.astype(jnp.float32) * w_c)
                + jnp.sum(h_t.astype(jnp.float32) * w_h)
            )

        return loss

    def _grad_check(self, xs, length=None, rtol=_GRAD_TOL, atol=_GRAD_TOL):
        scanned, fused = _make_pair()
        _, params = _init(scanned, xs, length=length)
        state0 = (self.c0, self.h0)
        rng = np.random.default_rng(3)
        t_out = length or xs.shape[1]
        weights = (
            jnp.asarray(rng.normal(size=(B, t_out, HW_SIDE, HW_SIDE, F)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, HW_SIDE, HW_SIDE, F)), jnp.float32),
            jnp.asarray(rng.normal(size=(B, HW_SIDE, HW_SIDE, F)), jnp.float32),
        )
        grad_s = jax.grad(self._loss(scanned, weights), argnums=(0, 1, 2))(
            params, state0, xs, length
        )
        grad_f = jax.grad(self._loss(fused, weights), argnums=(0, 1, 2))(
            params, state0, xs, length
        )
        flat_s, tdef_s = jax.tree_util.tree_flatten(grad_s)
        flat_f, tdef_f = jax.tree_util.tree_flatten(grad_f)
        assert tdef_s == tdef_f
        for a, b in zip(flat_s, flat_f):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=rtol, atol=atol * scale
            )

    def test_grads_match_scan(self):
        """Full VJP parity: params (input conv + hidden kernel), initial
        state (the decoder's z->state path needs dc0/dh0), and xs."""
        self._grad_check(self.xs)

    def test_grads_const_input(self):
        self._grad_check(self.token, length=T)

    def test_grads_const_input_dxg_stream(self):
        """The streamed-dxg backward variant (measured-off knob,
        ops.convlstm_pallas._bwd_impl(dxg_stream=True)) computes the same
        VJP as the default VMEM-accumulator path."""
        import functools

        from mmvae_tpu.ops import convlstm_pallas as cp

        orig = cp._bwd_impl
        try:
            cp._bwd_impl = functools.partial(orig, dxg_stream=True)
            self._grad_check(self.token, length=T)
        finally:
            cp._bwd_impl = orig

    def test_seq_vae_fused_end_to_end(self):
        """Whole flagship model, fused vs scanned: same params, same loss,
        same param grads."""
        from mmvae_tpu.models.seq_vae import ConvLSTMSeqVAE

        kwargs = dict(latent_dim=16, enc_channels=(8, 16), lstm_features=F,
                      image_size=32)
        m_s = ConvLSTMSeqVAE(fused=False, **kwargs)
        m_f = ConvLSTMSeqVAE(fused=True, **kwargs)
        x = jnp.asarray(
            np.random.default_rng(0).random((B, 5, 32, 32)), jnp.float32
        )

        def sample_fn(mu, logvar, salt=0):
            return mu  # deterministic: isolates the recurrence numerics

        params = m_s.init(jax.random.PRNGKey(1), x, sample_fn)

        def loss(m):
            def f(p):
                out = m.apply(p, x, sample_fn)
                return (
                    jnp.sum(jax.nn.sigmoid(out.logits) ** 2)
                    + jnp.sum(out.mu**2)
                    + jnp.sum(out.logvar**2)
                )
            return f

        tol = 2e-3 if _ON_TPU else 5e-4
        l_s, g_s = jax.value_and_grad(loss(m_s))(params)
        l_f, g_f = jax.value_and_grad(loss(m_f))(params)
        np.testing.assert_allclose(float(l_f), float(l_s), rtol=tol)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_f)
        ):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=tol, atol=tol * scale
            )


@pytest.mark.parametrize("batch", [1, 2, 6])
def test_block_b_divisor_handles_odd_batches(batch):
    """_pick_block_b must tile any batch; kernel output matches scan."""
    xs = jnp.asarray(
        np.random.default_rng(batch).normal(
            size=(batch, 3, HW_SIDE, HW_SIDE, CIN)
        ),
        jnp.float32,
    )
    scanned = ConvLSTM(features=F, fused=False)
    fused = ConvLSTM(features=F, fused=True)
    state0 = ConvLSTMCell.initial_state(batch, HW_SIDE, HW_SIDE, F)
    params = scanned.init(jax.random.PRNGKey(0), state0, xs)
    (_, h_s), hs_s = scanned.apply(params, state0, xs)
    (_, h_f), hs_f = fused.apply(params, state0, xs)
    np.testing.assert_allclose(hs_f, hs_s, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("xk", [1, 3])
def test_x_kernel_fused_matches_scan(xk):
    """The input-projection kernel-size knob (x_kernel) must behave
    identically through the fused Pallas path and the lax.scan path."""
    rng = np.random.default_rng(5)
    xs = jnp.asarray(
        rng.normal(size=(2, 3, HW_SIDE, HW_SIDE, CIN)), jnp.float32
    )
    scanned = ConvLSTM(features=F, fused=False, x_kernel=(xk, xk))
    fused = ConvLSTM(features=F, fused=True, x_kernel=(xk, xk))
    state0 = ConvLSTMCell.initial_state(2, HW_SIDE, HW_SIDE, F)
    params = scanned.init(jax.random.PRNGKey(0), state0, xs)
    assert params["params"]["input"]["kernel"].shape == (xk, xk, CIN, 4 * F)
    (_, h_s), hs_s = scanned.apply(params, state0, xs)
    (_, h_f), hs_f = fused.apply(params, state0, xs)
    np.testing.assert_allclose(hs_f, hs_s, rtol=2e-5, atol=2e-5)


def test_gate_bf16_fused_matches_scan():
    """gate_dtype=bfloat16 now applies INSIDE the fused kernel (pointwise
    chain + cell-state scratch in bf16, accumulators f32) — fwd and grads
    must track the scanned bf16 path to bf16 tolerance."""
    rng = np.random.default_rng(9)
    xs = jnp.asarray(
        rng.normal(size=(2, 4, HW_SIDE, HW_SIDE, CIN)), jnp.float32
    )
    kw = dict(features=F, gate_dtype=jnp.bfloat16)
    scanned = ConvLSTM(fused=False, **kw)
    fused = ConvLSTM(fused=True, **kw)
    state0 = ConvLSTMCell.initial_state(2, HW_SIDE, HW_SIDE, F)
    params = scanned.init(jax.random.PRNGKey(0), state0, xs)
    (_, h_s), hs_s = scanned.apply(params, state0, xs)
    (_, h_f), hs_f = fused.apply(params, state0, xs)
    # bf16 has ~8 mantissa bits; both paths round at different points, so the
    # defensible bound is a few bf16 ulps of the O(1) activations.
    np.testing.assert_allclose(
        np.asarray(hs_f, np.float32), np.asarray(hs_s, np.float32),
        atol=0.05, rtol=0.05,
    )

    def loss(mod):
        def f(p):
            (c_t, h_t), hs = mod.apply(p, state0, xs)
            return jnp.sum(hs.astype(jnp.float32) ** 2)
        return f

    g_s = jax.grad(loss(scanned))(params)
    g_f = jax.grad(loss(fused))(params)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_f)):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            atol=0.08 * scale, rtol=0.08,
        )


def test_last_only_matches_scan():
    """need_hs=False (encoder terminal-state path): the fused last-only
    variant must match the scanned recurrence on (c_T, h_T), fwd and grads —
    including the input/param grads that flow through the whole BPTT chain."""
    rng = np.random.default_rng(11)
    xs = jnp.asarray(
        rng.normal(size=(2, 5, HW_SIDE, HW_SIDE, CIN)), jnp.float32
    )
    scanned = ConvLSTM(features=F, fused=False)
    fused = ConvLSTM(features=F, fused=True)
    state0 = ConvLSTMCell.initial_state(2, HW_SIDE, HW_SIDE, F)
    params = scanned.init(jax.random.PRNGKey(0), state0, xs)

    (c_s, h_s), _ = scanned.apply(params, state0, xs)
    (c_f, h_f), hs_none = fused.apply(params, state0, xs, need_hs=False)
    assert hs_none is None
    np.testing.assert_allclose(h_f, h_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(c_f, c_s, rtol=2e-5, atol=2e-5)

    def loss(mod, need):
        def f(p, xs):
            (c_t, h_t), _ = mod.apply(p, state0, xs, need_hs=need)
            return jnp.sum(h_t**2) + 0.5 * jnp.sum(c_t**2)
        return f

    g_s = jax.grad(loss(scanned, True), argnums=(0, 1))(params, xs)
    g_f = jax.grad(loss(fused, False), argnums=(0, 1))(params, xs)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=_GRAD_TOL, atol=_GRAD_TOL
        )


def test_proj_fused_matches_scan():
    """Encoder fast path (x_kernel=(1,1), need_hs=False, 128-multiple input
    channels): the in-kernel input projection must match the external
    projection + scanned recurrence, fwd and grads (params AND input)."""
    rng = np.random.default_rng(13)
    cin = 128
    xs = jnp.asarray(
        rng.normal(size=(2, 5, HW_SIDE, HW_SIDE, cin)), jnp.float32
    )
    kw = dict(features=F, x_kernel=(1, 1))
    scanned = ConvLSTM(fused=False, **kw)
    fused = ConvLSTM(fused=True, **kw)
    state0 = ConvLSTMCell.initial_state(2, HW_SIDE, HW_SIDE, F)
    params = scanned.init(jax.random.PRNGKey(0), state0, xs)
    # Same param tree: the proj-fused path declares input/kernel + input/bias
    # at the same paths as the external projection.
    p2 = fused.init(jax.random.PRNGKey(0), state0, xs, need_hs=False)
    assert jax.tree.structure(params) == jax.tree.structure(p2)

    (c_s, h_s), _ = scanned.apply(params, state0, xs)
    (c_f, h_f), hs_none = fused.apply(params, state0, xs, need_hs=False)
    assert hs_none is None
    np.testing.assert_allclose(h_f, h_s, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(c_f, c_s, rtol=2e-5, atol=2e-5)

    def loss(mod, need):
        def f(p, xs):
            (c_t, h_t), _ = mod.apply(p, state0, xs, need_hs=need)
            return jnp.sum(h_t**2) + 0.5 * jnp.sum(c_t**2)
        return f

    g_s = jax.grad(loss(scanned, True), argnums=(0, 1))(params, xs)
    g_f = jax.grad(loss(fused, False), argnums=(0, 1))(params, xs)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_f = jax.tree.leaves(g_f)
    for (path, a), b in zip(flat_s, flat_f):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=_GRAD_TOL, atol=_GRAD_TOL,
            err_msg=str(path),
        )
