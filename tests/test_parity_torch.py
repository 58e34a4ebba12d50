"""Cross-framework numerics oracle: JAX ops vs torch-CPU reference formulas.

SURVEY.md 4.2: the reference repo is unrecoverable (empty mount), so parity is
locked against torch 2.13-CPU implementing the canonical reference equations —
`F.binary_cross_entropy_with_logits(reduction='sum')`, the classic VAE KL, the
reparameterization, and a ConvLSTM cell step.  This pins the loss convention
to the one the reference's curves used (BCE sum + KL sum).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mmvae_tpu.ops import elbo_parts_ref  # noqa: E402
from mmvae_tpu.ops.elbo_pallas import elbo_reduce_pallas  # noqa: E402

# On the real chip (MMVAE_TEST_TPU=1) two platform effects need accounting:
# the MXU's default f32 matmul/conv path is reduced-precision (bf16 passes),
# and VPU transcendentals (exp/sigmoid/tanh) differ from libm in the last
# ulps.  The parity claim under test is *formula equivalence with torch*, a
# platform-independent statement — so force full-precision matmuls and widen
# elementwise tolerances by the transcendental delta only.
_ON_TPU = bool(os.environ.get("MMVAE_TEST_TPU"))
_EW_ATOL = 2e-5 if _ON_TPU else 1e-6  # elementwise (transcendental) tolerance
_CELL_ATOL = 5e-5 if _ON_TPU else 1e-5   # one conv + gate chain
_SCAN_ATOL = 1e-4 if _ON_TPU else 2e-5   # T-step recurrence accumulation
_CURVE_RTOL = 5e-3 if _ON_TPU else 2e-3  # 25-step Adam loss curve


@pytest.fixture(autouse=True)
def _full_precision_matmuls():
    with jax.default_matmul_precision("highest"):
        yield


class TestELBOvsTorch:
    @pytest.mark.parametrize("shape", [(4, 64, 64), (2, 20, 64, 64)])
    def test_bce_kl_forward(self, shape):
        # Local generator: the shared session `rng` fixture's draw sequence
        # depends on which tests ran before, and this check's 2e-6 rtol is
        # tight enough that ordering changed the verdict (f32 sum of ~5M
        # terms).  A pinned stream makes it order-independent.
        rng = np.random.default_rng(11)
        logits = rng.normal(size=shape).astype(np.float32) * 2
        x = (rng.uniform(size=shape) < 0.4).astype(np.float32)
        mu = rng.normal(size=(shape[0], 16)).astype(np.float32)
        logvar = (rng.normal(size=(shape[0], 16)) * 0.4).astype(np.float32)

        # torch reference formulas (SURVEY.md 2.1 "ELBO loss")
        t_bce = F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(x), reduction="sum"
        ).item()
        t_mu, t_lv = torch.from_numpy(mu), torch.from_numpy(logvar)
        t_kl = (-0.5 * torch.sum(1 + t_lv - t_mu.pow(2) - t_lv.exp())).item()

        for impl in (elbo_parts_ref, elbo_reduce_pallas):
            b, k = impl(
                jnp.asarray(logits), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar)
            )
            np.testing.assert_allclose(float(b), t_bce, rtol=2e-6)
            np.testing.assert_allclose(float(k), t_kl, rtol=2e-5)

    def test_bce_grad(self, rng):
        shape = (3, 32, 32)
        logits = rng.normal(size=shape).astype(np.float32)
        x = (rng.uniform(size=shape) < 0.5).astype(np.float32)

        tl = torch.from_numpy(logits.copy()).requires_grad_(True)
        F.binary_cross_entropy_with_logits(
            tl, torch.from_numpy(x), reduction="sum"
        ).backward()
        t_grad = tl.grad.numpy()

        j_grad = jax.grad(
            lambda l: elbo_parts_ref(l, jnp.asarray(x), jnp.zeros((3, 2)), jnp.zeros((3, 2)))[0]
        )(jnp.asarray(logits))
        np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=_EW_ATOL)

    def test_reparameterize_formula(self, rng):
        """Same eps => same z in both frameworks (z = mu + exp(0.5 lv) * eps)."""
        mu = rng.normal(size=(4, 8)).astype(np.float32)
        lv = (rng.normal(size=(4, 8)) * 0.3).astype(np.float32)
        eps = rng.normal(size=(4, 8)).astype(np.float32)

        t_z = (
            torch.from_numpy(mu)
            + torch.exp(0.5 * torch.from_numpy(lv)) * torch.from_numpy(eps)
        ).numpy()
        j_z = jnp.asarray(mu) + jnp.exp(0.5 * jnp.asarray(lv)) * jnp.asarray(eps)
        np.testing.assert_allclose(np.asarray(j_z), t_z, atol=_EW_ATOL)


class TestTrainingCurveParity:
    """End-to-end curve parity: the SAME MLP VAE trained in JAX/optax and in
    torch (reference formulas + torch.optim.Adam) from identical weights, on
    identical data, with identical eps draws, must produce matching loss
    curves.  This is the operational meaning of 'ELBO parity vs reference'
    (SURVEY.md section 6): the reference code is unrecoverable, so torch-CPU
    implementing the canonical equations stands in for it.
    """

    def test_mlp_vae_loss_curve_matches(self, rng):
        import optax

        from mmvae_tpu.models import MLPVAE
        from mmvae_tpu.ops.elbo_ref import elbo_parts_ref

        B, H, L, D, steps = 16, 32, 8, 4096, 25
        lr = 1e-3

        x_np = (rng.uniform(size=(steps, B, 64, 64)) < 0.4).astype(np.float32)
        eps_np = rng.normal(size=(steps, B, L)).astype(np.float32)

        # --- JAX side -----------------------------------------------------
        model = MLPVAE(latent_dim=L, hidden_dim=H)
        params = model.init(
            jax.random.key(0), jnp.asarray(x_np[0]), lambda m, v, salt=0: m
        )
        p = params["params"]

        # --- torch side: same weights (flax Dense kernel == W^T in torch) --
        tl = {}
        for name in ("enc_fc", "enc_mu", "enc_logvar", "dec_fc", "dec_out"):
            w = torch.from_numpy(np.asarray(p[name]["kernel"])).clone()
            b = torch.from_numpy(np.asarray(p[name]["bias"])).clone()
            lin = torch.nn.Linear(w.shape[0], w.shape[1])
            with torch.no_grad():
                lin.weight.copy_(w.T)
                lin.bias.copy_(b)
            tl[name] = lin
        t_params = [q for lin in tl.values() for q in lin.parameters()]
        t_opt = torch.optim.Adam(t_params, lr=lr)

        def torch_loss(x, eps):
            flat = x.reshape(B, -1)
            h = torch.relu(tl["enc_fc"](flat))
            mu, logvar = tl["enc_mu"](h), tl["enc_logvar"](h)
            z = mu + torch.exp(0.5 * logvar) * eps
            out = tl["dec_out"](torch.relu(tl["dec_fc"](z)))
            bce = F.binary_cross_entropy_with_logits(out, flat, reduction="sum")
            kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
            return (bce + kl) / B

        # --- JAX train loop with injected eps ------------------------------
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        def jax_loss(prm, x, eps):
            out = model.apply(prm, x, lambda m, v, salt=0: m + jnp.exp(0.5 * v) * eps)
            bce, kl = elbo_parts_ref(out.logits, out.target, out.mu, out.logvar)
            return (bce + kl) / B

        jax_losses, torch_losses = [], []
        jit_grad = jax.jit(jax.value_and_grad(jax_loss))
        for s in range(steps):
            x_j = jnp.asarray(x_np[s])
            e_j = jnp.asarray(eps_np[s])
            lval, grads = jit_grad(params, x_j, e_j)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            jax_losses.append(float(lval))

            t_opt.zero_grad()
            tloss = torch_loss(
                torch.from_numpy(x_np[s]), torch.from_numpy(eps_np[s])
            )
            tloss.backward()
            t_opt.step()
            torch_losses.append(float(tloss))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=_CURVE_RTOL)


class TestConvLSTMvsTorch:
    def test_cell_step(self, rng):
        """One ConvLSTM step vs a torch implementation of the same equations.

        Weights are copied from the flax cell into the torch conv (flax HWIO ->
        torch OIHW), inputs NHWC -> NCHW; the gate math (Shi et al. 2015 with
        i,f,g,o gate order and +1 forget bias) must then match elementwise.
        """
        from mmvae_tpu.models.convlstm import ConvLSTMCell

        b, h, w, cin, f = 2, 8, 8, 3, 4
        x = rng.normal(size=(b, h, w, cin)).astype(np.float32)
        c0 = rng.normal(size=(b, h, w, f)).astype(np.float32)
        h0 = rng.normal(size=(b, h, w, f)).astype(np.float32)

        cell = ConvLSTMCell(features=f)
        params = cell.init(jax.random.key(0), (jnp.asarray(c0), jnp.asarray(h0)), jnp.asarray(x))
        (c1, h1), _ = cell.apply(
            params, (jnp.asarray(c0), jnp.asarray(h0)), jnp.asarray(x)
        )

        kernel = np.asarray(params["params"]["gates"]["kernel"])  # (kh,kw,cin+f,4f)
        bias = np.asarray(params["params"]["gates"]["bias"])

        conv = torch.nn.Conv2d(cin + f, 4 * f, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(kernel).permute(3, 2, 0, 1))
            conv.bias.copy_(torch.from_numpy(bias))

        xh = torch.cat(
            [
                torch.from_numpy(x).permute(0, 3, 1, 2),
                torch.from_numpy(h0).permute(0, 3, 1, 2),
            ],
            dim=1,
        )
        gates = conv(xh)
        i, fg, g, o = torch.chunk(gates, 4, dim=1)
        tc0 = torch.from_numpy(c0).permute(0, 3, 1, 2)
        c_new = torch.sigmoid(fg + 1.0) * tc0 + torch.sigmoid(i) * torch.tanh(g)
        h_new = torch.sigmoid(o) * torch.tanh(c_new)

        np.testing.assert_allclose(
            np.asarray(c1),
            c_new.permute(0, 2, 3, 1).detach().numpy(),
            atol=_CELL_ATOL,
        )
        np.testing.assert_allclose(
            np.asarray(h1),
            h_new.permute(0, 2, 3, 1).detach().numpy(),
            atol=_CELL_ATOL,
        )


def _copy_linear(p, name=None):
    """flax Dense params -> torch Linear (kernel (in,out) == weight^T)."""
    node = p[name] if name else p
    w = torch.from_numpy(np.asarray(node["kernel"])).clone()
    lin = torch.nn.Linear(w.shape[0], w.shape[1])
    with torch.no_grad():
        lin.weight.copy_(w.T)
        lin.bias.copy_(torch.from_numpy(np.asarray(node["bias"])).clone())
    return lin


def _copy_conv(node, stride, padding, bias=True):
    """flax Conv params (HWIO) -> torch Conv2d (OIHW)."""
    w = np.asarray(node["kernel"])
    conv = torch.nn.Conv2d(
        w.shape[2], w.shape[3], w.shape[0], stride=stride, padding=padding,
        bias=bias,
    )
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.copy()).permute(3, 2, 0, 1))
        if bias:
            conv.bias.copy_(torch.from_numpy(np.asarray(node["bias"]).copy()))
    return conv


def _copy_conv_transpose(node, stride, padding):
    """flax ConvTranspose (transpose_kernel=False) -> torch ConvTranspose2d.

    Empirically verified mapping: torch weight (in,out,kh,kw) = the flax
    HWIO kernel SPATIALLY FLIPPED then permuted (2,3,0,1); SAME/k4/s2 -> p=1,
    k2/s2 -> p=0 (max |err| < 3e-7 across random tensors).
    """
    w = np.asarray(node["kernel"])  # (kh, kw, in, out)
    conv = torch.nn.ConvTranspose2d(
        w.shape[2], w.shape[3], w.shape[0], stride=stride, padding=padding
    )
    with torch.no_grad():
        conv.weight.copy_(
            torch.from_numpy(w[::-1, ::-1].copy()).permute(2, 3, 0, 1)
        )
        conv.bias.copy_(torch.from_numpy(np.asarray(node["bias"]).copy()))
    return conv


def _vae_elbo_torch(logits, target, mu, logvar):
    bce = F.binary_cross_entropy_with_logits(logits, target, reduction="sum")
    kl = -0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp())
    return bce, kl


class TestConvVAECurveParity:
    """Config 2 (BASELINE.json:8) end-to-end: identical weights/data/eps in
    JAX+optax and torch+Adam must yield matching 25-step loss curves."""

    def test_conv_vae_loss_curve_matches(self, rng):
        import optax

        from mmvae_tpu.models import ConvVAE
        from mmvae_tpu.ops.elbo_ref import elbo_parts_ref

        B, L, steps, lr = 8, 8, 25, 1e-3
        channels = (4, 8, 8, 8)  # grid 64 -> 4
        grid = 4

        x_np = (rng.uniform(size=(steps, B, 64, 64)) < 0.35).astype(np.float32)
        eps_np = rng.normal(size=(steps, B, L)).astype(np.float32)

        model = ConvVAE(latent_dim=L, channels=channels)
        params = model.init(
            jax.random.key(0), jnp.asarray(x_np[0]), lambda m, v, salt=0: m
        )
        p = params["params"]

        # --- torch twin -----------------------------------------------------
        enc = [
            _copy_conv(p["encoder"][f"Conv_{i}"], stride=2, padding=1)
            for i in range(len(channels))
        ]
        lin_mu = _copy_linear(p["head"], "mu")
        lin_lv = _copy_linear(p["head"], "logvar")
        dec_in = _copy_linear(p, "dec_in")
        dec = [
            _copy_conv_transpose(p["decoder"][f"ConvTranspose_{i}"], 2, 1)
            for i in range(len(channels))
        ]
        out_conv = _copy_conv(p["decoder"]["Conv_0"], stride=1, padding=1)
        mods = enc + [lin_mu, lin_lv, dec_in] + dec + [out_conv]
        t_opt = torch.optim.Adam(
            [q for m in mods for q in m.parameters()], lr=lr
        )

        def torch_loss(x, eps):
            h = x[:, None]  # (B,1,64,64)
            for conv in enc:
                h = torch.relu(conv(h))
            flat = h.permute(0, 2, 3, 1).reshape(B, -1)  # NHWC flatten = flax
            mu, logvar = lin_mu(flat), lin_lv(flat)
            z = mu + torch.exp(0.5 * logvar) * eps
            h = torch.relu(dec_in(z)).view(B, grid, grid, channels[-1])
            h = h.permute(0, 3, 1, 2)
            for conv in dec:
                h = torch.relu(conv(h))
            logits = out_conv(h)[:, 0]
            bce, kl = _vae_elbo_torch(logits, x, mu, logvar)
            return (bce + kl) / B

        # --- JAX loop with injected eps --------------------------------------
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        def jax_loss(prm, x, eps):
            out = model.apply(
                prm, x, lambda m, v, salt=0: m + jnp.exp(0.5 * v) * eps
            )
            bce, kl = elbo_parts_ref(out.logits, out.target, out.mu, out.logvar)
            return (bce + kl) / B

        jit_grad = jax.jit(jax.value_and_grad(jax_loss))
        jl, tl_curve = [], []
        for s in range(steps):
            lval, grads = jit_grad(
                params, jnp.asarray(x_np[s]), jnp.asarray(eps_np[s])
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            jl.append(float(lval))

            t_opt.zero_grad()
            tloss = torch_loss(
                torch.from_numpy(x_np[s]), torch.from_numpy(eps_np[s])
            )
            tloss.backward()
            t_opt.step()
            tl_curve.append(float(tloss))

        np.testing.assert_allclose(jl, tl_curve, rtol=5e-3)


class _TorchConvLSTM:
    """Hoisted-form ConvLSTM twin: conv_x (bias) + conv_h (no bias), i/f/g/o
    gate order, +1 forget bias — the equations of models/convlstm.py."""

    def __init__(self, p_lstm):
        self.conv_x = _copy_conv(p_lstm["input"], stride=1, padding=1)
        self.conv_h = _copy_conv(
            p_lstm["step"]["hidden"], stride=1, padding=1, bias=False
        )

    def params(self):
        return list(self.conv_x.parameters()) + list(self.conv_h.parameters())

    @staticmethod
    def _step(xg, c, h, conv_h):
        gates = xg + conv_h(h)
        i, f, g, o = torch.chunk(gates, 4, dim=1)
        c = torch.sigmoid(f + 1.0) * c + torch.sigmoid(i) * torch.tanh(g)
        h = torch.sigmoid(o) * torch.tanh(c)
        return c, h

    def run(self, xs, feat, steps=None):
        """xs: (B,T,C,H,W) or (B,1,C,H,W) broadcast `steps` times."""
        b = xs.shape[0]
        g = xs.shape[-1]
        c = torch.zeros(b, feat, g, g)
        h = torch.zeros(b, feat, g, g)
        t = steps or xs.shape[1]
        xg_const = self.conv_x(xs[:, 0]) if xs.shape[1] == 1 else None
        hs = []
        for s in range(t):
            xg = xg_const if xg_const is not None else self.conv_x(xs[:, s])
            c, h = self._step(xg, c, h, self.conv_h)
            hs.append(h)
        return c, h, torch.stack(hs, dim=1)


class TestSeqVAECurveParity:
    """Config 3 (BASELINE.json:9) end-to-end: the flagship ConvLSTM sequence
    VAE (hoisted input projection, constant decoder token, pixel-shuffle-style
    2x2 deconv decoder) trained curve-for-curve against a torch twin."""

    def test_seq_vae_loss_curve_matches(self, rng):
        import optax

        from mmvae_tpu.models import ConvLSTMSeqVAE
        from mmvae_tpu.ops.elbo_ref import elbo_parts_ref

        B, T, L, F, steps, lr = 4, 4, 8, 8, 25, 1e-3
        enc_channels = (4, 8)  # 64 -> 32 -> 16; grid 16
        grid = 16

        x_np = (rng.uniform(size=(steps, B, T, 64, 64)) < 0.35).astype(np.float32)
        eps_np = rng.normal(size=(steps, B, L)).astype(np.float32)

        model = ConvLSTMSeqVAE(
            latent_dim=L, enc_channels=enc_channels, lstm_features=F
        )
        params = model.init(
            jax.random.key(0), jnp.asarray(x_np[0]), lambda m, v, salt=0: m
        )
        p = params["params"]

        # --- torch twin -----------------------------------------------------
        enc = [
            _copy_conv(p["frame_enc"][f"Conv_{i}"], stride=2, padding=1)
            for i in range(len(enc_channels))
        ]
        enc_lstm = _TorchConvLSTM(p["enc_lstm"])
        lin_mu = _copy_linear(p["head"], "mu")
        lin_lv = _copy_linear(p["head"], "logvar")
        z_to_state = _copy_linear(p, "z_to_state")
        z_to_token = _copy_linear(p, "z_to_token")
        dec_lstm = _TorchConvLSTM(p["dec_lstm"])
        # "fast" decoder: 2x2 upsamples, 3x3 mixing conv at HALF resolution,
        # then a final 2x2 transpose straight to 1-channel logits.
        dec = [
            _copy_conv_transpose(p["frame_dec"][f"ConvTranspose_{i}"], 2, 0)
            for i in range(len(enc_channels) - 1)
        ]
        mix_conv = _copy_conv(p["frame_dec"]["Conv_0"], stride=1, padding=1)
        out_deconv = _copy_conv_transpose(
            p["frame_dec"][f"ConvTranspose_{len(enc_channels) - 1}"], 2, 0
        )

        t_params = (
            [q for m in enc for q in m.parameters()]
            + enc_lstm.params()
            + list(lin_mu.parameters()) + list(lin_lv.parameters())
            + list(z_to_state.parameters()) + list(z_to_token.parameters())
            + dec_lstm.params()
            + [q for m in dec for q in m.parameters()]
            + list(mix_conv.parameters()) + list(out_deconv.parameters())
        )
        t_opt = torch.optim.Adam(t_params, lr=lr)

        def torch_loss(x, eps):
            frames = x.reshape(B * T, 1, 64, 64)
            h = frames
            for conv in enc:
                h = torch.relu(conv(h))
            feats = h.view(B, T, *h.shape[1:])  # (B,T,C,g,g)
            _, h_T, _ = enc_lstm.run(feats, F)
            flat = h_T.permute(0, 2, 3, 1).reshape(B, -1)  # NHWC flatten
            mu, logvar = lin_mu(flat), lin_lv(flat)
            z = mu + torch.exp(0.5 * logvar) * eps

            ch = z_to_state(z).view(B, grid, grid, 2 * F).permute(0, 3, 1, 2)
            c0, h0 = ch[:, :F], ch[:, F:]
            token = (
                z_to_token(z).view(B, grid, grid, 16).permute(0, 3, 1, 2)
            )[:, None]  # (B,1,16,g,g)
            # decoder scan from (c0, h0) with the constant token input
            c, h = c0, h0
            xg = dec_lstm.conv_x(token[:, 0])
            hs = []
            for _ in range(T):
                c, h = dec_lstm._step(xg, c, h, dec_lstm.conv_h)
                hs.append(h)
            hseq = torch.stack(hs, dim=1).reshape(B * T, F, grid, grid)
            d = hseq
            for conv in dec:
                d = torch.relu(conv(d))
            d = torch.relu(mix_conv(d))
            logits = out_deconv(d)[:, 0].view(B, T, 64, 64)
            bce, kl = _vae_elbo_torch(logits, x, mu, logvar)
            return (bce + kl) / B

        # --- JAX loop with injected eps --------------------------------------
        tx = optax.adam(lr)
        opt_state = tx.init(params)

        def jax_loss(prm, x, eps):
            out = model.apply(
                prm, x, lambda m, v, salt=0: m + jnp.exp(0.5 * v) * eps
            )
            bce, kl = elbo_parts_ref(out.logits, out.target, out.mu, out.logvar)
            return (bce + kl) / B

        jit_grad = jax.jit(jax.value_and_grad(jax_loss))
        jl, tl_curve = [], []
        for s in range(steps):
            lval, grads = jit_grad(
                params, jnp.asarray(x_np[s]), jnp.asarray(eps_np[s])
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            jl.append(float(lval))

            t_opt.zero_grad()
            tloss = torch_loss(
                torch.from_numpy(x_np[s]), torch.from_numpy(eps_np[s])
            )
            tloss.backward()
            t_opt.step()
            tl_curve.append(float(tloss))

        np.testing.assert_allclose(jl, tl_curve, rtol=5e-3)


class TestConcatConvLSTMScanParity:
    def test_concat_cell_scan_over_time(self, rng):
        """Multi-step scan of the concat-form cell vs torch (extends the
        single-step round-1 test to a full T-step recurrence)."""
        from mmvae_tpu.models.convlstm import ConvLSTMCell, scan_convlstm

        b, t, hw, cin, f = 2, 5, 8, 3, 4
        xs = rng.normal(size=(b, t, hw, hw, cin)).astype(np.float32)

        scanned = scan_convlstm(ConvLSTMCell, f, name="cell")
        state0 = ConvLSTMCell.initial_state(b, hw, hw, f)
        params = scanned.init(jax.random.key(1), state0, jnp.asarray(xs))
        (c_j, h_j), hs_j = scanned.apply(params, state0, jnp.asarray(xs))

        kernel = np.asarray(params["params"]["gates"]["kernel"])
        bias = np.asarray(params["params"]["gates"]["bias"])
        conv = torch.nn.Conv2d(cin + f, 4 * f, 3, padding=1)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(kernel.copy()).permute(3, 2, 0, 1))
            conv.bias.copy_(torch.from_numpy(bias.copy()))

        c = torch.zeros(b, f, hw, hw)
        h = torch.zeros(b, f, hw, hw)
        for s in range(t):
            x_t = torch.from_numpy(xs[:, s]).permute(0, 3, 1, 2)
            gates = conv(torch.cat([x_t, h], dim=1))
            i, fg, g, o = torch.chunk(gates, 4, dim=1)
            c = torch.sigmoid(fg + 1.0) * c + torch.sigmoid(i) * torch.tanh(g)
            h = torch.sigmoid(o) * torch.tanh(c)

        np.testing.assert_allclose(
            np.asarray(h_j), h.permute(0, 2, 3, 1).detach().numpy(), atol=_SCAN_ATOL
        )
        np.testing.assert_allclose(
            np.asarray(c_j), c.permute(0, 2, 3, 1).detach().numpy(), atol=_SCAN_ATOL
        )
