"""Cross-framework numerics oracle: JAX ops vs torch-CPU reference formulas.

SURVEY.md 4.2: the reference repo is unrecoverable (empty mount), so parity is
locked against torch 2.13-CPU implementing the canonical reference equations —
`F.binary_cross_entropy_with_logits(reduction='sum')`, the classic VAE KL, the
reparameterization, and a ConvLSTM cell step.  This pins the loss convention
to the one the reference's curves used (BCE sum + KL sum).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mmvae_tpu.ops import elbo_parts_ref  # noqa: E402
from mmvae_tpu.ops.elbo_pallas import elbo_reduce_pallas  # noqa: E402


class TestELBOvsTorch:
    @pytest.mark.parametrize("shape", [(4, 64, 64), (2, 20, 64, 64)])
    def test_bce_kl_forward(self, rng, shape):
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
        np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=1e-6)

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
        np.testing.assert_allclose(np.asarray(j_z), t_z, atol=1e-6)


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

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)


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
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(h1),
            h_new.permute(0, 2, 3, 1).detach().numpy(),
            atol=1e-5,
        )
