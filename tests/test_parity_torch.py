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
