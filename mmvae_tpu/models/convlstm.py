"""ConvLSTM cell (Shi et al. 2015), TPU-shaped.

Parity target: the reference's recurrent core (SURVEY.md 2.1 "ConvLSTM seq
VAE": ConvLSTM cell(s) over the 20-frame sequence).  TPU-first choices:

- all four gates come from ONE grouped convolution over concat([x, h]) — a
  single large MXU contraction per step instead of 8 small ones;
- state and activations are NHWC; the cell is scanned over time with
  `flax.linen.scan` (lax.scan under jit: O(1) trace size, static shapes);
- forget-gate bias starts at +1.0 (standard recurrent-init trick) via a
  learned bias split.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

State = Tuple[jax.Array, jax.Array]  # (c, h), each (B, H, W, C)


class ConvLSTMCell(nn.Module):
    """One ConvLSTM step: (state, x_t) -> (state, h_t)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state: State, x: jax.Array) -> Tuple[State, jax.Array]:
        c, h = state
        xh = jnp.concatenate([x, h], axis=-1).astype(self.dtype)
        # Single conv producing all gate pre-activations: 4C output channels.
        gates = nn.Conv(
            4 * self.features,
            self.kernel,
            padding="SAME",
            use_bias=True,
            dtype=self.dtype,
            name="gates",
        )(xh)
        gates = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f + 1.0)  # forget bias +1
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c.astype(jnp.float32) + i * g
        h_new = o * jnp.tanh(c_new)
        c_new = c_new.astype(x.dtype)
        h_new = h_new.astype(x.dtype)
        return (c_new, h_new), h_new

    @staticmethod
    def initial_state(
        batch: int, height: int, width: int, features: int, dtype=jnp.float32
    ) -> State:
        shape = (batch, height, width, features)
        return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def scan_convlstm(
    cell_cls,
    features: int,
    *,
    name: str,
    dtype=jnp.float32,
    remat: bool = False,
    kernel: Tuple[int, int] = (3, 3),
):
    """Build a time-scanned ConvLSTM: (state0, xs[B,T,H,W,C]) -> (stateT, hs[B,T,H,W,F]).

    `remat=True` wraps the cell in `nn.remat` so backprop through long scans
    (config 5's 100 frames) rematerializes per-step activations instead of
    storing all T of them — the long-context mechanism from SURVEY.md section 5.
    """
    target = nn.remat(cell_cls, prevent_cse=False) if remat else cell_cls
    scanned = nn.scan(
        target,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=1,
        out_axes=1,
    )
    return scanned(features=features, kernel=kernel, dtype=dtype, name=name)
