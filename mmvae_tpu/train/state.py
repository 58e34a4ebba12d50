"""TrainState: params + optax state + step (SURVEY.md C13).

A flax PyTreeNode so the whole state shards/checkpoints/donates as one pytree.
RNG is *not* carried in the state: each step derives its seed from the step
counter (`fold_in`), which keeps the state minimal and restart-reproducible.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_optimizer(optim_cfg) -> optax.GradientTransformation:
    tx = optax.adam(optim_cfg.lr, b1=optim_cfg.b1, b2=optim_cfg.b2)
    if optim_cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(optim_cfg.grad_clip), tx)
    return tx


def create_train_state(model, optim_cfg, rng, sample_shape) -> TrainState:
    """Init params via abstract-friendly dummy batch (SURVEY.md 3.4)."""
    import jax.numpy as jnp

    dummy = jnp.zeros(sample_shape, jnp.float32)

    def init_sample_fn(mu, logvar, salt=0):
        return mu  # deterministic: init only traces shapes

    params = model.init(rng, dummy, init_sample_fn)
    tx = make_optimizer(optim_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
