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
    # Exponential moving average of params (optim.ema_decay > 0); None keeps
    # the pytree identical to pre-EMA checkpoints.  The EMA is EVALUATED
    # against (val_*_ema metrics) but never trained on.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=ema,
        )


def make_lr(optim_cfg):
    """Learning rate (float or optax schedule) from an OptimConfig.

    "constant" (the reference-parity default: fixed Adam LR) returns the bare
    float so the optimizer pytree is unchanged vs earlier checkpoints; any
    warmup/decay returns an optax schedule of the step count.
    """
    lr = optim_cfg.lr
    sched = getattr(optim_cfg, "lr_schedule", "constant")
    warmup = getattr(optim_cfg, "lr_warmup_steps", 0)
    if sched == "constant":
        if warmup <= 0:
            return lr
        return optax.schedules.linear_schedule(0.0, lr, warmup)
    decay = getattr(optim_cfg, "lr_decay_steps", 0)
    if decay <= 0:
        raise ValueError(
            f"optim.lr_schedule={sched!r} needs optim.lr_decay_steps > 0 "
            "(get_config defaults it to train.steps)"
        )
    end = lr * getattr(optim_cfg, "lr_end_ratio", 0.0)
    if sched == "cosine":
        return optax.schedules.warmup_cosine_decay_schedule(
            0.0, lr, warmup, decay, end
        )
    if sched == "linear":
        ramp = optax.schedules.linear_schedule(0.0, lr, max(warmup, 1))
        fall = optax.schedules.linear_schedule(lr, end, decay - warmup)
        if warmup <= 0:
            return fall
        return optax.schedules.join_schedules([ramp, fall], [warmup])
    raise ValueError(
        f"unknown optim.lr_schedule {sched!r}; use constant | cosine | linear"
    )


def make_optimizer(optim_cfg) -> optax.GradientTransformation:
    wd = getattr(optim_cfg, "weight_decay", 0.0)
    if wd:
        # Decoupled (AdamW) decay: applied to the update, not the gradient,
        # so it composes with the LR schedule the standard way.
        tx = optax.adamw(
            make_lr(optim_cfg), b1=optim_cfg.b1, b2=optim_cfg.b2,
            weight_decay=wd,
        )
    else:
        tx = optax.adam(make_lr(optim_cfg), b1=optim_cfg.b1, b2=optim_cfg.b2)
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
    ema_decay = float(getattr(optim_cfg, "ema_decay", 0.0))
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
        # jnp.copy, not identity: aliasing params' buffers would make the
        # jitted step donate each buffer twice (donate_argnums on the state).
        ema_params=jax.tree.map(jnp.copy, params) if ema_decay > 0 else None,
        ema_decay=ema_decay,
    )
