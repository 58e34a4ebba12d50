"""Orbax checkpoint save/restore of the TrainState (SURVEY.md C16, section 5).

Saves the dynamic pytree (step, params, opt_state); the static fields (tx,
apply_fn) are rebuilt from config on restore.  Restore respects the current
mesh sharding because the template state carries its shardings.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import numpy as np

import orbax.checkpoint as ocp

from mmvae_tpu.train.state import TrainState

_managers = {}


def _manager(directory: str) -> ocp.CheckpointManager:
    directory = os.path.abspath(directory)
    if directory not in _managers:
        _managers[directory] = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
        )
    return _managers[directory]


def _dynamic(state: TrainState):
    return {"step": state.step, "params": state.params, "opt_state": state.opt_state}


def save(directory: str, state: TrainState, step: int, *, force: bool = False) -> None:
    mngr = _manager(directory)
    if step in (mngr.all_steps() or ()):  # already saved (e.g. final == periodic)
        return
    mngr.save(step, args=ocp.args.StandardSave(_dynamic(state)), force=force)
    mngr.wait_until_finished()


def restore_latest(directory: str, template: TrainState) -> Tuple[TrainState, int]:
    """Restore the newest checkpoint into the template's treedef/shardings.

    Returns (state, start_step); (template, 0) when no checkpoint exists.
    """
    mngr = _manager(directory)
    latest = mngr.latest_step()
    if latest is None:
        return template, 0
    restored = mngr.restore(
        latest, args=ocp.args.StandardRestore(_dynamic(template))
    )
    state = template.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    return state, int(np.asarray(restored["step"]))
