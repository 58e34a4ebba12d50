"""Device mesh + data-parallel step via shard_map over ICI.

Contract (BASELINE.json:5): "training runs data-parallel via shard_map over
ICI".  The reference is single-process with no comms backend (SURVEY.md 2.2);
the TPU-native equivalent is XLA collectives: `shard_map` partitions the batch
over a 1-D ('data',) mesh, each shard computes loss/grads locally, and a
single `psum` over the mesh axis averages gradients and metrics across chips —
the only cross-device point in the step (SURVEY.md 3.1).  Within a slice the
psum rides ICI; across hosts/slices the standard JAX multi-host runtime
(`jax.distributed.initialize`) covers DCN, with zero transport code here.

The same code runs single-device (mesh of 1; psum is the identity) and on the
8-fake-device CPU harness used by tests/test_dp.py.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over the data axis; used for feed placement."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(batch, sharding: Optional[NamedSharding]):
    """Place a process-LOCAL host batch as (its shard of) the GLOBAL array.

    Single-process: plain async `device_put` under `sharding`.  Multi-process:
    `device_put(local, global_sharding)` would treat the local batch as the
    full global array and re-shard it across ALL processes — mis-assembled
    data (each process's rows scattered) or an addressability error.  The
    correct assembly is `jax.make_array_from_process_local_data`, which maps
    each process's rows onto its own mesh slots; global row index becomes
    process_index * local_rows + local_row (mesh built from `jax.devices()`,
    which orders devices by process).
    """
    if sharding is None:
        return jax.device_put(batch)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(batch)
        )
    return jax.device_put(batch, sharding)


def dp_step(
    step_fn: Callable,
    mesh: Mesh,
    *,
    donate_state: bool = True,
) -> Callable:
    """Wrap a per-shard train step into a jitted shard_map data-parallel step.

    `step_fn(state, batch) -> (state, metrics)` must already psum/pmean its
    gradients/metrics over `DATA_AXIS` (see train.loop.make_train_step — the
    pmean sits between `jax.grad` and the optax update).  This wrapper supplies
    the mesh/partitioning: state replicated, batch split on dim 0.
    """
    sharded = jax.shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    donate = (0,) if donate_state else ()
    return jax.jit(sharded, donate_argnums=donate)
