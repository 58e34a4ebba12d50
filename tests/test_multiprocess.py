"""True multi-process DP validation on CPU (VERDICT round-1 item 2).

Spawns TWO real JAX processes (subprocesses, `jax.distributed.initialize`
over a localhost coordinator, gloo CPU collectives, 2 fake devices each) and
runs BOTH data paths end-to-end — streaming: per-process loader shard ->
DeviceFeed -> `put_global` global-array assembly -> shard_map DP train step ->
sharded eval step; resident: per-process `pack_resident` rows ->
`make_array_from_process_local_data` -> DP step with on-device gather (fit's
default mode when the dataset fits HBM; VERDICT r2 missing-1).  The children
assert the assembled global arrays hold each process's rows at the right
global offsets — the exact invariant the round-1
`device_put(local, global_sharding)` bug violated.  See tests/_mp_child.py.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(__file__), "_mp_child.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_streaming_dp():
    # Bounded by the communicate(timeout=240) below; pytest-timeout is not
    # installed in this image, so a mark would be silently inert.
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(pid), str(port)],
            env=env,
            cwd=_REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process children timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed (rc={p.returncode}):\n{out}"
        assert f"process {pid}: ok" in out, f"child {pid} output:\n{out}"
