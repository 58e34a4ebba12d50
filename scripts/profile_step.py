#!/usr/bin/env python
"""Per-op step-budget table from a `mmvae bench --profile DIR` trace.

Reproduces the docs/RESULTS.md profile method as a script: dump a profiler
trace of ~20 steps, then sum the device "XLA Ops" track by the model's
`jax.named_scope` annotation (carried in each op's tf_op/name metadata) to
get an exact per-component budget of one train step.

Usage:
    python -m mmvae_tpu.cli bench --config hier_vae --profile /tmp/prof
    python scripts/profile_step.py /tmp/prof [--steps 20] [--top 25]

The table reports total device ms per scope per STEP (trace total / steps)
plus the share of device time.  fwd/bwd attribution follows the scope path
(backward ops carry `transpose[...]`/gradient paths in their tf_op).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(profile_dir: str) -> dict:
    pats = [
        os.path.join(profile_dir, "**", "*.trace.json.gz"),
        os.path.join(profile_dir, "**", "*.trace.json"),
    ]
    paths = []
    for p in pats:
        paths += glob.glob(p, recursive=True)
    if not paths:
        raise SystemExit(f"no trace files under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f)


def xla_op_events(trace: dict):
    """Yield (name, tf_op, dur_us) for events on device 'XLA Ops' threads."""
    events = trace.get("traceEvents", [])
    # Map (pid, tid) -> thread name; pid -> process name.
    tnames, pnames = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "thread_name":
                tnames[(e["pid"], e["tid"])] = e["args"]["name"]
            elif e.get("name") == "process_name":
                pnames[e["pid"]] = e["args"]["name"]
    for e in events:
        if e.get("ph") != "X":
            continue
        tn = tnames.get((e.get("pid"), e.get("tid")), "")
        pn = pnames.get(e.get("pid"), "")
        if "XLA Ops" not in tn and "XLA Ops" not in pn:
            continue
        args = e.get("args", {}) or {}
        yield e.get("name", ""), args.get("tf_op", args.get("name", "")), e.get("dur", 0)


_BWD_MARKERS = ("transpose[", "/vjp", "grad", "backward")


def scope_of(tf_op: str, name: str, depth: int) -> str:
    """First `depth` components of the named-scope path; '?' when unscoped."""
    s = tf_op or name
    parts = [p for p in s.split("/") if p]
    if not parts:
        return "?"
    return "/".join(parts[:depth])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--steps", type=int, default=20,
                    help="steps the profile window covered (bench --profile default: 20)")
    ap.add_argument("--depth", type=int, default=1, help="scope grouping depth")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--ops", action="store_true",
                    help="also print the top individual ops")
    args = ap.parse_args()

    trace = load_trace(args.profile_dir)
    by_scope = collections.Counter()
    by_scope_bwd = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    for name, tf_op, dur in xla_op_events(trace):
        scope = scope_of(tf_op, name, args.depth)
        by_scope[scope] += dur
        low = (tf_op + " " + name).lower()
        if any(m in low for m in _BWD_MARKERS):
            by_scope_bwd[scope] += dur
        by_op[f"{scope} :: {name}"] += dur
        total += dur

    per_step = total / args.steps / 1e3
    print(f"device total: {total / 1e3:.3f} ms over {args.steps} steps "
          f"= {per_step:.3f} ms/step\n")
    print(f"{'scope':<40} {'ms/step':>8} {'bwd-ish':>8} {'share':>7}")
    for scope, dur in by_scope.most_common(args.top):
        ms = dur / args.steps / 1e3
        bwd = by_scope_bwd.get(scope, 0) / args.steps / 1e3
        print(f"{scope:<40} {ms:8.3f} {bwd:8.3f} {dur / total:6.1%}")
    if args.ops:
        print("\ntop ops:")
        for op, dur in by_op.most_common(args.top):
            print(f"  {dur / args.steps / 1e3:8.3f} ms  {op[:110]}")


if __name__ == "__main__":
    main()
