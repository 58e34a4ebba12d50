"""Training-throughput benchmark: frames/sec/chip (SURVEY.md C20).

The judged metric (BASELINE.json:2): "training frames/sec/chip on 20-frame
clips", north-star >= 50,000 on a v4-8 chip.  Methodology:

- real training steps (forward + backward + optax update) on synthetic data
  already resident in HBM (the feed's steady-state condition — input is u8 at
  0.8 GB/s for 50k frames/s, far below HBM/PCIe limits, so compute is the
  honest bound and the double-buffered feed hides the copy in production);
- `jax.block_until_ready` fencing; warmup excluded (compile + first-step);
- frames/sec/chip = batch_frames * steps / wall_time / n_local_devices.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

NORTH_STAR_FRAMES_PER_SEC = 50_000.0

# Peak dense bf16 matmul throughput per chip (TFLOP/s), by device_kind
# substring.  Used for the MFU denominator; unknown kinds omit MFU.
_PEAK_BF16_TFLOPS = (
    ("v6 lite", 918.0), ("v6e", 918.0),
    ("v5p", 459.0),
    ("v5 lite", 197.0), ("v5e", 197.0),
    ("v4", 275.0),
)


def _peak_tflops(device_kind: str):
    dk = device_kind.lower()
    for sub, peak in _PEAK_BF16_TFLOPS:
        if sub in dk:
            return peak
    return None


def run_benchmark(
    cfg,
    *,
    steps: int = 200,
    warmup: int = 20,
    data_parallel: Optional[bool] = None,
    profile_dir: Optional[str] = None,
) -> Dict:
    from mmvae_tpu.parallel import mesh as pmesh
    from mmvae_tpu.train.loop import (
        build_model, chunk_steps, make_train_step, _sample_shape,
    )
    from mmvae_tpu.train.state import create_train_state

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    shape = _sample_shape(cfg)
    state = create_train_state(model, cfg.optim, rng, shape)

    device_mesh = pmesh.make_mesh()
    n_dev = device_mesh.size
    use_dp = (data_parallel if data_parallel is not None else cfg.train.data_parallel) and n_dev > 1
    # Measure the production path: device-resident uint8 dataset, per-step
    # on-device batch gather (see train.loop — zero steady-state host traffic).
    if use_dp and cfg.data.batch_size % n_dev:
        raise ValueError(
            f"batch_size {cfg.data.batch_size} must divide n_devices {n_dev}: "
            "the reported frames/step would overstate the judged metric"
        )
    per_dev_batch = cfg.data.batch_size // (n_dev if use_dp else 1)
    sample_shape = shape[1:]
    # With data.on_device_generate the bench measures THAT production path
    # instead (clips generated in-graph; the data argument is a placeholder).
    ongen = bool(getattr(cfg.data, "on_device_generate", False))
    sprite_bank = None
    if ongen and getattr(cfg.data, "sprite_bank", None):
        from mmvae_tpu.data.loader import load_sprite_bank

        sprite_bank = load_sprite_bank(cfg.data.sprite_bank)
    step_kwargs = dict(
        binarize=cfg.data.binarize,
        use_pallas=cfg.train.use_pallas,
        resident_batch=None if ongen else per_dev_batch,
        resident_shape=None if ongen else sample_shape,
        ongen_batch=per_dev_batch if ongen else None,
        ongen_shape=sample_shape if ongen else None,
        ongen_num_digits=cfg.data.num_digits,
        ongen_sprites=sprite_bank,
        per_frame=cfg.data.per_frame,
    )
    # K-step dispatch chunking (train.steps_per_call): the production
    # resident-mode fused dispatch — the bench measures whatever the config
    # trains with.  `steps` stays the number of TRAIN steps per window.
    spc = max(int(getattr(cfg.train, "steps_per_call", 1)), 1)
    if steps % spc:
        raise ValueError(
            f"bench steps ({steps}) must be a multiple of "
            f"train.steps_per_call ({spc})"
        )
    if use_dp:
        inner = make_train_step(
            model, axis_name=pmesh.DATA_AXIS, **step_kwargs
        )
        if spc > 1:
            inner = chunk_steps(inner, spc)
        step_fn = pmesh.dp_step(inner, device_mesh)
        batch_sharding = pmesh.batch_sharding(device_mesh)
        state = jax.device_put(state, pmesh.replicated_sharding(device_mesh))
    else:
        inner = make_train_step(model, **step_kwargs)
        if spc > 1:
            inner = chunk_steps(inner, spc)
        step_fn = jax.jit(inner, donate_argnums=(0,))
        batch_sharding = None

    if ongen:
        batch = np.zeros((n_dev if use_dp else 1,), np.int32)
        batch = (
            jax.device_put(batch, batch_sharding)
            if batch_sharding is not None
            else jax.device_put(batch)
        )
    else:
        # Resident dataset at the PRODUCTION size (the config's full train
        # split, int32-packed like train.loop) so the measured step includes
        # the honest on-device gather cost — a small synthetic pool
        # understates it.
        from mmvae_tpu.data import transforms

        n_clips = max(
            int(cfg.data.num_sequences * cfg.data.train_fraction),
            cfg.data.batch_size,
        )
        n_clips -= n_clips % n_dev
        data_shape = (n_clips, max(cfg.data.seq_len, 1), 64, 64)
        batch = transforms.pack_resident(
            np.random.default_rng(0).integers(0, 256, data_shape, dtype=np.uint8),
            per_frame=cfg.data.per_frame,
        )
        batch = (
            jax.device_put(batch, batch_sharding)
            if batch_sharding is not None
            else jax.device_put(batch)
        )

    # FLOPs/step straight from the compiled executable (XLA's own count of
    # the full fwd+bwd+optimizer step) — the MFU numerator.
    flops_per_step = None
    try:
        ca = step_fn.lower(state, batch).compile().cost_analysis()
        # XLA's cost analysis counts a while/scan BODY once (not trip_count
        # times), so the chunked spc-step call already reports one train
        # step's flops — measured: ca(spc=5) == ca(spc=1).  No spc division.
        flops_per_step = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass  # cost analysis is backend-optional; MFU just gets omitted

    def _fetch_loss(m) -> float:
        # With steps_per_call > 1 metrics are stacked (spc,); take the last.
        return float(np.asarray(m["loss"]).ravel()[-1])

    for _ in range(max(warmup // spc, 1)):
        state, metrics = step_fn(state, batch)
    # Hard host-level sync: fetching a metric forces the full pipeline to
    # drain (block_until_ready alone showed a first-window artifact on the
    # axon-tunneled chip).
    _fetch_loss(metrics)

    if profile_dir:
        # One profiled window for TensorBoard/Perfetto op-level analysis.
        from mmvae_tpu.utils.profiling import trace

        with trace(profile_dir):
            for _ in range(max(min(steps, 20) // spc, 1)):
                state, metrics = step_fn(state, batch)
            _fetch_loss(metrics)

    windows = []
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(steps // spc):
            state, metrics = step_fn(state, batch)
        _fetch_loss(metrics)
        windows.append(time.perf_counter() - t0)
    dt = float(np.median(windows))

    frames_per_step = shape[0] if cfg.data.per_frame else shape[0] * shape[1]
    fps = frames_per_step * steps / dt
    fps_chip = fps / n_dev
    # Spread across the three windows (VERDICT r3 weak-1): a single point
    # value cannot distinguish a 2% claim from the machine's documented
    # ±1.5-2% run-to-run band; min/median/max make the band explicit in
    # every bench JSON, so the guard and the ledger can quote median±spread.
    fps_all = sorted(
        frames_per_step * steps / w / n_dev for w in windows
    )

    mfu = tflops_sec = None
    peak = _peak_tflops(jax.devices()[0].device_kind)
    if flops_per_step:
        tflops_sec = flops_per_step * steps / dt / 1e12 / n_dev
        if peak:
            mfu = tflops_sec / peak
    return {
        "metric": "training frames/sec/chip (20-frame clips)"
        if not cfg.data.per_frame
        else "training frames/sec/chip (single frames)",
        "value": round(fps_chip, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps_chip / NORTH_STAR_FRAMES_PER_SEC, 4),
        "config": cfg.name,
        "batch_frames": frames_per_step,
        "steps": steps,
        "wall_sec": round(dt, 3),
        "windows_sec": [round(w, 3) for w in windows],
        "value_min": round(fps_all[0], 1),
        "value_max": round(fps_all[-1], 1),
        "spread_pct": round(
            100.0 * (fps_all[-1] - fps_all[0]) / fps_chip, 2
        ),
        "n_devices": n_dev,
        "device": jax.devices()[0].device_kind,
        "final_loss": _fetch_loss(metrics),
        "flops_per_step": flops_per_step,
        "tflops_per_sec_chip": round(tflops_sec, 2) if tflops_sec else None,
        "mfu": round(mfu, 4) if mfu else None,
    }
