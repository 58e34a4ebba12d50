#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2): training frames/sec/chip on 20-frame clips —
the ConvLSTM sequence VAE (config 3), real train steps on the local chip.
"""

import json
import sys


def main() -> int:
    from mmvae_tpu.configs import get_config
    from mmvae_tpu.bench.throughput import run_benchmark
    from mmvae_tpu.utils.compile_cache import enable_persistent_compile_cache

    # On a fresh machine the unrolled train-graph compile alone has been
    # observed at >15 min through the device tunnel; persist it across runs.
    enable_persistent_compile_cache()

    cfg = get_config("seq_vae")
    result = run_benchmark(cfg, steps=100, warmup=10)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
                # Spread across the three fenced windows, so round-over-round
                # comparisons of this artifact can tell a real move from the
                # machine's ±2% run-to-run band (VERDICT r4 weak-3).
                "value_min": result["value_min"],
                "value_max": result["value_max"],
                "spread_pct": result["spread_pct"],
                "windows_sec": result["windows_sec"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
