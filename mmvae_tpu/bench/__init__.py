from mmvae_tpu.bench.throughput import run_benchmark

__all__ = ["run_benchmark"]
