"""Persistent XLA compilation cache setup (shared by the CLI and bench.py).

The fully-unrolled seq/hier train graphs cost many minutes of cold compile
per PROCESS without it (JAX's in-memory cache dies with the process; on a
fresh machine the first `bench.py` compile alone has been observed at
>15 min through the device tunnel).  Honors an explicit
JAX_COMPILATION_CACHE_DIR; set MMVAE_NO_COMPILE_CACHE=1 to disable.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> None:
    """Best-effort: point jax at a persistent on-disk compilation cache."""
    if os.environ.get("MMVAE_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/mmvae_tpu/xla_cache"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache every compile that takes >=1s regardless of entry size.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # cache is best-effort (read-only home, old jax)
