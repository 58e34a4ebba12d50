"""Tracing/profiling (SURVEY.md section 5 "Tracing / profiling").

The reference has none; here: `jax.profiler.trace` context for
TensorBoard/Perfetto dumps (tensorboard-plugin-profile is installed) and
`jax.named_scope` annotations for layer attribution.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str, *, with_perfetto: bool = False):
    """Profile everything inside the context into `logdir`.

    View with: tensorboard --logdir <logdir>  (Profile tab), or upload the
    .perfetto trace to ui.perfetto.dev.
    """
    with jax.profiler.trace(
        logdir, create_perfetto_trace=with_perfetto
    ):
        yield


def annotate(name: str):
    """Named scope for profiler attribution: `with annotate('encoder'): ...`."""
    return jax.named_scope(name)
