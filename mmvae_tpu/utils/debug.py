"""Debug guards + preemption handling (SURVEY.md section 5).

- `debug_guards`: opt-in context enabling NaN checks and a transfer guard
  that catches accidental host syncs inside the hot loop (the JAX analog of a
  race/hazard sanitizer for this pipeline — the only host concurrency is the
  feed thread, whose hazards surface as implicit transfers).
- `install_sigterm_checkpoint`: preemption hook that forces a final
  checkpoint on SIGTERM (failure detection / graceful shutdown).
"""

from __future__ import annotations

import contextlib
import signal
from typing import Callable

import jax


@contextlib.contextmanager
def debug_guards(*, nans: bool = True, transfers: bool = False):
    """Enable jax_debug_nans and/or a 'disallow' transfer guard within scope."""
    prev_nans = jax.config.jax_debug_nans
    if nans:
        jax.config.update("jax_debug_nans", True)
    try:
        if transfers:
            with jax.transfer_guard("disallow"):
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)


def install_sigterm_checkpoint(save_fn: Callable[[], None]) -> None:
    """On SIGTERM (preemption), run `save_fn()` once, then re-raise default.

    `save_fn` should be a zero-arg closure that checkpoints the latest state;
    see train.loop.fit.
    """
    state = {"done": False}

    def handler(signum, frame):
        if not state["done"]:
            state["done"] = True
            try:
                save_fn()
            except BaseException:
                # The process dies on the re-raise below either way; without
                # this, a failed forced save is indistinguishable from a
                # successful one (observed as a missing final checkpoint with
                # zero diagnostics).
                import sys
                import traceback

                print("sigterm checkpoint failed:", file=sys.stderr)
                traceback.print_exc()
                sys.stderr.flush()
            finally:
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                signal.raise_signal(signal.SIGTERM)

    signal.signal(signal.SIGTERM, handler)
