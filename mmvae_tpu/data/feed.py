"""Host-side double-buffered device feed.

Contract (BASELINE.json:5): ".npy sequence loader becomes a host-side
double-buffered feed".  Replaces the reference's synchronous
``DataLoader ... batch.to(device)`` (SURVEY.md 3.1) with a background thread
that stages batch k+1..k+depth into HBM (async `jax.device_put`, uint8 on the
wire, placed with the mesh's data-parallel `Sharding`) while the device runs
step k.  Depth-2 is classic double buffering; the bounded queue provides
backpressure, and a sentinel shuts the thread down cleanly (SURVEY.md section 5,
race-detection notes).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax

from mmvae_tpu.parallel.mesh import put_global

_SENTINEL = object()


class DeviceFeed:
    """Background-thread prefetcher: host numpy batches -> device arrays.

    Args:
      host_iter: yields host (numpy) batches — e.g. `MovingMNIST.batches(...)`.
      sharding: optional `jax.sharding.Sharding` for placement (data-parallel
        batch sharding); default = JAX's default device.
      depth: number of batches in flight (2 = double buffering).
    """

    def __init__(
        self,
        host_iter: Iterator,
        sharding: Optional[jax.sharding.Sharding] = None,
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._worker, args=(host_iter,), daemon=True
        )
        self._thread.start()

    def _worker(self, host_iter: Iterator) -> None:
        try:
            for batch in host_iter:
                if self._stop.is_set():
                    return
                # device_put is async: returns immediately, transfer overlaps
                # with the device's current step. uint8 on the wire.  Under
                # multi-process DP the loader yields process-LOCAL batches;
                # put_global assembles them into the global sharded array
                # (device_put alone would double-shard — see parallel.mesh).
                dev = put_global(batch, self._sharding)
                while not self._stop.is_set():
                    try:
                        self._q.put(dev, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def stop(self) -> None:
        """Stop the worker and drain; safe to call multiple times."""
        self._stop.set()
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.stop()
        return False


def prefetch_to_device(
    host_iter: Iterator,
    sharding: Optional[jax.sharding.Sharding] = None,
    depth: int = 2,
) -> DeviceFeed:
    """Convenience constructor matching SURVEY.md L0's planned interface."""
    return DeviceFeed(host_iter, sharding=sharding, depth=depth)
