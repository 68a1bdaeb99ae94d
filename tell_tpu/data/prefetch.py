"""Host->device prefetch pipeline.

The reference's bucket iterator produces batches synchronously on the host
while the GPU idles (AllenNLP data path, SURVEY.md §5). Here a background
thread keeps a bounded queue of batches that are ALREADY device_put with
their target shardings, so the TPU's next step launches without waiting on
host-side packing, numpy stacking, or the PCIe/ICI transfer — the standard
double-buffered input pipeline.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import jax

_END = object()


class DevicePrefetcher:
    """Iterate `batches`, device_put each with `sharding_fn(batch)`, and
    hand them out `depth` steps ahead of the consumer."""

    def __init__(self, batches: Iterator[dict],
                 sharding_fn: Callable[[dict], object] | None = None,
                 depth: int = 2,
                 put_fn: Callable[[dict], dict] | None = None):
        """put_fn, when given, replaces the device_put entirely (used by
        multi-host training, where each process contributes only its local
        shard via jax.make_array_from_process_local_data — see
        parallel/multihost.py)."""
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._done = False
        self._stop = threading.Event()

        def worker():
            try:
                for batch in batches:
                    if self._stop.is_set():
                        return
                    if put_fn is not None:
                        batch = put_fn(batch)
                    elif sharding_fn is not None:
                        batch = jax.device_put(batch, sharding_fn(batch))
                    else:
                        batch = jax.device_put(batch)
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                # deliver the sentinel unless the consumer closed us (then
                # nobody is reading and the queue may stay full)
                while not self._stop.is_set():
                    try:
                        self._q.put(_END, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker and release queued device batches (call from a
        `finally` when abandoning iteration early, or via contextmanager)."""
        self._stop.set()
        self._done = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        # a worker blocked in q.put can slip one more batch into the slot
        # the drain just freed; drain again after the join so the promise
        # of releasing queued device batches holds
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._q.get()
        if item is _END:
            self._done = True
            self._thread.join()
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch_to_device(batches: Iterator[dict],
                       sharding_fn: Callable[[dict], object] | None = None,
                       depth: int = 2) -> Iterator[dict]:
    return DevicePrefetcher(batches, sharding_fn, depth)
