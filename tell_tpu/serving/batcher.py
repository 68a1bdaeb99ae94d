"""Request micro-batcher.

Replaces the reference's ZeroMQ ventilator -> N worker processes -> sink
fan-out (/root/reference/tell/server/base.py:30-191, SURVEY.md §2.8). On
TPU the efficient unit is one batched jitted decode, so instead of process
fan-out we coalesce concurrent requests into fixed-shape micro-batches: a
single background thread drains the queue, pads to the bucket shape, runs
the model, and resolves per-request futures. Jobs larger than max_batch are
split across micro-batches (the reference's partial-job logic, :176-187,
falls out naturally).
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable


class MicroBatcher:
    def __init__(self, run_batch: Callable[[list], list],
                 max_batch: int = 32, max_wait_ms: float = 10.0):
        """run_batch: list of request payloads -> list of responses."""
        self.run_batch = run_batch
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self.stats = {"requests": 0, "batches": 0, "errors": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, payload) -> Future:
        fut: Future = Future()
        self.queue.put((payload, fut))
        return fut

    def __call__(self, payload):
        return self.submit(payload).result()

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            payloads = [p for p, _ in batch]
            futures = [f for _, f in batch]
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            try:
                results = self.run_batch(payloads)
                for fut, res in zip(futures, results):
                    fut.set_result(res)
            except Exception as e:  # pragma: no cover
                self.stats["errors"] += 1
                for fut in futures:
                    fut.set_exception(e)

    def shutdown(self):
        """Stop the loop thread, then FAIL any still-queued futures — a
        future silently abandoned here would block its caller's .result()
        (no timeout in __call__) forever."""
        self._stop.set()
        self._thread.join(timeout=2)
        try:
            while True:
                _, fut = self.queue.get_nowait()
                fut.set_exception(RuntimeError("service closed"))
        except queue.Empty:
            pass
