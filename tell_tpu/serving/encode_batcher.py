"""Batched + overlapped article encode in front of the decode engine.

Round-4 serving encoded each live request's article at B=1
(`server.py::_encode1`) — a ~55 ms RoBERTa-large dispatch per request that
serialized with the engine's decode chunks and capped the encode-inclusive
throughput far below the decode capacity. This batcher restores the
encode's batch amortization under streaming traffic:

* concurrent requests' packed feature payloads coalesce into ONE jitted
  encode of up to `max_batch` rows (a `MicroBatcher` drains the queue with
  a short linger, exactly like the micro-batch decode path);
* the stacked batch is padded up to a power-of-two row ladder
  (1, 2, 4, ..., max_batch) so each width compiles a handful of shapes
  once, instead of one shape per occupancy;
* the encode dispatch is ASYNC under jax: the engine tick thread keeps
  dispatching decode chunks while the encode batch is in flight, so on a
  single chip the two programs interleave at the device queue instead of
  round-tripping host<->device per request (the two-program overlap the
  e2e bench proves, bench.py::bench_e2e);
* per-request feature slices feed the engine via `submit_fn` on the
  batcher thread; callers get back the ENGINE future (plus this request's
  encoded features, which the attention-replay path wants).

The reference's worker encodes inline per request
(/root/reference/tell/tasks/captioner.py:146-176); it never had a resident
continuous batcher to feed. Deployment-shape note: on a multi-chip mesh
this batcher is what a dedicated encode submesh runs — see
`__graft_entry__.py::dryrun_multichip`'s disaggregated leg and
docs/parallelism.md.
"""
from __future__ import annotations

from typing import Callable

import numpy as np

from .batcher import MicroBatcher


def _ladder(n: int, max_batch: int) -> int:
    """Smallest power-of-two >= n, capped at max_batch."""
    p = 1
    while p < n and p < max_batch:
        p *= 2
    return min(p, max_batch)


class EncodeBatcher:
    """encode_many(batch[B, ...]) -> encoded feature dict with leading B;
    submit_fn(enc1) -> downstream Future (e.g. DecodeEngine.submit).

    `__call__(payload)` blocks until the payload's encode ran and returns
    (downstream_future, enc1) — the encode itself is batched across
    concurrent callers, the downstream future resolves when the decode
    does."""

    def __init__(self, encode_many: Callable[[dict], dict],
                 submit_fn: Callable[[dict], object],
                 max_batch: int = 8, max_wait_ms: float = 2.0):
        self.encode_many = encode_many
        self.submit_fn = submit_fn
        self.max_batch = max(1, max_batch)
        self._mb = MicroBatcher(self._run, max_batch=self.max_batch,
                                max_wait_ms=max_wait_ms)

    @property
    def stats(self) -> dict:
        return self._mb.stats

    def _run(self, payloads: list[dict]) -> list:
        n = len(payloads)
        padded = _ladder(n, self.max_batch)
        keys = payloads[0].keys()
        stacked = {}
        for k in keys:
            rows = [np.asarray(p[k]) for p in payloads]
            if padded > n:   # shape-pad rows: discarded after the split
                rows.append(np.zeros((padded - n,) + rows[0].shape[1:],
                                     rows[0].dtype))
            stacked[k] = np.concatenate(rows, axis=0)
        enc = self.encode_many(stacked)
        out = []
        for i in range(n):
            enc1 = {k: v[i:i + 1] for k, v in enc.items()}
            out.append((self.submit_fn(enc1), enc1))
        return out

    def __call__(self, payload: dict):
        return self._mb(payload)

    def submit(self, payload: dict):
        """Non-blocking: Future resolving to (downstream_future, enc1)."""
        return self._mb.submit(payload)

    def warmup_sizes(self) -> list[int]:
        """The padded row counts live traffic can hit (compile-ahead)."""
        sizes, p = [], 1
        while p < self.max_batch:
            sizes.append(p)
            p *= 2
        sizes.append(self.max_batch)
        return sizes

    def shutdown(self):
        self._mb.shutdown()
