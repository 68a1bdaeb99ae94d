"""Checkpoint / resume via Orbax.

Replaces AllenNLP's checkpoint callback (model_state_epoch_N.th + keep 10 +
best.th by validation metric, config.yaml:156-162 and SURVEY.md §5) with
Orbax saves of the full train-state pytree (params, optimizer state,
step/epoch counters, and — for preemption stops that land mid-epoch — a
batch_cursor into the epoch's deterministic (epoch_index-seeded) order, so
recovery is step-exact: the resumed run skips the already-trained prefix
instead of redoing the epoch the way the reference's per-epoch recovery
does).

Saves are ASYNC by default (ocp.AsyncCheckpointer): save() returns once the
device arrays are staged to host and the serialization/commit runs behind
the next epoch's compute — at production sizes a multi-GB train state no
longer stalls the step loop. Consistency rules: at most one save in flight
(a new save waits out the previous), metadata + keep-N GC are deferred to
the in-flight save's completion (Orbax finalizes via atomic rename, so
meta.json can only be written after commit), and every read path
(restore/list) flushes first. `flush()` is the explicit barrier — the
trainer calls it before returning.
"""
from __future__ import annotations

import json
import os
import shutil

import jax
import orbax.checkpoint as ocp


def _primary() -> bool:
    return jax.process_index() == 0


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 10,
                 use_async: bool = True):
        self.dir = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.dir, exist_ok=True)
        self._async = use_async
        self._ckptr = (ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
                       if use_async else ocp.PyTreeCheckpointer())
        # (path, metadata) writes deferred until the in-flight save commits
        self._pending_meta: tuple[str, dict | None] | None = None

    def _path(self, tag) -> str:
        return os.path.join(self.dir, f"ckpt-{tag}")

    def flush(self) -> None:
        """Wait for the in-flight save (if any), then apply its deferred
        metadata write and keep-N GC. Idempotent. Under multi-host training
        (shared run dir) the filesystem mutations happen on process 0 only
        — every process still waits, so nobody reads a half-committed
        checkpoint."""
        if self._async:
            self._ckptr.wait_until_finished()
        if self._pending_meta is not None:
            path, metadata = self._pending_meta
            self._pending_meta = None
            if _primary():
                if metadata is not None and os.path.exists(path):
                    with open(os.path.join(path, "meta.json"), "w") as f:
                        json.dump(metadata, f)
                self._gc()

    def _save(self, path: str, state: dict,
              metadata: dict | None) -> None:
        self.flush()                    # one save in flight at a time
        if _primary() and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            # the rmtree must land before any process starts writing
            from ..parallel.multihost import barrier
            barrier(f"tnt_ckpt_pre_save:{os.path.basename(path)}")
        self._ckptr.save(path, state)
        self._pending_meta = (path, metadata)
        if not self._async:
            self.flush()

    def save(self, tag, state: dict, metadata: dict | None = None) -> None:
        self._save(self._path(tag), state, metadata)

    def save_best(self, state: dict, metadata: dict | None = None) -> None:
        self._save(os.path.join(self.dir, "best"), state, metadata)

    def restore(self, tag=None, template=None) -> tuple[dict, dict] | None:
        """Restore `tag` (or the latest numeric checkpoint). Returns
        (state, metadata) or None."""
        self.flush()
        if tag is None:
            tags = self.list()
            if not tags:
                return None
            tag = tags[-1]
        path = self._path(tag) if tag != "best" else \
            os.path.join(self.dir, "best")
        if not os.path.exists(path):
            return None
        state = self._ckptr.restore(path, item=template)
        meta_path = os.path.join(path, "meta.json")
        meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return state, meta

    def list(self) -> list[int]:
        self.flush()
        tags = []
        for name in os.listdir(self.dir):
            if name.startswith("ckpt-"):
                try:
                    tags.append(int(name[5:]))
                except ValueError:  # tmp dirs / "best"
                    pass
        return sorted(tags)

    def _gc(self) -> None:
        tags = []
        for name in os.listdir(self.dir):  # no list() — flush() calls _gc
            if name.startswith("ckpt-"):
                try:
                    tags.append(int(name[5:]))
                except ValueError:
                    pass
        for tag in sorted(tags)[: max(0, len(tags) - self.keep)]:
            shutil.rmtree(self._path(tag), ignore_errors=True)
