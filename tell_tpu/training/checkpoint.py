"""Checkpoint / resume via Orbax.

Replaces AllenNLP's checkpoint callback (model_state_epoch_N.th + keep 10 +
best.th by validation metric, config.yaml:156-162 and SURVEY.md §5) with
async-capable Orbax saves of the full train-state pytree (params, optimizer
state, step/epoch counters, data cursor).
"""
from __future__ import annotations

import json
import os
import shutil

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 10):
        self.dir = os.path.abspath(directory)
        self.keep = keep
        os.makedirs(self.dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, tag) -> str:
        return os.path.join(self.dir, f"ckpt-{tag}")

    def save(self, tag, state: dict, metadata: dict | None = None) -> None:
        path = self._path(tag)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        if metadata is not None:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(metadata, f)
        self._gc()

    def save_best(self, state: dict, metadata: dict | None = None) -> None:
        path = os.path.join(self.dir, "best")
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        if metadata is not None:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(metadata, f)

    def restore(self, tag=None, template=None) -> tuple[dict, dict] | None:
        """Restore `tag` (or the latest numeric checkpoint). Returns
        (state, metadata) or None."""
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
        tags = []
        for name in os.listdir(self.dir):
            if name.startswith("ckpt-"):
                try:
                    tags.append(int(name[5:]))
                except ValueError:
                    pass
        return sorted(tags)

    def _gc(self) -> None:
        tags = self.list()
        for tag in tags[: max(0, len(tags) - self.keep)]:
            shutil.rmtree(self._path(tag), ignore_errors=True)
