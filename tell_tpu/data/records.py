"""Sharded record storage for preprocessed examples.

Replaces the reference's MongoDB-at-training-time design
(nytimes_faces_ner_matched.py:88-103 — one find_one per article per epoch,
TCP round-trips inside the hot loop) with write-once sharded files read by a
host-side loader thread.

Format: one shard = one uncompressed .npz (zip of .npy members — random
access, mmap-friendly, zero extra dependencies). Keys are "<idx>/<field>".
Variable-length fields stay ragged here; fixed TPU shapes are produced by
the bucketing layer at batch time.
"""
from __future__ import annotations

import glob as globlib
import os
from typing import Iterator

import numpy as np


def write_shard(path: str, examples: list[dict]) -> None:
    arrays: dict[str, np.ndarray] = {"__len__": np.asarray(len(examples))}
    for i, ex in enumerate(examples):
        for k, v in ex.items():
            if v is None:
                continue
            arrays[f"{i}/{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


class ShardReader:
    def __init__(self, path: str):
        self.path = path
        self._z = np.load(path, allow_pickle=False)
        self._len = int(self._z["__len__"])
        self._fields: dict[int, list[str]] = {}
        for key in self._z.files:
            if key == "__len__":
                continue
            idx, field = key.split("/", 1)
            self._fields.setdefault(int(idx), []).append(field)

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> dict:
        out = {}
        for field in self._fields.get(i, []):
            v = self._z[f"{i}/{field}"]
            if v.dtype.kind == "U" and v.ndim == 0:
                v = str(v)
            out[field] = v
        return out


class RecordDataset:
    """A set of shards with seeded epoch shuffling.

    Mirrors the reference's seeded RandomState shuffle over article ids
    (nytimes_faces_ner_matched.py:93) at example granularity.
    """

    def __init__(self, pattern: str | list[str], seed: int = 1234):
        paths = (sorted(globlib.glob(pattern))
                 if isinstance(pattern, str) else list(pattern))
        if not paths:
            raise FileNotFoundError(f"no shards match {pattern}")
        self.readers = [ShardReader(p) for p in paths]
        self.index = [(s, i) for s, r in enumerate(self.readers)
                      for i in range(len(r))]
        self.rs = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.index)

    def epoch(self, shuffle: bool = True,
              limit: int | None = None) -> Iterator[dict]:
        order = np.arange(len(self.index))
        if shuffle:
            self.rs.shuffle(order)
        if limit is not None:
            order = order[:limit]
        for o in order:
            s, i = self.index[o]
            yield self.readers[s][i]
