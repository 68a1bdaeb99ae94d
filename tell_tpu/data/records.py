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
    """Lazy npz shard access: np.load keeps the zip handle open for the
    NpzFile's lifetime, and an 800k-example dataset is ~1600 shards — eagerly
    holding every handle blows the default 1024-fd ulimit at train startup.
    The index (lengths + field names) is read once with the file closed
    again; the handle reopens on first access and an LRU of open shards is
    bounded by RecordDataset."""

    def __init__(self, path: str):
        self.path = path
        self._z = None
        with np.load(path, allow_pickle=False) as z:
            self._len = int(z["__len__"])
            self._fields: dict[int, list[str]] = {}
            for key in z.files:
                if key == "__len__":
                    continue
                idx, field = key.split("/", 1)
                self._fields.setdefault(int(idx), []).append(field)

    def open(self):
        if self._z is None:
            self._z = np.load(self.path, allow_pickle=False)

    def close(self):
        if self._z is not None:
            self._z.close()
            self._z = None

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> dict:
        self.open()
        out = {}
        for field in self._fields.get(i, []):
            v = self._z[f"{i}/{field}"]
            if v.dtype.kind == "U" and v.ndim == 0:
                v = str(v)
            out[field] = v
        return out


class LazyExample:
    """Dict-like view of one example that defers field reads to access time.

    Carries (reader, index) instead of materialized arrays so the batch
    packer can gather fields straight from the shard mmap in C++
    (native.gather_pad) — lengths for bucket routing come from the parsed
    .npy headers without touching the data. Materializes transparently on
    item access for any consumer that wants real arrays."""

    __slots__ = ("reader", "i")

    def __init__(self, reader, i: int):
        self.reader = reader
        self.i = i

    def _fields(self) -> list[str]:
        r = self.reader
        if hasattr(r, "fields_of"):
            return r.fields_of(self.i)
        return r._fields.get(self.i, [])

    def keys(self):
        return self._fields()

    def __contains__(self, field: str) -> bool:
        return field in self._fields()

    def __getitem__(self, field: str):
        r = self.reader
        if hasattr(r, "read_field"):
            return r.read_field(self.i, field)
        return r[self.i][field]

    def get(self, field: str, default=None):
        return self[field] if field in self else default

    def field_len(self, field: str) -> int:
        """Leading dimension without reading the data (native readers)."""
        r = self.reader
        if hasattr(r, "field_shape"):
            shp = r.field_shape(self.i, field)
            if shp is not None:
                return shp[0] if shp else 0
        return len(self[field])

    def field_dtype(self, field: str):
        r = self.reader
        if hasattr(r, "field_dtype"):
            return r.field_dtype(self.i, field)
        return None

    def field_shape(self, field: str) -> tuple | None:
        r = self.reader
        if hasattr(r, "field_shape"):
            return r.field_shape(self.i, field)
        return None

    def field_member(self, field: str):
        r = self.reader
        if hasattr(r, "field_member"):
            return r.field_member(self.i, field)
        return None

    def materialize(self) -> dict:
        return self.reader[self.i]


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
        # native (C++ mmap) shard reader when available — one memcpy per
        # field read instead of Python zipfile + CRC; transparent fallback
        # (TELL_TPU_NATIVE_IO=0 forces the Python reader)
        from .native import native_shard_reader
        self.readers = [native_shard_reader(p) for p in paths]
        self.index = [(s, i) for s, r in enumerate(self.readers)
                      for i in range(len(r))]
        self.seed = seed
        self.rs = np.random.RandomState(seed)
        self._open_lru: list[int] = []  # bounded set of open shard handles
        self._max_open = 64

    def __len__(self) -> int:
        return len(self.index)

    def epoch(self, shuffle: bool = True,
              limit: int | None = None,
              process_index: int = 0,
              process_count: int = 1,
              lazy: bool = False,
              epoch_index: int | None = None) -> Iterator[dict]:
        """process_index/count stride the (shared, identically seeded)
        epoch order across multi-host training processes; the order is
        truncated to a multiple of process_count first so every process
        yields the SAME number of examples (unequal counts would deadlock
        the first collective of the step the short process never runs).

        lazy=True yields LazyExample views instead of materialized dicts
        so the bucketing layer can batch-gather fields in C++.

        epoch_index, when given, makes the order a PURE function of
        (seed, epoch_index) instead of consuming the dataset's persistent
        RandomState — required for step-exact mid-epoch resume, where a
        restarted process must reproduce an epoch's order without having
        replayed every earlier epoch's shuffle."""
        order = np.arange(len(self.index))
        if shuffle:
            if epoch_index is not None:
                np.random.RandomState(
                    [self.seed & 0xFFFFFFFF, epoch_index]).shuffle(order)
            else:
                self.rs.shuffle(order)
        if limit is not None:
            order = order[:limit]
        if process_count > 1:
            usable = len(order) - len(order) % process_count
            order = order[process_index:usable:process_count]
        for o in order:
            s, i = self.index[o]
            if s not in self._open_lru:
                self._open_lru.append(s)
                if len(self._open_lru) > self._max_open:
                    self.readers[self._open_lru.pop(0)].close()
            if lazy:
                yield LazyExample(self.readers[s], i)
            else:
                yield self.readers[s][i]
