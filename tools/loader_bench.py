"""A/B the host shard-loader: native (C++ mmap) vs Python (zipfile) reader.

Writes a synthetic flagship-schema dataset (fp16 49x2048 image grids,
ragged ids, face/object embeds) and times full epochs through
RecordDataset -> bucket_batches, i.e. the exact host path the trainer
consumes. The number that matters is batches/sec vs the train step time
(71.8 ms single-chip; ~9 ms/chip-step budget at DP8).

    python tools/loader_bench.py [--examples 2048] [--no-pack]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tell_tpu.data.bucketing import BucketingConfig, bucket_batches
from tell_tpu.data.records import RecordDataset, write_shard


def synth(rng, n):
    for i in range(n):
        yield {
            "context_ids": rng.integers(0, 50000, int(rng.integers(80, 512)),
                                        np.int32),
            "caption_ids": rng.integers(0, 50000, int(rng.integers(8, 60)),
                                        np.int32),
            "image_grid": rng.normal(size=(49, 2048)).astype(np.float16),
            "face_embeds": rng.normal(size=(4, 512)).astype(np.float32),
            "obj_embeds": rng.normal(size=(20, 2048)).astype(np.float32),
            "caption": f"caption number {i}",
            "image_hash": f"{i:032x}",
        }


def run_epoch(pattern: str, pack: bool, lazy: bool = False
              ) -> tuple[int, float]:
    ds = RecordDataset(pattern, seed=3)
    cfg = BucketingConfig()
    t0 = time.perf_counter()
    n = 0
    if pack:
        for b in bucket_batches(ds.epoch(lazy=lazy), cfg):
            n += 1
    else:
        for _ in ds.epoch():
            n += 1
    return n, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=2048)
    ap.add_argument("--shard-size", type=int, default=512)
    ap.add_argument("--no-pack", action="store_true",
                    help="time raw example reads without batch packing")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        buf, s = [], 0
        for ex in synth(rng, args.examples):
            buf.append(ex)
            if len(buf) == args.shard_size:
                write_shard(os.path.join(d, f"t-{s:05d}.npz"), buf)
                buf, s = [], s + 1
        if buf:
            write_shard(os.path.join(d, f"t-{s:05d}.npz"), buf)
        pattern = os.path.join(d, "t-*.npz")
        pack = not args.no_pack

        modes = [("nat+gather", "1", True), ("native", "1", False),
                 ("python", "0", False)]
        for mode, env, lazy in modes:
            if lazy and not pack:
                continue
            os.environ["TELL_TPU_NATIVE_IO"] = env
            run_epoch(pattern, pack, lazy)  # warm page cache / import paths
            n, dt = run_epoch(pattern, pack, lazy)
            unit = "batches" if pack else "examples"
            print(f"{mode:10s} {n:6d} {unit} in {dt:7.3f}s  "
                  f"{n / dt:9.1f} {unit}/s  "
                  f"({args.examples / dt:9.1f} examples/s)")


if __name__ == "__main__":
    main()
