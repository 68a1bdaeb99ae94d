"""Engine capacity sweep: saturation point, latency under load, overload.

Rounds 1-3 published only ARRIVAL-CAPPED engine numbers (a fixed stream of
one request / 15 ms that the engine happily kept up with). This tool finds
the numbers a deployment actually needs (VERDICT r3 missing #5):

  capacity      max sustained captions/s — ALL requests queued upfront, the
                engine drains them as fast as the chip allows
  80% load      p50/p95 request latency at an arrival rate of 0.8 x capacity
                (the regime a well-provisioned deployment runs in)
  overload      behavior at 1.2 x capacity: the engine NEVER sheds — excess
                requests queue (submit() is unbounded) and per-request
                latency grows with queue depth; we report the queue-growth
                rate so operators can size admission control in front

Sweeps slots x gen_len. Each (slots, gen_len) pair compiles its own engine
programs, so the default grid is small; the full curve lands in
docs/serving.md. The reference's serving analogue is the ZeroMQ
ventilator/worker fan-out (tell/server/base.py:95-191, ~1 req/s/GPU) and
its generation cap is 100 tokens (transformer_faces_objects.py:407).

Usage (one real chip, ~2-4 min compile per config):
  env -u XLA_FLAGS python tools/engine_capacity.py
  SLOTS=16,32,64 GEN_LENS=16,100 N_MULT=4 python tools/engine_capacity.py

Known duplication: drive_stream here, bench.py::bench_engine's arrival
loop, and tools/engine_bench.py's run_engine are three variants of the
same submit/tick/latency driver with deliberately different contracts
(capacity probing vs one-line driver metric vs micro-batch A/B). When
touching the callback/arrival bookkeeping in one, check the other two.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import jax.random as jr
import numpy as np

SLOTS = [int(s) for s in os.environ.get("SLOTS", "16,32,64").split(",")]
GEN_LENS = [int(s) for s in os.environ.get("GEN_LENS", "16,100").split(",")]
BEAM = int(os.environ.get("BEAM", "5"))
N_MULT = int(os.environ.get("N_MULT", "4"))   # n requests = N_MULT * slots
CHUNK = int(os.environ.get("CHUNK", "8"))


def make_requests(cfg, n, dtype):
    ks = jr.split(jr.PRNGKey(1), 4)
    key_of = {"image": "image_grid", "article": "article",
              "faces": "face_embeds", "obj": "obj_embeds"}
    reqs = []
    for i in range(n):
        req = {}
        for j, spec in enumerate(cfg.decoder.contexts):
            req[key_of[spec.name]] = jr.normal(
                ks[j % 4], (1, spec.max_len, spec.kv_dim), dtype) + i * 1e-4
            if spec.name == "article":
                req["article_mask"] = jnp.zeros((1, spec.max_len), bool)
        reqs.append(req)
    return reqs


def drive_stream(eng, reqs, arrival_s):
    """Offer one request per `arrival_s` (0 = all upfront); returns
    (wall, latencies, max_queue_depth)."""
    lat, t_sub, futs = [], {}, []
    max_q = 0
    t0 = time.perf_counter()
    next_arrival, i = t0, 0
    while i < len(reqs) or any(not f.done() for f in futs):
        now = time.perf_counter()
        while i < len(reqs) and (arrival_s == 0 or now >= next_arrival):
            fut = eng.submit(reqs[i])
            t_sub[id(fut)] = time.perf_counter()
            fut.add_done_callback(
                lambda f, ts=t_sub: lat.append(
                    time.perf_counter() - ts[id(f)]))
            futs.append(fut)
            next_arrival += arrival_s
            i += 1
            now = time.perf_counter()
        max_q = max(max_q, eng.queue.qsize())
        if not eng.tick() and i < len(reqs):
            time.sleep(max(0.0, min(next_arrival - time.perf_counter(),
                                    0.001)))
    return time.perf_counter() - t0, lat, max_q


def _phase_timers(eng):
    """Wrap the engine's host-side phases with wall-clock accumulators so
    a capacity anomaly (the r4 slots=128 collapse) can be ATTRIBUTED:
    how much of the drive wall went to admit dispatches, chunk
    dispatches, and blocking report drains."""
    acc = {"admit_s": 0.0, "chunk_s": 0.0, "drain_block_s": 0.0,
           "admits": 0, "drains_blocked": 0}

    orig_admit, orig_chunk = eng._admit, eng._chunk
    orig_drain = eng._drain_reports

    def admit(*a, **k):
        t0 = time.perf_counter()
        out = orig_admit(*a, **k)
        acc["admit_s"] += time.perf_counter() - t0
        acc["admits"] += 1
        return out

    def chunk(*a, **k):
        t0 = time.perf_counter()
        out = orig_chunk(*a, **k)
        acc["chunk_s"] += time.perf_counter() - t0
        return out

    def drain(block_first=False):
        t0 = time.perf_counter()
        out = orig_drain(block_first)
        dt = time.perf_counter() - t0
        if block_first:
            acc["drain_block_s"] += dt
            acc["drains_blocked"] += 1
        return out

    eng._admit, eng._chunk, eng._drain_reports = admit, chunk, drain
    return acc


def sweep_config(params, cfg, slots, gen_len, dtype):
    from tell_tpu.serving.engine import DecodeEngine
    ecfg = dataclasses.replace(cfg, gen_len=gen_len)
    eng = DecodeEngine(params, ecfg, slots=slots, beam=BEAM,
                       chunk_steps=CHUNK, dtype=dtype)
    n = N_MULT * slots
    reqs = make_requests(cfg, n, dtype)
    eng.warm(reqs[0])                # AOT-compile every admit rung + chunk
    f = eng.submit(reqs[0])          # execution warm
    eng.run_until_drained()
    f.result(timeout=900)

    # --- capacity: saturated (all upfront) ---
    acc = _phase_timers(eng)
    wall, lat, _ = drive_stream(eng, reqs, 0.0)
    capacity = n / wall
    row = {"slots": slots, "beam": BEAM, "gen_len": gen_len, "n": n,
           "capacity_captions_per_sec": round(capacity, 2),
           "saturated_p50_ms": round(
               float(np.percentile(lat, 50)) * 1e3, 1),
           "saturated_wall_s": round(wall, 2),
           "phase_admit_s": round(acc["admit_s"], 2),
           "phase_chunk_dispatch_s": round(acc["chunk_s"], 2),
           "phase_drain_block_s": round(acc["drain_block_s"], 2),
           "chunks": eng.stats["chunks"], "admits": acc["admits"],
           "drains_blocked": acc["drains_blocked"]}

    # --- 80% load: the well-provisioned regime ---
    wall, lat, _ = drive_stream(eng, reqs, 1.0 / (0.8 * capacity))
    row.update({
        "load80_captions_per_sec": round(n / wall, 2),
        "load80_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 1),
        "load80_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1)})

    # --- overload: 1.2x capacity — queue growth, no shedding ---
    wall, lat, max_q = drive_stream(eng, reqs, 1.0 / (1.2 * capacity))
    row.update({
        "overload_captions_per_sec": round(n / wall, 2),
        "overload_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 1),
        "overload_max_queue": max_q,
        "overload_behavior": "queue grows (no shed); latency ~ queue "
                             "depth x slots/capacity"})
    return row


def main():
    import jax

    from tell_tpu.config import CaptionerConfig
    from tell_tpu.models import init_captioner

    cache = os.environ.get("CACHE_DIR", "/tmp/tell_tpu_bench_cache")
    if cache:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    dtype = jnp.bfloat16
    if os.environ.get("TINY") == "1":   # CPU wiring smoke run
        from tell_tpu.config import small_test_config
        cfg = small_test_config()
    else:
        cfg = CaptionerConfig()
    params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    rows = []
    for gen_len in GEN_LENS:
        for slots in SLOTS:
            print(f"# sweeping slots={slots} gen_len={gen_len} ...",
                  file=sys.stderr, flush=True)
            row = sweep_config(params, cfg, slots, gen_len, dtype)
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": rows}))


if __name__ == "__main__":
    main()
