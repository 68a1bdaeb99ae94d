"""bench.py contract test: the driver runs it at round end and records its
single JSON line — a silent breakage there loses the round's headline
metric, so exercise the full flow at tiny CPU shapes."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.update(BENCH_BATCH="2", BENCH_GEN_LEN="4", BENCH_REPS="1",
               BENCH_BEAM="1", BENCH_DEVICE_TIMEOUT="0",
               # tiny companion-metric shapes so the CPU run stays fast
               BENCH_LAT_B="2", BENCH_LAT_LEN="4",
               BENCH_ENGINE_SLOTS="2", BENCH_ENGINE_N="4",
               BENCH_ENGINE_LEN="4",
               BENCH_ENGINE_CAP_SLOTS="2", BENCH_ENGINE_CAP_LEN="4",
               BENCH_ENGINE_CAP_N="4",
               # flagship-dims stages can't run at CPU test scale: the
               # e2e stage skips (headline falls back to decode-only,
               # labeled) and the train subprocess records its skip
               BENCH_E2E="0", BENCH_TRAIN_EXTRA="0")
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, timeout=540,
                         env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
    # companion metrics ride the same line (driver records one object):
    # p50 latency, engine sustained latency, and the int8-KV A/B guard
    assert rec["p50_caption_latency_ms_beam1_b2_len4"] > 0
    assert rec["engine_p50_latency_ms"] > 0
    assert rec["engine_latency_probe_captions_per_sec"] > 0
    assert rec["engine_offered_load_captions_per_sec"] > 0
    assert rec["engine_max_captions_per_sec_len4"] > 0
    assert rec["train_bench"] == "skipped (BENCH_TRAIN_EXTRA=0)"
    assert 0.0 <= rec["kv8_token_agreement"] <= 1.0
    assert rec["kv_cache_mode"] in ("fp", "int8", "int4")
    assert 0.0 <= rec["approx_topk_token_agreement"] <= 1.0
    assert rec["topk_mode"] in ("exact", "approx")
