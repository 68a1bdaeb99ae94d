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
               BENCH_BEAM="1", BENCH_DEVICE_TIMEOUT="0")
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
