"""Offline quality-loop proof (the CIDEr north-star's offline stand-in).

Runs the REAL pipeline — `tnt preprocess -> train -> evaluate -> score`
through tools/quality_loop.py — on the committed synthetic corpus
(tests/fixtures/quality/) with the CPU-sized flagship-family config, and
asserts the loop MOVES the metrics: CIDEr rises from ~0 (1-epoch
checkpoint) to near its identity maximum, beam-5 decode reproduces >=90%
of the training captions, and gazetteer entity P/R reaches ~1. The
reference established its correctness through exactly this empirical loop
(scripts/compute_metrics.py:61-289); this is the offline-feasible
equivalent. ~8 minutes on CPU — listed in slow_tests.txt.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_quality_loop_overfit_small(tmp_path):
    out = tmp_path / "quality.json"
    ov = {"trainer": {"serialization_dir": str(tmp_path / "run")},
          "data": {"shards_dir": str(tmp_path / "shards")}}
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "quality_loop.py"),
         "--expt", os.path.join(ROOT, "expt/quality/overfit_small.yaml"),
         "--out", str(out), "--overrides", json.dumps(ov)],
        capture_output=True, text=True, timeout=2700, env=env, cwd=ROOT)
    assert r.returncode == 0, r.stderr[-3000:]
    q = json.loads(out.read_text())

    assert q["corpus"]["n_examples"] == 32
    before, after = q["before"], q["after_beam"]
    # before: a 1-epoch model scores ~0 (repo "cider" is pycoco x100, so
    # identity ~1000 and the reference's published 54 is 0.54 there)
    assert before["cider"] < 50, before
    assert before["caption_reproduction_normalized"] < 0.2
    # after: training through the same CLI drove the metrics to near-max
    assert after["cider"] > 800, after
    assert after["bleu-4"] > 90
    assert after["rouge-l"] > 90
    assert after["caption_reproduction_normalized"] >= 0.9
    assert after["entity_precision"] > 90
    assert after["entity_recall"] > 90
    # greedy decode agrees (memorized distribution is peaked)
    assert q["after_greedy"]["caption_reproduction_normalized"] >= 0.9
    # the standalone `tnt score` re-scorer agrees with evaluate's numbers
    assert abs(q["score_rescore_beam"]["cider"] - after["cider"]) < 1.0
    # scores are attributed to the decode numerics that produced them
    assert after["kv_cache_mode"] in ("fp", "int8", "int4")

    # --resume on the finished run dir: the journaled phases (preprocess /
    # before / train) are skipped — their numbers come from
    # <run_dir>/quality-phases.json — while evaluation re-runs against the
    # final checkpoint and reproduces the same story. This is the path
    # that replaced the round-3 one-off quality_continue.py.
    journal = json.loads(
        (tmp_path / "run" / "quality-phases.json").read_text())
    assert {"preprocess", "before", "train"} <= set(journal)
    out2 = tmp_path / "quality-resume.json"
    r2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "quality_loop.py"),
         "--expt", os.path.join(ROOT, "expt/quality/overfit_small.yaml"),
         "--out", str(out2), "--overrides", json.dumps(ov), "--resume"],
        capture_output=True, text=True, timeout=2700, env=env, cwd=ROOT)
    assert r2.returncode == 0, r2.stderr[-3000:]
    q2 = json.loads(out2.read_text())
    assert q2["before"] == q["before"]          # journaled, not re-trained
    assert q2["train"] == q["train"]
    assert q2["after_beam"]["caption_reproduction_normalized"] >= 0.9
