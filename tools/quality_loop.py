#!/usr/bin/env python
"""Offline quality-loop proof: train -> decode -> score, before vs after.

The reference's correctness was established empirically by training on
NYTimes800k and scoring generations (scripts/compute_metrics.py:61-289).
With zero egress that exact experiment is impossible here, so this runner
executes the SAME pipeline — real `tnt preprocess/train/evaluate/score`
through the argparse entry point — on the committed synthetic corpus
(tests/fixtures/quality/), capturing metrics at two points:

  before: after `--before-epochs` epochs (default 1) — captions are noise,
          CIDEr ~0
  after:  after the config's full num_epochs — the model has memorized the
          training captions; BLEU/ROUGE/CIDEr near max, entity P/R ~1,
          greedy/beam decode reproduces >=90% of training captions

Entity P/R uses the corpus gazetteer (entities.json) as the NER — spaCy
is unavailable in this image; on the synthetic corpus the gazetteer IS
the ground-truth entity inventory.

Interrupted runs resume: each completed phase (preprocess / before /
train) journals its outputs to <run_dir>/quality-phases.json, and
`--resume` skips journaled phases — train continues from the latest
checkpoint via `tnt train -r`, evaluation always re-runs (it is the
product). This replaces the round-3 one-off tools/quality_continue.py.

Usage:
  python tools/quality_loop.py --expt expt/quality/overfit_flagship.yaml \
      --isolate --compile-cache /tmp/xla_cache --out QUALITY_r04.json
  python tools/quality_loop.py ... --resume   # continue an interrupted run
  JAX_PLATFORMS=cpu python tools/quality_loop.py \
      --expt expt/quality/overfit_small.yaml --out /tmp/q.json
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gazetteer_ner(entities: dict):
    """text -> [(entity_text, label)] by longest-first word-boundary match
    (overlaps resolved to the longer span, so 'Zainab Weber' subsumes any
    shorter alias)."""
    names = sorted(entities, key=len, reverse=True)
    pats = [(n, re.compile(r"(?<!\w)" + re.escape(n) + r"(?!\w)"))
            for n in names]

    def ner(text: str) -> list[tuple[str, str]]:
        found, used = [], []
        for name, pat in pats:
            for m in pat.finditer(text):
                s, e = m.span()
                if any(s < ue and us < e for us, ue in used):
                    continue
                used.append((s, e))
                found.append((name, entities[name]))
        return found

    return ner


def _normalize(t: str) -> str:
    return re.sub(r"[^\w\s]", "", t).lower().split().__str__()


def reproduction_and_entities(gen_path: str, entities: dict) -> dict:
    ner = gazetteer_ner(entities)
    from tell_tpu.evalm.entities import entity_precision_recall
    rows = [json.loads(l) for l in open(gen_path, encoding="utf-8")]
    exact = sum(1 for r in rows if r["generation"] == r["caption"])
    norm = sum(1 for r in rows
               if _normalize(r["generation"]) == _normalize(r["caption"]))
    pr = entity_precision_recall(
        [[t for t, _ in ner(r["generation"])] for r in rows],
        [[t for t, _ in ner(r["caption"])] for r in rows])
    return {"n": len(rows),
            "caption_reproduction_exact": exact / max(len(rows), 1),
            "caption_reproduction_normalized": norm / max(len(rows), 1),
            "entity_precision": pr["precision"] * 100,
            "entity_recall": pr["recall"] * 100}


ISOLATE = False
COMPILE_CACHE = None


def _tnt(argv: list[str]) -> dict:
    """Run a tnt subcommand, return its last stdout JSON.

    In-process by default (fast, one jax init). With --isolate each call
    runs in its own subprocess so accelerator memory — train's params +
    optimizer state + compiled programs — is fully released between
    phases: on the 16 GB v5e-1 the flagship train footprint plus a fresh
    evaluate footprint do not coexist (measured RESOURCE_EXHAUSTED at the
    before-evaluate init). The persistent XLA compile cache
    (--compile-cache) keeps the per-phase recompiles cheap."""
    if COMPILE_CACHE and argv[0] in ("train", "evaluate"):
        argv = argv + ["--compile-cache", COMPILE_CACHE]
    if ISOLATE:
        proc = subprocess.run(
            [sys.executable, "-m", "tell_tpu.commands"] + argv,
            capture_output=True, text=True, cwd=REPO,
            env=os.environ.copy())
        assert proc.returncode == 0, (
            f"tnt {argv} -> rc {proc.returncode}\n--- stdout:\n"
            f"{proc.stdout[-4000:]}\n--- stderr:\n{proc.stderr[-4000:]}")
        out = proc.stdout.strip()
    else:
        from tell_tpu.commands.__main__ import main
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(argv)
        assert rc == 0, f"tnt {argv} -> rc {rc}\n{buf.getvalue()}"
        out = buf.getvalue().strip()
    return json.loads(out[out.index("{"):]) if "{" in out else {}


def ensure_features(exp) -> None:
    """Regenerate the uncommitted float blobs (objects.jsonl, grids/) next
    to the committed articles.jsonl when absent."""
    fixture_dir = os.path.dirname(os.path.abspath(exp.data.articles_jsonl))
    need = ((exp.data.objects_jsonl
             and not os.path.exists(exp.data.objects_jsonl))
            or (exp.data.images_dir
                and not os.path.isdir(exp.data.images_dir)))
    if need:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "gen_quality_corpus.py"),
             "--out", fixture_dir, "--features-only"], check=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PALLAS_AXON_POOL_IPS": ""})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--expt", default="expt/quality/overfit_flagship.yaml")
    ap.add_argument("--out", default="QUALITY_r03.json")
    ap.add_argument("--before-epochs", type=int, default=1)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--overrides", default=None,
                    help="JSON merged over the YAML for every tnt call "
                    "(e.g. redirect serialization_dir/shards_dir)")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the run + shards dirs first")
    ap.add_argument("--resume", action="store_true",
                    help="continue an interrupted run: phases journaled in "
                    "<run_dir>/quality-phases.json are skipped; train "
                    "resumes from the latest checkpoint; evaluation "
                    "re-runs")
    ap.add_argument("--isolate", action="store_true",
                    help="run each tnt phase in its own subprocess so "
                    "device memory is released between phases (required "
                    "for the flagship config on a single 16 GB chip)")
    ap.add_argument("--compile-cache", default=None, metavar="DIR",
                    help="persistent XLA compile-cache dir passed to "
                    "every train/evaluate phase")
    args = ap.parse_args()
    global ISOLATE, COMPILE_CACHE
    ISOLATE = args.isolate
    COMPILE_CACHE = args.compile_cache

    def merged(extra: dict) -> list[str]:
        base = json.loads(args.overrides) if args.overrides else {}
        for k, v in extra.items():
            base.setdefault(k, {}).update(v)
        return ["-o", json.dumps(base)] if base else []

    from tell_tpu.config_io import load_experiment
    exp = load_experiment(args.expt, args.overrides)
    ensure_features(exp)
    run_dir = exp.trainer.serialization_dir
    if args.fresh:
        for d in (run_dir, exp.data.shards_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)

    fixture_dir = os.path.dirname(os.path.abspath(exp.data.articles_jsonl))
    with open(os.path.join(fixture_dir, "entities.json"),
              encoding="utf-8") as f:
        entities = json.load(f)

    result = {"expt": args.expt,
              "corpus": {"articles_jsonl": exp.data.articles_jsonl,
                         "n_entities": len(entities)},
              "config": {"num_epochs": exp.trainer.num_epochs,
                         "before_epochs": args.before_epochs,
                         "lr": exp.trainer.lr,
                         "beam": args.beam}}
    gen_path = os.path.join(run_dir, "generations-train.jsonl")

    # phase journal: lets --resume continue an interrupted run without
    # repeating finished phases (and without a hand-driven one-off script)
    journal_path = os.path.join(run_dir, "quality-phases.json")
    journal: dict = {}
    if args.resume and os.path.exists(journal_path):
        with open(journal_path, encoding="utf-8") as jf:
            journal = json.load(jf)

    def save_phase(name: str, payload: dict) -> None:
        journal[name] = payload
        os.makedirs(run_dir, exist_ok=True)
        tmp = journal_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as jf:
            json.dump(journal, jf, indent=2)
        os.replace(tmp, journal_path)

    ckpt_dir = os.path.join(run_dir, "checkpoints")

    def assert_resumable(phase: str) -> None:
        assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir), (
            f"{phase}: no checkpoint in {ckpt_dir} to resume from "
            "(tnt train -r would fail; run without --resume / --fresh "
            "to start over)")

    if "preprocess" in journal:
        result["corpus"]["n_examples"] = journal["preprocess"]["examples"]
        result["preprocess_seconds"] = journal["preprocess"]["seconds"]
    else:
        t0 = time.time()
        _tnt(["preprocess", args.expt, "-s", "train"] + merged({}))
        n = _tnt(["preprocess", args.expt, "-s", "valid"] + merged({}))
        result["corpus"]["n_examples"] = n.get("examples")
        result["preprocess_seconds"] = round(time.time() - t0, 1)
        save_phase("preprocess", {"examples": n.get("examples"),
                                  "seconds": result["preprocess_seconds"]})

    # ---- before: a nearly-untrained checkpoint ----
    if "before" in journal:
        result["before"] = journal["before"]["metrics"]
        result["before_seconds"] = journal["before"]["seconds"]
    else:
        t0 = time.time()
        _tnt(["train", args.expt]
             + merged({"trainer": {"num_epochs": args.before_epochs,
                                   "checkpoint_every": 1}}))
        before = _tnt(["evaluate", args.expt, "-s", "train"] + merged({}))
        before.update(reproduction_and_entities(gen_path, entities))
        shutil.copy(gen_path,
                    os.path.join(run_dir, "generations-before.jsonl"))
        result["before"] = before
        result["before_seconds"] = round(time.time() - t0, 1)
        save_phase("before", {"metrics": before,
                              "seconds": result["before_seconds"]})

    before = result["before"]

    # ---- after: the full overfit run (resumes the same checkpoints) ----
    if "train" in journal:
        result["train"] = journal["train"]["result"]
        result["train_seconds"] = journal["train"]["seconds"]
    else:
        assert_resumable("train")
        t0 = time.time()
        train_res = _tnt(["train", args.expt, "-r"] + merged({}))
        result["train"] = train_res
        result["train_seconds"] = round(time.time() - t0, 1)
        save_phase("train", {"result": train_res,
                             "seconds": result["train_seconds"]})

    t0 = time.time()
    after_greedy = _tnt(["evaluate", args.expt, "-s", "train"] + merged({}))
    after_greedy.update(reproduction_and_entities(gen_path, entities))
    shutil.copy(gen_path, os.path.join(run_dir,
                                       "generations-after-greedy.jsonl"))
    result["after_greedy"] = after_greedy

    after_beam = _tnt(["evaluate", args.expt, "-s", "train",
                       "--beam", str(args.beam)] + merged({}))
    after_beam.update(reproduction_and_entities(gen_path, entities))
    shutil.copy(gen_path, os.path.join(
        run_dir, f"generations-after-beam{args.beam}.jsonl"))
    result["after_beam"] = after_beam

    # the standalone re-scorer over the beam generations (tnt score)
    result["score_rescore_beam"] = _tnt([
        "score", os.path.join(run_dir,
                              f"generations-after-beam{args.beam}.jsonl")])
    result["evaluate_seconds"] = round(time.time() - t0, 1)

    # ---- numerics A/Bs at TRAINED logit margins ----
    # Random-weight near-ties are the known worst case for the int8 K/V
    # default and the opt-in approximate top-k; the trained checkpoint is
    # where the agreement number actually matters for deployments. Flip
    # each lever, re-decode, and record caption-level agreement vs the
    # default decode above.
    ref_gens = [json.loads(l)["generation"] for l in open(
        os.path.join(run_dir, f"generations-after-beam{args.beam}.jsonl"),
        encoding="utf-8")]
    for name, var, flipped in (
            ("kv8_flipped", "TELL_TPU_KV8",
             "0" if after_beam.get("kv_cache_mode") == "int8" else "1"),
            ("approx_topk", "TELL_TPU_APPROX_TOPK",
             "0" if after_beam.get("topk_mode") == "approx" else "1"),
            # round-5 TPU default: tanh GELU in the frozen article
            # encoder (backbones/roberta.py::fast_gelu_mode)
            ("fast_gelu", "TELL_TPU_FAST_GELU",
             "erf" if after_beam.get("gelu_mode") == "tanh" else "tanh")):
        prev = os.environ.get(var)
        os.environ[var] = flipped
        try:
            m = _tnt(["evaluate", args.expt, "-s", "train",
                      "--beam", str(args.beam)] + merged({}))
        finally:
            if prev is None:
                os.environ.pop(var, None)
            else:
                os.environ[var] = prev
        gens = [json.loads(l)["generation"]
                for l in open(gen_path, encoding="utf-8")]
        agree = (sum(a == b for a, b in zip(ref_gens, gens))
                 / max(len(ref_gens), 1))
        result[f"ab_{name}"] = {
            "env": {var: flipped},
            "caption_agreement_vs_default": round(agree, 4),
            "cider": m.get("cider"),
            "kv_cache_mode": m.get("kv_cache_mode"),
            "topk_mode": m.get("topk_mode"),
            "gelu_mode": m.get("gelu_mode"),
        }

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({
        "cider_before": before.get("cider"),
        "cider_after_beam": after_beam.get("cider"),
        "reproduction_after_beam":
            after_beam["caption_reproduction_normalized"],
        "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
