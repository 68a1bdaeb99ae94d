"""Evaluation command: decode a split, write generations.jsonl, score.

Replaces /root/reference/tell/commands/evaluate.py:31-355 +
scripts/compute_metrics.py: streams batches through the jitted decode
(greedy or beam), writes one JSON line per sample (schema mirrors the
reference's generations.jsonl: caption, generation, web_url, ...), then
computes BLEU-1..4, ROUGE-L, CIDEr-D and entity P/R in one pass — no
separate offline scorer needed, though `tnt score` can re-score any
generations.jsonl.
"""
from __future__ import annotations

import json
import os
import pickle
import time

import jax
import numpy as np

from ..config_io import ExperimentConfig
from ..data.bucketing import bucket_batches
from ..data.records import RecordDataset
from ..data.tokenizer import RobertaTokenizer
from ..evalm import CiderScorer, bleu_scores, entity_precision_recall, rouge_l
from ..evalm.entities import reported_entity_metrics, spacy_analyze


def persistent_analyze(analyze, cache_path: str):
    """Disk-persisted memo around a text -> analysis function.

    The reference pickles spaCy docs to data/<ds>/evaluation_cache.pkl and
    reports ~30 min saved per re-run (evaluate.py:101-110); we persist the
    extracted (entities, propns) tuples instead — tiny, stable across
    spaCy versions, and shared by every checkpoint evaluated against the
    same split. Returns (cached_analyze, flush); flush() writes the cache
    back atomically iff new texts were parsed."""
    cache: dict = {}
    if os.path.exists(cache_path):
        try:
            with open(cache_path, "rb") as cf:
                cache = pickle.load(cf)
        except Exception:
            cache = {}
    n_loaded = len(cache)

    def cached(t):
        r = cache.get(t)
        if r is None:
            r = analyze(t)
            cache[t] = r
        return r

    def flush():
        if len(cache) == n_loaded:
            return
        tmp = cache_path + ".tmp"
        with open(tmp, "wb") as cf:
            pickle.dump(cache, cf, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, cache_path)

    return cached, flush


def evaluate_split(exp: ExperimentConfig, params: dict, frozen: dict,
                   tokenizer: RobertaTokenizer, split: str = "test",
                   beam_size: int = 1, out_dir: str | None = None,
                   limit: int | None = None, adapter=None) -> dict:
    if adapter is None:
        from ..models.registry import get_model
        adapter = get_model(exp.model_type, exp.model)
    cfg = adapter.config
    out_dir = out_dir or exp.trainer.serialization_dir
    os.makedirs(out_dir, exist_ok=True)
    gen_path = os.path.join(out_dir, f"generations-{split}.jsonl")

    # Encode (frozen towers: windowed RoBERTa-large + optional ResNet) and
    # decode compile as SEPARATE programs. A monolithic encode+decode jit
    # at flagship dims is a very large XLA graph — slow to compile and the
    # known way to stress the remote compiler (verify notes) — and the
    # quality loop evaluates the same split 5x with different decode
    # numerics (greedy/beam/lever A/Bs): split, the big tower program is
    # identical across passes while only the small decode graph re-traces.
    # Results stay on device between the two dispatches.
    encode = jax.jit(lambda fr, b: adapter.encode(fr, b))
    if beam_size > 1:
        assert adapter.beam is not None,             "beam search is implemented for the captioner and modern models "             "(the reference likewise decodes pointer/LSTM greedily)"
        decode_enc = jax.jit(lambda p, eb: adapter.beam(
            p, cfg, eb, beam_size=beam_size)["token_ids"][:, 0])
    else:
        decode_enc = jax.jit(lambda p, eb: adapter.generate(
            p, cfg, eb)["token_ids"])
    decode = lambda p, b: decode_enc(p, encode(frozen, b))  # noqa: E731

    ds = RecordDataset(os.path.join(exp.data.shards_dir,
                                    f"{split}-*.npz"), seed=0)
    # one spaCy model + one CACHED parse per text serves both the entity
    # fields and the PROPN name lists (the reference's evaluation_cache.pkl
    # "saves ~30 min"; loading two models / parsing four times per sample
    # would quadruple the host cost)
    analyze = spacy_analyze()
    ner = propn = flush_cache = None
    if analyze is not None:
        analyze, flush_cache = persistent_analyze(
            analyze, os.path.join(exp.data.shards_dir,
                                  "evaluation_cache.pkl"))
        ner = lambda t: analyze(t)[0]      # noqa: E731
        propn = lambda t: analyze(t)[1]    # noqa: E731
    cands, refs = [], []
    entries = []
    t0 = time.time()
    n = 0
    from ..evalm.readability import (get_narrative_productivity,
                                     get_readability_scores)
    with open(gen_path, "w", encoding="utf-8") as f:
        def emit(gen_ids, real, captions, hashes, urls, caption_ids):
            nonlocal n
            for i in range(len(gen_ids)):
                if not real[i]:
                    continue
                gen_text = tokenizer.decode(gen_ids[i])
                ref_text = (str(captions[i]) if captions is not None else
                            tokenizer.decode(caption_ids[i]))
                entry = {
                    "caption": ref_text,
                    "generation": gen_text,
                    "image_hash": (str(hashes[i]) if hashes is not None
                                   else None),
                    "web_url": (str(urls[i]) if urls is not None else None),
                    # per-sample analysis fields of the reference's
                    # generations.jsonl (evaluate.py:200-218)
                    "caption_readability":
                        get_readability_scores(ref_text),
                    # reference key names: gen_readability / gen_np
                    # (evaluate.py:215-217)
                    "gen_readability":
                        get_readability_scores(gen_text),
                    "caption_np": get_narrative_productivity(ref_text),
                    "gen_np": get_narrative_productivity(gen_text),
                }
                if ner is not None:
                    entry["caption_entities"] = [
                        {"text": t, "label": l} for t, l in ner(ref_text)]
                    entry["generated_entities"] = [
                        {"text": t, "label": l} for t, l in ner(gen_text)]
                if propn is not None:
                    entry["caption_names"] = propn(ref_text)
                    entry["generated_names"] = propn(gen_text)
                entries.append(entry)
                f.write(json.dumps(entry) + "\n")
                cands.append(gen_text)
                refs.append([ref_text])
                n += 1

        # one-deep pipeline: dispatch batch k+1's decode (async under jax),
        # then do batch k's host work (BPE decode, readability, spaCy)
        # while the device runs — the reference serialized the two
        # (evaluate.py:131-162: model(**batch) then write_to_json per batch)
        pending = None
        t_first, n_first = None, 0  # end of the first realized batch
        batches_done = 0
        for batch in bucket_batches(ds.epoch(lazy=True, shuffle=False, limit=limit),
                                    exp.bucketing, include_meta=True):
            real = batch.pop("real", np.ones(len(batch["caption_ids"]),
                                             bool))
            captions = batch.pop("caption", None)
            hashes = batch.pop("image_hash", None)
            urls = batch.pop("web_url", None)
            gen_dev = decode(params, batch)   # async dispatch
            if pending is not None:
                emit(np.asarray(pending[0]), *pending[1:])
                batches_done += 1
                if t_first is None:
                    t_first, n_first = time.time(), n
            pending = (gen_dev, real, captions, hashes, urls,
                       batch["caption_ids"])
        if pending is not None:
            emit(np.asarray(pending[0]), *pending[1:])
            batches_done += 1
            if t_first is None:
                t_first, n_first = time.time(), n
    dt = time.time() - t0

    if flush_cache is not None:
        flush_cache()

    metrics = score_generations(cands, refs)
    if entries and "caption_entities" in entries[0]:
        metrics.update(reported_entity_metrics(entries))
    metrics["n_samples"] = n
    metrics["captions_per_sec"] = n / dt if dt > 0 else 0.0
    # Steady-state throughput: total-wall captions/sec above is dominated
    # by the one-off XLA trace+compile of the encode/decode programs when
    # the split is small (the quality corpus is 2 batches: compile is
    # ~100x the per-batch run cost), which under-reports what the hardware
    # sustains. Attribute compile to the first batch and report the
    # post-first-batch rate alongside; equal to the total-wall number when
    # the split is too small to hold a steady window. The window needs at
    # least TWO post-first batches: the pipeline dispatches batch k+1's
    # decode before t_first is stamped, so a one-batch "window" starts
    # with device time already partially elapsed and reads high (ADVICE
    # r4) — with >=2 batches the window fully contains at least one
    # dispatched-inside-the-window batch and the bias amortizes.
    steady_dt = dt - (t_first - t0) if t_first is not None else 0.0
    metrics["captions_per_sec_steady"] = (
        (n - n_first) / steady_dt
        if n > n_first and steady_dt > 0 and batches_done - 1 >= 2
        else metrics["captions_per_sec"])
    # attribute the scores to the decode numerics they were produced with
    # (the int8 K/V cache and approximate top-k are default-on on TPU and
    # change decode output vs the exact fp path)
    from ..models.backbones.roberta import fast_gelu_mode
    from ..models.decoder import kv_cache_mode
    from ..ops.adaptive import topk_mode
    metrics["kv_cache_mode"] = kv_cache_mode()
    metrics["topk_mode"] = topk_mode()
    metrics["gelu_mode"] = fast_gelu_mode()
    with open(os.path.join(out_dir, f"evaluate-metrics-{split}.json"),
              "w") as f:
        json.dump(metrics, f, indent=2)
    return metrics


def score_generations(cands: list[str], refs: list[list[str]],
                      ner=None) -> dict:
    import re
    strip = lambda t: re.sub(r"[^\w\s]", "", t)  # noqa: E731  (ref :106)
    bleus = bleu_scores([strip(c) for c in cands],
                        [[strip(r) for r in rs] for rs in refs])
    cider = CiderScorer()
    for c, rs in zip(cands, refs):
        cider.append(strip(c), [strip(r) for r in rs])
    cider_mean, _ = cider.compute()
    from ..evalm.meteor import MeteorConfig, corpus_meteor
    # METEOR is reported as TWO keys side by side:
    #   meteor_exact_stem  reduced stage set (no data tables) — stable,
    #                      comparable across environments, NOT comparable
    #                      to published jar METEOR
    #   meteor             full four-stage set using the loaded tables
    #                      (curated shipped pair by default; bigger tables
    #                      via TELL_TPU_METEOR_DATA); typically >= the
    #                      reduced score (extra matches enter at weight
    #                      0.8/0.6 where exact/stem fail — though the
    #                      fragmentation penalty can in principle drop a
    #                      score when an added match raises the chunk
    #                      ratio), and with the curated-small tables
    #                      approximately a lower bound on the jar's value
    #                      (see evalm/data/meteor/README.md's honesty note)
    sc = [strip(c) for c in cands]
    sr = [[strip(r) for r in rs] for rs in refs]
    mcfg = MeteorConfig.from_data_dir()
    metrics = {
        "bleu-1": bleus[0] * 100, "bleu-2": bleus[1] * 100,
        "bleu-3": bleus[2] * 100, "bleu-4": bleus[3] * 100,
        "rouge-l": rouge_l(sc, sr) * 100,
        "meteor_exact_stem": corpus_meteor(
            sc, sr, MeteorConfig(function_words=mcfg.function_words)) * 100,
        # CiderScorer.compute is pycocoevalcap-scale (x10 internal); the
        # reference's tables display that value x100 (generate_tables.py:32),
        # so "54" == pycoco 0.54. Report on the same displayed scale.
        "cider": cider_mean * 100,
    }
    if mcfg.full_stages:
        metrics["meteor"] = corpus_meteor(sc, sr, mcfg) * 100
    if ner is not None:
        gen_ents = [[t for t, _ in ner(c)] for c in cands]
        ref_ents = [[t for t, _ in ner(rs[0])] for rs in refs]
        pr = entity_precision_recall(gen_ents, ref_ents)
        metrics["entity_precision"] = pr["precision"] * 100
        metrics["entity_recall"] = pr["recall"] * 100
    return metrics


def score_file(path: str, counters_path: str | None = None) -> dict:
    """Re-score a generations.jsonl; with --counters (name_counters.pkl from
    tools/compute_statistics.py) also reports the rare-name families
    (compute_metrics.py:125-216)."""
    cands, refs, entries = [], [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            d = json.loads(line)
            cands.append(d["generation"])
            refs.append([d["caption"]])
            entries.append(d)
    metrics = score_generations(cands, refs)
    if entries and "caption_entities" in entries[0]:
        counters = None
        if counters_path:
            import pickle
            with open(counters_path, "rb") as cf:
                counters = pickle.load(cf)
        metrics.update(reported_entity_metrics(entries, counters))
    return metrics
