"""Caption metric tests: identities, hand-computed goldens, and an NLTK
cross-check for BLEU."""
import math
import os

import pytest

from tell_tpu.evalm import (CiderScorer, bleu_scores, entity_precision_recall,
                            rouge_l, sentence_bleu)


def test_bleu_identity():
    b = bleu_scores(["the cat sat on the mat"], [["the cat sat on the mat"]])
    for x in b:
        assert abs(x - 1.0) < 1e-6


def test_bleu_disjoint():
    b = bleu_scores(["aa bb cc dd"], [["ee ff gg hh"]])
    assert all(x < 1e-3 for x in b)


def test_bleu_matches_nltk_corpus():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu
    cands = ["the cat sat on the mat today",
             "a quick brown fox jumps over a lazy dog",
             "news captioning is fun"]
    refs = [["the cat sat on a mat today"],
            ["the quick brown fox jumped over the lazy dog"],
            ["news captioning is really fun"]]
    ours = bleu_scores(cands, refs)[3]
    theirs = corpus_bleu([[r.split() for r in rs] for rs in refs],
                         [c.split() for c in cands])
    assert abs(ours - theirs) < 1e-3


def test_bleu_brevity_penalty():
    # candidate shorter than reference gets penalized
    short = bleu_scores(["the cat"], [["the cat sat on the mat"]])[0]
    assert short < math.exp(1 - 6 / 2) + 0.01


def test_rouge_identity_and_order():
    assert abs(rouge_l(["a b c d"], [["a b c d"]]) - 1.0) < 1e-6
    good = rouge_l(["the cat sat on the mat"], [["the cat sat on a mat"]])
    bad = rouge_l(["mat the on sat cat the"], [["the cat sat on a mat"]])
    assert good > bad > 0


def test_cider_identity_vs_disjoint():
    sc = CiderScorer()
    sc.append("the mayor spoke at city hall", ["the mayor spoke at city hall"])
    sc.append("a dog in a park", ["a cat on a sofa"])
    mean, scores = sc.compute()
    assert scores[0] > 5.0          # near-max (10) for identity
    assert scores[1] < scores[0]
    assert abs(mean - (scores[0] + scores[1]) / 2) < 1e-9


def test_cider_rewards_rare_ngrams():
    """Matching a rare entity n-gram scores higher than matching common
    stop-words (the tf-idf property that makes CIDEr entity-sensitive)."""
    sc = CiderScorer()
    refs = [["president obama visited paris"],
            ["the cat sat on the mat"],
            ["the dog ran in the park"],
            ["the bird flew over the house"]]
    sc.append("president obama", refs[0])
    sc.append("the the", refs[1])
    for i in (2, 3):
        sc.append(refs[i][0], refs[i])
    _, scores = sc.compute()
    assert scores[0] > scores[1]


def test_entity_precision_recall():
    out = entity_precision_recall(
        gen_entities=[["Obama", "Paris"], ["IBM"]],
        ref_entities=[["Obama", "Merkel"], ["IBM", "Armonk"]])
    assert abs(out["precision"] - 2 / 3) < 1e-9
    assert abs(out["recall"] - 2 / 4) < 1e-9


def test_reported_entity_metrics_families_and_rare():
    from collections import Counter
    from tell_tpu.evalm.entities import reported_entity_metrics
    entries = [{
        "caption_entities": [
            {"text": "Anna Smith", "label": "PERSON"},
            {"text": "Milan", "label": "GPE"},
            {"text": "Acme", "label": "ORG"}],
        "generated_entities": [
            {"text": "Anna Smith", "label": "PERSON"},
            {"text": "Paris", "label": "GPE"}],
    }]
    counters = {"caption": Counter({"Milan": 5}), "context": Counter()}
    m = reported_entity_metrics(entries, counters)
    assert m["Entity person - recall"]["percentage"] == 1.0
    assert m["Entity person - precision"]["percentage"] == 1.0
    assert m["Entity GPE - recall"]["percentage"] == 0.0
    assert m["Entity ORG - precision"]["total"] == 0
    # fallback name unit = single tokens of the spans (the reference's
    # PROPN-token unit, evaluate.py:234-239): caption names are
    # Anna, Smith, Milan, Acme; generated names Anna, Smith, Paris
    assert m["All names - recall"]["count"] == 2  # Anna, Smith
    assert m["All names - recall"]["total"] == 4
    # rare = tokens not in the train counter: Anna, Smith, Acme (not Milan)
    assert m["Caption rare names - recall"]["total"] == 3
    assert m["Caption rare names - recall"]["count"] == 2


def test_persistent_analyze_cache(tmp_path):
    """Disk-persisted spaCy-parse cache (reference evaluation_cache.pkl
    analogue): second run hits the pickle, flush is atomic + dirty-gated."""
    from tell_tpu.commands.evaluate import persistent_analyze

    calls = []

    def fake_analyze(t):
        calls.append(t)
        return ((t.upper(), "PERSON"),), (t,)

    path = str(tmp_path / "evaluation_cache.pkl")
    an, flush = persistent_analyze(fake_analyze, path)
    assert an("alice") == ((("ALICE", "PERSON"),), ("alice",))
    assert an("alice")[1] == ("alice",)   # memoized: no second parse
    assert calls == ["alice"]
    flush()
    assert os.path.exists(path)

    # fresh instance: served from disk, analyze never called
    calls2 = []
    an2, flush2 = persistent_analyze(
        lambda t: calls2.append(t) or ((), ()), path)
    assert an2("alice") == ((("ALICE", "PERSON"),), ("alice",))
    assert calls2 == []
    before = os.stat(path).st_mtime_ns
    flush2()                               # nothing new: no rewrite
    assert os.stat(path).st_mtime_ns == before

    # corrupt cache file degrades to a cold start, not a crash
    with open(path, "wb") as f:
        f.write(b"\x00garbage")
    an3, _ = persistent_analyze(fake_analyze, path)
    assert an3("bob")[1] == ("bob",)
