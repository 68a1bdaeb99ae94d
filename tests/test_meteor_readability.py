"""METEOR + readability/TTR metric tests."""
import math

import pytest

from tell_tpu.evalm.meteor import corpus_meteor, meteor, meteor_single
from tell_tpu.evalm.readability import (
    count_syllables, get_narrative_productivity, get_readability_scores,
    maas,
)


def test_meteor_identity():
    s = "the quick brown fox jumps over the lazy dog"
    # perfect match: P=R=1, one chunk, penalty = 0.5*(1/9)^3
    expected = 1.0 * (1 - 0.5 * (1 / 9) ** 3)
    assert meteor_single(s, s) == pytest.approx(expected)


def test_meteor_disjoint_zero():
    assert meteor_single("aaa bbb", "ccc ddd") == 0.0
    assert meteor_single("", "ref") == 0.0


def test_meteor_orders_quality():
    ref = "the cat sat on the mat"
    good = "the cat sat on the mat"
    ok = "the cat sat on a rug"
    bad = "dogs run fast"
    s_good = meteor(good, [ref])
    s_ok = meteor(ok, [ref])
    s_bad = meteor(bad, [ref])
    assert s_good > s_ok > s_bad


def test_meteor_stem_stage():
    # "jumping"/"jumps" only match through the Porter stem stage
    with_stem = meteor_single("the dog jumping", "the dog jumps")
    assert with_stem > meteor_single("the dog walking", "the dog jumps")


def test_meteor_multiref_max():
    refs = ["a completely different sentence", "the cat sat"]
    assert meteor("the cat sat", refs) == meteor_single("the cat sat",
                                                        refs[1])


def test_corpus_meteor_mean():
    c = ["the cat", "a dog"]
    r = [["the cat"], ["a dog"]]
    assert corpus_meteor(c, r) == pytest.approx(
        (meteor(c[0], r[0]) + meteor(c[1], r[1])) / 2)


def test_syllables():
    assert count_syllables("cat") == 1
    assert count_syllables("table") == 2
    assert count_syllables("readability") >= 4
    assert count_syllables("the") == 1


def test_readability_keys_and_sanity():
    simple = "The cat sat. The dog ran. It was fun."
    complex_ = ("Notwithstanding institutional heterogeneity, comprehensive "
                "internationalization necessitates extraordinary "
                "organizational accountability mechanisms.")
    rs = get_readability_scores(simple)
    rc = get_readability_scores(complex_)
    assert set(rs) == {
        "flesch_reading_ease", "flesch_kincaid_grade", "gunning_fog",
        "smog_index", "automated_readability_index", "coleman_liau_index",
        "linsear_write_formula", "dale_chall_readability_score",
        "text_standard", "difficult_words"}
    assert rs["flesch_reading_ease"] > rc["flesch_reading_ease"]
    assert rs["flesch_kincaid_grade"] < rc["flesch_kincaid_grade"]
    assert rc["difficult_words"] > 0.5


def test_ttr_family():
    np_ = get_narrative_productivity("the cat and the dog and the bird")
    # 8 words (incl. repeats), 5 unique -> basic ttr
    assert np_["basic_ttr"] == pytest.approx(5 / 8)
    assert np_["root_ttr"] == pytest.approx(5 / math.sqrt(8))
    assert np_["summer"] is None  # reference quirk: no return value
    assert 0 < np_["maas"] <= 0.2
    assert maas(1, 1) == 0.2


def test_score_generations_includes_meteor():
    from tell_tpu.commands.evaluate import score_generations
    m = score_generations(["the cat sat"], [["the cat sat"]])
    assert m["meteor"] > 90
    assert m["bleu-1"] > 99
