"""METEOR-1.5 + readability/TTR metric tests.

Scores are hand-computed from the METEOR-1.5 formulation (module weights
exact 1.0 / stem 0.6 / synonym 0.8 / paraphrase 0.6; alpha=0.85,
beta=0.2, gamma=0.6, delta=0.75, content/function word weighting).
"""
import math

import pytest

from tell_tpu.evalm.meteor import (
    MeteorConfig, corpus_meteor, meteor, meteor_single, sentence_stats,
)
from tell_tpu.evalm.readability import (
    count_syllables, get_narrative_productivity, get_readability_scores,
    maas,
)

CFG = MeteorConfig()


def test_meteor_identity():
    # perfect match in one chunk covering everything: penalty zeroed,
    # P = R = 1 -> score 1
    s = "the quick brown fox jumps over the lazy dog"
    assert meteor_single(s, s) == pytest.approx(1.0)


def test_meteor_disjoint_zero():
    assert meteor_single("aaa bbb", "ccc ddd") == 0.0
    assert meteor_single("", "ref") == 0.0


def test_meteor_hand_computed_partial():
    """cand 'the cat sat on a rug' vs ref 'the cat sat on the mat':
    4 exact matches (the/cat/sat/on) in one run; hand-derived weighted
    P = R = 2/3, F = 2/3, frag = 1/4."""
    cand, ref = "the cat sat on a rug", "the cat sat on the mat"
    # weights: function 0.25 (the/on/a), content 0.75 (cat/sat/rug/mat)
    m = 0.25 + 0.75 + 0.75 + 0.25              # the + cat + sat + on
    len_c = m + 0.25 + 0.75                    # + a + rug
    len_r = m + 0.25 + 0.75                    # + the + mat
    p, r = m / len_c, m / len_r
    f_mean = p * r / (CFG.alpha * p + (1 - CFG.alpha) * r)
    pen = CFG.gamma * (1 / 4) ** CFG.beta      # 1 chunk, 4 matched words
    assert meteor_single(cand, ref) == pytest.approx(f_mean * (1 - pen))


def test_meteor_fragmentation_adversarial_reversal():
    """Fully reversed content order: every word matches (P = R = 1) but
    the alignment splits into 3 chunks of 3 matched words, so
    frag = 3/3 = 1 and the penalty hits its gamma ceiling:
    score = 1 * (1 - gamma * 1**beta) = 1 - 0.6 = 0.4."""
    st = sentence_stats("dog bites man", "man bites dog", CFG)
    assert st.m_c == pytest.approx(3 * 0.75)
    assert st.m_r == pytest.approx(3 * 0.75)
    assert st.chunks == 3
    assert st.n_matched == pytest.approx(3.0)
    assert meteor_single("dog bites man", "man bites dog") == \
        pytest.approx(0.4)


def test_meteor_hand_computed_duplicate_words_diagonal():
    """Duplicate-word alignment exercises the diagonal preference:
    cand 'the cat the mat' vs ref 'the cat sat on the mat'. The first
    'the' takes ref position 0 (closest to the run start), the second
    takes position 4, giving chunks {the cat} and {the mat}:
    m_c = m_r = 2.0, len_c = 2.0, len_r = 3.0, chunks = 2 over 4
    matched words."""
    cand, ref = "the cat the mat", "the cat sat on the mat"
    st = sentence_stats(cand, ref, CFG)
    assert st.m_c == pytest.approx(2.0)
    assert st.m_r == pytest.approx(2.0)
    assert st.len_c == pytest.approx(2.0)
    assert st.len_r == pytest.approx(3.0)
    assert st.chunks == 2
    assert st.n_matched == pytest.approx(4.0)
    p, r = 1.0, 2.0 / 3.0
    f_mean = p * r / (CFG.alpha * p + (1 - CFG.alpha) * r)
    pen = CFG.gamma * (2 / 4) ** CFG.beta
    assert meteor_single(cand, ref) == pytest.approx(f_mean * (1 - pen))


def test_meteor_full_coverage_single_chunk_zeroes_penalty():
    """The jar zeroes fragmentation only when ONE chunk covers BOTH
    sides completely — a single chunk with leftover words still pays."""
    # full coverage through the stem stage: chunks -> 0, score = 0.6
    st = sentence_stats("cats running", "cat runs", CFG)
    assert st.chunks == 0
    assert meteor_single("cats running", "cat runs") == pytest.approx(0.6)
    # one contiguous chunk but unmatched ref words remain: penalty applies
    st2 = sentence_stats("the cat", "the cat sat", CFG)
    assert st2.chunks == 1


def test_meteor_beam_minimizes_chunks_over_greedy_diagonal():
    """Resolution criterion 2 (minimize chunks) requires global search:
    cand 'b a b' vs ref 'a b' admits two max-coverage alignments — the
    greedy diagonal pick {b0->b, a1->a} costs 2 chunks, while
    {a1->a, b2->b} is one contiguous run. The jar's beam resolution must
    find the 1-chunk alignment (full ref coverage but leftover cand word,
    so the penalty still applies with chunks=1)."""
    st = sentence_stats("b a b", "a b", CFG)
    assert st.chunks == 1
    assert st.n_matched == pytest.approx(2.0)


def test_meteor_beam_maximizes_coverage_over_stage_priority():
    """Resolution criterion 1 (maximize covered words) can require
    REJECTING an exact word match: cand 'new york' vs ref 'nyc new' with
    paraphrase ('new york' ~ 'nyc'). Stage-priority greedy consumes
    'new' in the exact stage (2 covered words, blocking the phrase);
    the beam resolver picks the paraphrase block (3 covered words)."""
    par = {("new", "york"): {("nyc",)}, ("nyc",): {("new", "york")}}
    cfg_par = MeteorConfig(paraphrases=par)
    st = sentence_stats("new york", "nyc new", cfg_par)
    assert st.m_c == pytest.approx(0.6 * (0.75 + 0.75))   # both cand words
    assert st.m_r == pytest.approx(0.6 * 0.75)            # 'nyc'
    assert st.n_matched == pytest.approx(1.5)
    assert st.chunks == 1


def test_meteor_orders_quality():
    ref = "the cat sat on the mat"
    assert (meteor("the cat sat on the mat", [ref])
            > meteor("the cat sat on a rug", [ref])
            > meteor("dogs run fast", [ref]))


def test_meteor_stem_stage():
    # "jumping"/"jumps" only match through the Porter stem stage (0.6)
    with_stem = meteor_single("the dog jumping", "the dog jumps")
    assert with_stem > meteor_single("the dog walking", "the dog jumps")


def test_meteor_synonym_stage():
    """'feline'~'cat' matches only with a synonym table, at weight 0.8."""
    syn = {"cat": frozenset({"feline"}), "feline": frozenset({"cat"})}
    cfg_syn = MeteorConfig(synonyms=syn)
    base = meteor_single("the feline", "the cat")
    with_syn = meteor_single("the feline", "the cat", cfg_syn)
    assert with_syn > base
    # hand-check: both words matched (exact 'the' w=1.0, syn w=0.8),
    # single full-coverage chunk -> no penalty
    st = sentence_stats("the feline", "the cat", cfg_syn)
    m_c = 1.0 * 0.25 + 0.8 * 0.75
    assert st.m_c == pytest.approx(m_c)
    assert st.chunks == 0


def test_meteor_paraphrase_stage():
    """phrase pair ('passed away' ~ 'died') matches only through the
    paraphrase table, at weight 0.6, as one aligned block."""
    par = {("passed", "away"): {("died",)}, ("died",): {("passed", "away")}}
    cfg_par = MeteorConfig(paraphrases=par)
    base = meteor_single("he passed away", "he died")
    with_par = meteor_single("he passed away", "he died", cfg_par)
    assert with_par > base
    st = sentence_stats("he passed away", "he died", cfg_par)
    # 'he' exact + 2-word phrase <-> 1-word phrase at 0.6
    assert st.m_c == pytest.approx(0.25 + 0.6 * (0.75 + 0.75))
    assert st.m_r == pytest.approx(0.25 + 0.6 * 0.75)
    assert st.chunks == 0  # both sides fully covered, contiguous


def test_meteor_shipped_tables_material_delta():
    """Fixture pinning VERDICT-r4 weak #6: on a news-flavored corpus whose
    candidate/reference pairs differ through synonym and paraphrase
    substitutions, the SHIPPED tables must produce a materially higher
    `meteor` than `meteor_exact_stem` — if table loading regresses (lost
    package data, loader break) the two keys collapse together and this
    trips. Thresholds are loose on purpose: pin the mechanism, not the
    curated tables' exact contents."""
    cands = [
        "the premier visited the quake zone after the tremor",
        "police detained the suspect after the blast",
        "the film star passed away at his residence",
        "lawmakers backed the agreement in the house of representatives",
    ]
    refs = [
        ["the prime minister toured the earthquake area after the tremor"],
        ["officers arrested the suspect after the explosion"],
        ["the movie actor died at his home"],
        ["legislators supported the accord in the house"],
    ]
    full_cfg = MeteorConfig.from_data_dir()
    assert full_cfg.full_stages, "shipped tables failed to load"
    full = corpus_meteor(cands, refs, full_cfg)
    reduced = corpus_meteor(
        cands, refs, MeteorConfig(function_words=full_cfg.function_words))
    assert full > reduced + 0.05, (full, reduced)


def test_meteor_metric_key_and_stage_config():
    assert MeteorConfig().metric_key == "meteor_exact_stem"
    full = MeteorConfig(synonyms={}, paraphrases={})
    assert full.metric_key == "meteor"


def test_meteor_data_dir_loaders(tmp_path):
    (tmp_path / "synonyms.tsv").write_text("cat\tfeline,kitty\n")
    (tmp_path / "paraphrases.tsv").write_text("passed away\tdied\n")
    (tmp_path / "function_words.txt").write_text("the\na\n")
    cfg = MeteorConfig.from_data_dir(str(tmp_path))
    assert cfg.full_stages and cfg.metric_key == "meteor"
    assert "feline" in cfg.synonyms["cat"]
    assert "cat" in cfg.synonyms["kitty"]          # symmetric closure
    assert ("passed", "away") in cfg.paraphrases
    assert ("died",) in cfg.paraphrases
    assert cfg.function_words == frozenset({"the", "a"})


def test_meteor_partial_data_dir_cannot_claim_full_key(tmp_path,
                                                       monkeypatch):
    """A data dir missing either table must NOT unlock the "meteor" key —
    the reduced stage set is not comparable to published jar numbers
    (scripts/compute_metrics.py:36-45), so a partially-provisioned
    deployment has to keep reporting meteor_exact_stem."""
    from tell_tpu.commands.evaluate import score_generations
    (tmp_path / "synonyms.tsv").write_text("cat\tfeline\n")  # no paraphrases
    cfg = MeteorConfig.from_data_dir(str(tmp_path))
    assert not cfg.full_stages
    assert cfg.metric_key == "meteor_exact_stem"
    monkeypatch.setenv("TELL_TPU_METEOR_DATA", str(tmp_path))
    m = score_generations(["the cat sat"], [["the cat sat"]])
    assert "meteor" not in m and "meteor_exact_stem" in m
    # the other partial direction: paraphrases without synonyms
    only_par = tmp_path / "par_only"
    only_par.mkdir()
    (only_par / "paraphrases.tsv").write_text("passed away\tdied\n")
    cfg2 = MeteorConfig.from_data_dir(str(only_par))
    assert cfg2.metric_key == "meteor_exact_stem"


def test_meteor_multiref_max():
    refs = ["a completely different sentence", "the cat sat"]
    assert meteor("the cat sat", refs) == meteor_single("the cat sat",
                                                        refs[1])


def test_corpus_meteor_aggregates_stats():
    """Corpus score sums sufficient statistics (jar MeteorStats
    aggregation), which differs from mean-of-sentences."""
    c = ["the cat sat on a rug", "dogs run fast"]
    r = [["the cat sat on the mat"], ["the dogs ran quickly"]]
    total = None
    for ci, ri in zip(c, r):
        st = sentence_stats(ci, ri[0], CFG)
        if total is None:
            total = st
        else:
            total.add(st)
    assert corpus_meteor(c, r) == pytest.approx(total.score(CFG))
    mean = (meteor(c[0], r[0]) + meteor(c[1], r[1])) / 2
    assert corpus_meteor(c, r) != pytest.approx(mean)


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


def test_score_generations_includes_meteor(tmp_path, monkeypatch):
    from tell_tpu.commands.evaluate import score_generations
    # tables disabled: honest reduced-stage key only
    monkeypatch.setenv("TELL_TPU_METEOR_DATA", "none")
    m = score_generations(["the cat sat"], [["the cat sat"]])
    assert "meteor" not in m
    assert m["meteor_exact_stem"] > 90
    assert m["bleu-1"] > 99
    # with a full table dir: jar-matching stage config -> "meteor" key,
    # with meteor_exact_stem still reported side by side
    (tmp_path / "synonyms.tsv").write_text("cat\tfeline\n")
    (tmp_path / "paraphrases.tsv").write_text("passed away\tdied\n")
    monkeypatch.setenv("TELL_TPU_METEOR_DATA", str(tmp_path))
    m2 = score_generations(["the cat sat"], [["the cat sat"]])
    assert m2["meteor"] > 90
    assert m2["meteor_exact_stem"] > 90


def test_shipped_tables_default_and_full_stage_pinned(monkeypatch):
    """The curated shipped tables (evalm/data/meteor) load by default and
    unlock the full four-stage pipeline; pin a corpus-level score so the
    committed tables' behavior is machine-checked. 'passed away'/'died'
    (paraphrase, weight 0.6) and 'automobile'/'car' (synonym, weight 0.8)
    must match; the full score strictly exceeds exact+stem."""
    from tell_tpu.commands.evaluate import score_generations
    monkeypatch.delenv("TELL_TPU_METEOR_DATA", raising=False)
    cfg = MeteorConfig.from_data_dir()
    assert cfg.full_stages, "shipped tables failed to load"
    cands = ["the man passed away at his home",
             "an automobile hit the big bridge"]
    refs = [["the man died at his home"],
            ["a car hit the large bridge"]]
    m = score_generations(cands, refs)
    assert m["meteor"] > m["meteor_exact_stem"]
    # pinned (tolerances allow table growth, not behavioral regression)
    assert m["meteor"] == pytest.approx(54.7, abs=2.0)
    assert m["meteor_exact_stem"] == pytest.approx(28.9, abs=2.0)
