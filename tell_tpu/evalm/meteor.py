"""METEOR metric, pure Python — the METEOR-1.5 formulation.

The reference drives the Java METEOR-1.5 jar through pycocoevalcap
(/root/reference/scripts/compute_metrics.py:36-45, patched subprocess).
The jar and its bundled WordNet/paraphrase data files are unavailable in
this environment (zero egress), so this module implements the METEOR-1.5
algorithm (Denkowski & Lavie 2014) directly:

  four matcher stages with the jar's module weights
      exact 1.0 | stem 0.6 | synonym 0.8 | paraphrase 0.6
  content/function-word weighting (delta), English task parameters
      alpha=0.85  beta=0.2  gamma=0.6  delta=0.75
  weighted P/R over word weights, fragmentation penalty over chunks:
      P = m_c / len_c,  R = m_r / len_r
      F_mean = P*R / (alpha*P + (1-alpha)*R)
      Pen = gamma * (chunks / m_avg)**beta
      score = F_mean * (1 - Pen)

The synonym and paraphrase stages need data tables the jar ships with;
they are LOADABLE here (load_synonyms / load_paraphrases /
load_function_words, or MeteorConfig.from_data_dir pointing at a
directory with synonyms.tsv / paraphrases.tsv / function_words.txt).
A curated small table pair ships with the package (SHIPPED_DATA_DIR,
provenance in data/meteor/README.md) so from_data_dir() runs the full
stage set with zero egress; $TELL_TPU_METEOR_DATA points at bigger
regenerated tables (tools/build_meteor_tables.py) or "none" to disable.
Without tables only the exact+stem stages run, and callers MUST report
the result under the key "meteor_exact_stem" — scores from the reduced
stage set are not comparable to published jar METEOR numbers. When both
tables are loaded the stage configuration matches the jar's and the
score is reported as "meteor" (with curated-small tables its absolute
value is a lower bound on what the jar's full data would give; `tnt
score` reports both keys side by side).

Alignment follows the jar's Aligner scheme: enumerate ALL possible
matches across the four modules, then resolve a one-to-one
non-overlapping alignment by beam search with the published criteria in
priority order — maximize covered words across both sentences, minimize
chunks, minimize total |candidate start - reference start| (see _align).
Hand-computed fixtures in tests/test_meteor_readability.py pin the
resolution behavior; jar-output equivalence remains unverifiable offline
(zero egress), which is the honest residual caveat. Corpus scores
aggregate sufficient statistics over the whole set (the jar's
MeteorStats aggregation), not mean-of-sentences; per-sentence scoring is
also exposed.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass

_STEMMER = None
_STEM_CACHE: dict = {}

# Curated small synonym/paraphrase tables shipped with the package so the
# full four-stage pipeline runs with zero egress (provenance + caveats:
# data/meteor/README.md). $TELL_TPU_METEOR_DATA overrides.
SHIPPED_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "data", "meteor")

# A standard English closed-class word list (articles, conjunctions,
# prepositions, pronouns, auxiliaries, common adverbial particles). The
# jar derives its function-word list from corpus frequencies; this bundled
# approximation is replaceable via load_function_words().
DEFAULT_FUNCTION_WORDS = frozenset("""
a an the and or but nor so yet for of in on at by to from with without
into onto upon about above below under over between among through during
before after since until while as if than that which who whom whose what
when where why how this these those it its he him his she her hers they
them their theirs we us our ours you your yours i me my mine is are was
were be been being am do does did have has had having will would shall
should can could may might must not no nor there here then once own same
such only very s t don now d ll m o re ve y
""".split())


def _stem(words: list[str]) -> list[str]:
    """Module-cached Porter stemmer + per-word memo: corpus scoring
    re-stems the same vocabulary thousands of times."""
    global _STEMMER
    if _STEMMER is None:
        try:
            from nltk.stem.porter import PorterStemmer
            _STEMMER = PorterStemmer()
        except Exception:  # pragma: no cover - nltk is in the image
            _STEMMER = False
    if _STEMMER is False:
        return words
    out = []
    for w in words:
        st = _STEM_CACHE.get(w)
        if st is None:
            st = _STEMMER.stem(w)
            if len(_STEM_CACHE) < 500_000:
                _STEM_CACHE[w] = st
        out.append(st)
    return out


@dataclass(frozen=True)
class MeteorConfig:
    """METEOR-1.5 English task parameters + loadable matcher data."""
    alpha: float = 0.85
    beta: float = 0.2
    gamma: float = 0.6
    delta: float = 0.75
    # module weights: exact, stem, synonym, paraphrase (the jar's -m
    # "exact stem synonym paraphrase" English default)
    weights: tuple[float, float, float, float] = (1.0, 0.6, 0.8, 0.6)
    # word -> frozenset of words sharing a synset (symmetric closure is
    # the loader's job); None disables the synonym stage
    synonyms: dict | None = None
    # tuple(words) -> set of tuple(words); None disables the stage
    paraphrases: dict | None = None
    function_words: frozenset = DEFAULT_FUNCTION_WORDS
    max_paraphrase_len: int = 6

    @property
    def full_stages(self) -> bool:
        """True when the stage configuration matches the jar's English
        default (all four matchers active) — the condition for reporting
        under the key "meteor" rather than "meteor_exact_stem"."""
        return self.synonyms is not None and self.paraphrases is not None

    @property
    def metric_key(self) -> str:
        return "meteor" if self.full_stages else "meteor_exact_stem"

    @classmethod
    def from_data_dir(cls, path: str | None = None, **kw) -> "MeteorConfig":
        """Build a config from a data directory holding any of
        synonyms.tsv, paraphrases.tsv, function_words.txt. Resolution:
        explicit arg > $TELL_TPU_METEOR_DATA > the curated tables shipped
        in tell_tpu/evalm/data/meteor (small, hand-curated — see its
        README for the honesty caveats vs the jar's WordNet/PPDB data).
        Missing files leave that stage off. $TELL_TPU_METEOR_DATA=none
        disables tables entirely (exact+stem only)."""
        path = path or os.environ.get("TELL_TPU_METEOR_DATA")
        if path and path.lower() == "none":
            return cls(**kw)
        if not path:
            path = SHIPPED_DATA_DIR
        if not os.path.isdir(path):
            # visible fallback: an install that lost the shipped tables
            # (package-data omitted from a wheel) silently degrades to
            # exact+stem and the 'meteor' key disappears — say so once
            import logging
            logging.getLogger("tell_tpu.evalm").warning(
                "METEOR data dir %s missing; falling back to exact+stem "
                "stages only (no 'meteor' key)", path)
            return cls(**kw)
        syn_p = os.path.join(path, "synonyms.tsv")
        par_p = os.path.join(path, "paraphrases.tsv")
        fn_p = os.path.join(path, "function_words.txt")
        if os.path.exists(syn_p):
            kw.setdefault("synonyms", load_synonyms(syn_p))
        if os.path.exists(par_p):
            kw.setdefault("paraphrases", load_paraphrases(par_p))
        if os.path.exists(fn_p):
            kw.setdefault("function_words", load_function_words(fn_p))
        return cls(**kw)


def load_synonyms(path: str) -> dict:
    """TSV: word<TAB>comma-separated synonyms (one line per word, as
    exported from WordNet synsets). Returns the symmetric closure."""
    table: dict[str, set] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            word, _, rest = line.partition("\t")
            syns = {s.strip() for s in rest.split(",") if s.strip()}
            table.setdefault(word, set()).update(syns)
            for s in syns:  # symmetric
                table.setdefault(s, set()).add(word)
    return {w: frozenset(s) for w, s in table.items()}


def load_paraphrases(path: str) -> dict:
    """TSV: phrase<TAB>phrase (both lowercased, space-separated words);
    loaded symmetrically."""
    table: dict[tuple, set] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            a, _, b = line.partition("\t")
            ta, tb = tuple(a.split()), tuple(b.split())
            if not ta or not tb:
                continue
            table.setdefault(ta, set()).add(tb)
            table.setdefault(tb, set()).add(ta)
    return table


def load_function_words(path: str) -> frozenset:
    with open(path, encoding="utf-8") as f:
        return frozenset(w.strip().lower() for w in f if w.strip())


@dataclass
class _Match:
    """One aligned block: cand[ci:ci+cn] <-> ref[ri:ri+rn], module w."""
    ci: int
    cn: int
    ri: int
    rn: int
    weight: float


_BEAM_WIDTH = 40


def _possible_matches(cand: list[str], ref: list[str],
                      cfg: MeteorConfig) -> list[_Match]:
    """ALL possible matches across the four matcher modules (the jar's
    Aligner first enumerates every module's matches, THEN resolves).
    Exact/stem/synonym are word-level; paraphrase matches phrase pairs
    (including length-1 phrases) through the table. A word pair matched
    by several modules keeps the highest module weight."""
    w_exact, w_stem, w_syn, w_par = cfg.weights
    best: dict[tuple, float] = {}      # (ci, cn, ri, rn) -> weight
    stems_c, stems_r = _stem(cand), _stem(ref)
    syn = cfg.synonyms
    for i, cw in enumerate(cand):
        for j, rw in enumerate(ref):
            if cw == rw:
                w = w_exact
            elif stems_c[i] == stems_r[j]:
                w = w_stem
            elif syn is not None and (rw in syn.get(cw, ())
                                      or cw in syn.get(rw, ())):
                w = w_syn
            else:
                continue
            best[(i, 1, j, 1)] = max(best.get((i, 1, j, 1), 0.0), w)
    if cfg.paraphrases is not None:
        table = cfg.paraphrases
        for k in range(1, min(cfg.max_paraphrase_len, len(cand)) + 1):
            for i in range(len(cand) - k + 1):
                alts = table.get(tuple(cand[i:i + k]))
                if not alts:
                    continue
                for alt in alts:
                    n = len(alt)
                    for j in range(len(ref) - n + 1):
                        if tuple(ref[j:j + n]) == alt:
                            key = (i, k, j, n)
                            best[key] = max(best.get(key, 0.0), w_par)
    return [_Match(ci, cn, ri, rn, w)
            for (ci, cn, ri, rn), w in best.items()]


def _align(cand: list[str], ref: list[str],
           cfg: MeteorConfig) -> list[_Match]:
    """One-to-one non-overlapping alignment resolved by beam search with
    the jar's published criteria (Denkowski & Lavie 2011 §2/2014), in
    priority order: (1) maximize the number of covered words across both
    sentences, (2) minimize the number of chunks, (3) minimize the sum of
    absolute distances between match start indices. Total module-weighted
    mass breaks remaining ties (it only affects scoring, never coverage).
    The search sweeps candidate positions left to right keeping the
    _BEAM_WIDTH best partial alignments — the same resolution scheme as
    the jar's Aligner, replacing the round-1/2 stage-priority greedy
    approximation."""
    poss = _possible_matches(cand, ref, cfg)
    if not poss:
        return []
    by_start: dict[int, list[_Match]] = {}
    for m in poss:
        by_start.setdefault(m.ci, []).append(m)

    # state: (covered, chunks, dist, wsum, uc, ur, c_end, r_end, matches)
    # where uc/ur are coverage bitmasks and (c_end, r_end) is the end of
    # the last match (chunk-extension test). Ranking key: criteria order.
    def rank(s):
        covered, chunks, dist, wsum = s[0], s[1], s[2], s[3]
        return (-covered, chunks, dist, -wsum)

    beam = [(0, 0, 0, 0.0, 0, 0, -1, -1, ())]
    for i in range(len(cand)):
        nxt: dict[tuple, tuple] = {}

        def consider(state):
            key = state[4:8]            # (uc, ur, c_end, r_end)
            old = nxt.get(key)
            if old is None or rank(state) < rank(old):
                nxt[key] = state

        for state in beam:
            covered, chunks, dist, wsum, uc, ur, ce, re_, ms = state
            if (uc >> i) & 1:           # covered by an earlier phrase
                consider(state)
                continue
            consider(state)             # leave word i unmatched
            for m in by_start.get(i, ()):
                rmask = ((1 << m.rn) - 1) << m.ri
                if ur & rmask:
                    continue
                ext = (m.ci == ce and m.ri == re_)
                consider((covered + m.cn + m.rn,
                          chunks + (0 if ext else 1),
                          dist + abs(m.ci - m.ri),
                          wsum + m.weight * (m.cn + m.rn),
                          uc | (((1 << m.cn) - 1) << m.ci),
                          ur | rmask,
                          m.ci + m.cn, m.ri + m.rn,
                          ms + (m,)))
        beam = sorted(nxt.values(), key=rank)[:_BEAM_WIDTH]
    return list(beam[0][8])


def _chunks(matches: list[_Match]) -> int:
    """Maximal monotone contiguous runs; a phrase match is one block that
    extends a run only when both sides stay contiguous."""
    if not matches:
        return 0
    n = 1
    for a, b in zip(matches[:-1], matches[1:]):
        if not (b.ci == a.ci + a.cn and b.ri == a.ri + a.rn):
            n += 1
    return n


def _word_weight(w: str, cfg: MeteorConfig) -> float:
    return (1.0 - cfg.delta) if w in cfg.function_words else cfg.delta


@dataclass
class MeteorStats:
    """Sufficient statistics for one (cand, ref) pair; corpus scores add
    them (the jar's MeteorStats aggregation)."""
    m_c: float = 0.0     # weighted matched candidate mass
    m_r: float = 0.0     # weighted matched reference mass
    len_c: float = 0.0   # weighted candidate length
    len_r: float = 0.0   # weighted reference length
    chunks: int = 0
    n_matched: float = 0.0  # unweighted mean matched-word count

    def add(self, other: "MeteorStats") -> None:
        self.m_c += other.m_c
        self.m_r += other.m_r
        self.len_c += other.len_c
        self.len_r += other.len_r
        self.chunks += other.chunks
        self.n_matched += other.n_matched

    def score(self, cfg: MeteorConfig) -> float:
        if self.len_c <= 0 or self.len_r <= 0 or self.m_c <= 0 \
                or self.m_r <= 0:
            return 0.0
        p = self.m_c / self.len_c
        r = self.m_r / self.len_r
        f_mean = p * r / (cfg.alpha * p + (1 - cfg.alpha) * r)
        pen = 0.0
        if self.n_matched > 0 and self.chunks > 0:
            frag = self.chunks / self.n_matched
            pen = cfg.gamma * frag ** cfg.beta
        return f_mean * (1.0 - pen)


def sentence_stats(cand: str, ref: str, cfg: MeteorConfig) -> MeteorStats:
    cw = cand.lower().split()
    rw = ref.lower().split()
    st = MeteorStats()
    st.len_c = sum(_word_weight(w, cfg) for w in cw)
    st.len_r = sum(_word_weight(w, cfg) for w in rw)
    if not cw or not rw:
        return st
    matches = _align(cw, rw, cfg)
    nc = nr = 0
    for m in matches:
        st.m_c += m.weight * sum(_word_weight(w, cfg)
                                 for w in cw[m.ci:m.ci + m.cn])
        st.m_r += m.weight * sum(_word_weight(w, cfg)
                                 for w in rw[m.ri:m.ri + m.rn])
        nc += m.cn
        nr += m.rn
    st.n_matched = (nc + nr) / 2.0
    # all words matched in a single chunk -> no fragmentation penalty
    # (the jar zeroes frag when ch == 1 and m == len)
    ch = _chunks(matches)
    if ch == 1 and nc == len(cw) and nr == len(rw):
        ch = 0
    st.chunks = ch
    return st


def meteor_single(cand: str, ref: str, cfg: MeteorConfig | None = None,
                  **kw) -> float:
    cfg = _cfg(cfg, kw)
    return sentence_stats(cand, ref, cfg).score(cfg)


def _cfg(cfg, kw) -> MeteorConfig:
    if cfg is None:
        cfg = MeteorConfig()
    if kw:
        cfg = dataclasses.replace(cfg, **kw)
    return cfg


def meteor(cand: str, refs: list[str], cfg: MeteorConfig | None = None,
           **kw) -> float:
    """Max over references (the jar's multi-reference behavior)."""
    cfg = _cfg(cfg, kw)
    return max((meteor_single(cand, r, cfg) for r in refs), default=0.0)


def corpus_meteor(cands: list[str], refs: list[list[str]],
                  cfg: MeteorConfig | None = None, **kw) -> float:
    """Aggregate corpus score: per segment pick the best-scoring
    reference's statistics, sum them, score once (MeteorStats
    aggregation — NOT mean of sentence scores)."""
    cfg = _cfg(cfg, kw)
    if not cands:
        return 0.0
    total = MeteorStats()
    for c, rs in zip(cands, refs):
        best, best_score = None, -1.0
        for r in rs:
            st = sentence_stats(c, r, cfg)
            sc = st.score(cfg)
            if sc > best_score:
                best, best_score = st, sc
        if best is not None:
            total.add(best)
    return total.score(cfg)
