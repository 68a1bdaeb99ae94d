"""METEOR metric, pure Python.

The reference drives the Java METEOR-1.5 jar through pycocoevalcap
(/root/reference/scripts/compute_metrics.py:36-45, patched subprocess).
That jar (and its WordNet synonym/paraphrase stages) is unavailable here,
so this is the original METEOR formulation (Banerjee & Lavie 2005 /
Lavie & Agarwal 2007) with the exact and Porter-stem matching stages:

  P = m/|cand|, R = m/|ref|,  F_mean = P*R / (alpha*P + (1-alpha)*R)
  penalty = gamma * (chunks/m)**beta
  score = F_mean * (1 - penalty)

with the standard alpha=0.9, beta=3.0, gamma=0.5. Multiple references take
the max score (the jar does the same). Matching is stage-wise greedy on
word positions (exact first, then stems), and the chunk count is the number
of maximal runs of contiguous, monotone aligned pairs — the same alignment
strategy as nltk.translate.meteor_score.
"""
from __future__ import annotations


_STEMMER = None
_STEM_CACHE: dict = {}


def _stem(words: list[str]) -> list[str]:
    """Module-cached stemmer + per-word memo: corpus scoring re-stems the
    same vocabulary thousands of times."""
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


def _align(cand: list[str], ref: list[str]) -> list[tuple[int, int]]:
    """Stage-wise greedy alignment: exact matches, then stem matches.
    Returns (cand_idx, ref_idx) pairs, each position used at most once."""
    pairs: list[tuple[int, int]] = []
    used_c: set[int] = set()
    used_r: set[int] = set()

    def stage(cs: list[str], rs: list[str]) -> None:
        for i, cw in enumerate(cs):
            if i in used_c:
                continue
            for j, rw in enumerate(rs):
                if j in used_r:
                    continue
                if cw == rw:
                    pairs.append((i, j))
                    used_c.add(i)
                    used_r.add(j)
                    break

    stage(cand, ref)
    stage(_stem(cand), _stem(ref))
    return sorted(pairs)


def _chunks(pairs: list[tuple[int, int]]) -> int:
    """Number of maximal monotone contiguous runs in the alignment."""
    if not pairs:
        return 0
    n = 1
    for (c0, r0), (c1, r1) in zip(pairs[:-1], pairs[1:]):
        if not (c1 == c0 + 1 and r1 == r0 + 1):
            n += 1
    return n


def meteor_single(cand: str, ref: str, alpha: float = 0.9,
                  beta: float = 3.0, gamma: float = 0.5) -> float:
    cw = cand.lower().split()
    rw = ref.lower().split()
    if not cw or not rw:
        return 0.0
    pairs = _align(cw, rw)
    m = len(pairs)
    if m == 0:
        return 0.0
    p = m / len(cw)
    r = m / len(rw)
    f_mean = p * r / (alpha * p + (1 - alpha) * r)
    penalty = gamma * (_chunks(pairs) / m) ** beta
    return f_mean * (1.0 - penalty)


def meteor(cand: str, refs: list[str], **kw) -> float:
    """Max over references (the METEOR jar's multi-reference behavior)."""
    return max((meteor_single(cand, r, **kw) for r in refs), default=0.0)


def corpus_meteor(cands: list[str], refs: list[list[str]], **kw) -> float:
    """Mean sentence METEOR (pycocoevalcap reports the corpus aggregate of
    the jar; mean-of-sentence is the standard pure-Python stand-in)."""
    if not cands:
        return 0.0
    return sum(meteor(c, r, **kw) for c, r in zip(cands, refs)) / len(cands)
