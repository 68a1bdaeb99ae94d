"""ROUGE-L (pycocoevalcap-compatible: LCS F-measure with beta = 1.2)."""
from __future__ import annotations

_BETA = 1.2


def _lcs_len(a: list[str], b: list[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b):
            cur.append(prev[j] + 1 if x == y else max(cur[-1], prev[j + 1]))
        prev = cur
    return prev[-1]


def rouge_l(candidates: list[str], references: list[list[str]]) -> float:
    """Mean over samples of the max-over-refs LCS F-score."""
    scores = []
    for cand, refs in zip(candidates, references):
        c = cand.split()
        best = 0.0
        for ref in refs:
            r = ref.split()
            lcs = _lcs_len(c, r)
            if lcs == 0:
                continue
            prec = lcs / len(c)
            rec = lcs / len(r)
            best = max(best, ((1 + _BETA ** 2) * prec * rec)
                       / (rec + _BETA ** 2 * prec))
        scores.append(best)
    return sum(scores) / max(len(scores), 1)
