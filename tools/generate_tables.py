#!/usr/bin/env python
"""Render LaTeX results tables from evaluate-metrics JSON files.

Equivalent of /root/reference/scripts/generate_tables.py:1-140: collects the
per-experiment `evaluate-metrics-test.json` files written by `tnt evaluate`
and renders the paper-style metric table (BLEU-4, ROUGE, METEOR, CIDEr,
entity P/R) per dataset.

Usage: python tools/generate_tables.py runs/nytimes runs/goodnews > tables.tex
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

COLUMNS = [("bleu-4", "BLEU-4"), ("rouge-l", "ROUGE"),
           # "meteor" is only emitted when the jar-matching synonym +
           # paraphrase tables were loaded; the reduced exact+stem score
           # is keyed meteor_exact_stem (see evalm/meteor.py) and shown
           # under a marked header so it is never confused with
           # published jar METEOR numbers
           ("meteor", "METEOR"), ("meteor_exact_stem", "METEOR (e+s)"),
           ("cider", "CIDEr"),
           ("entity_precision", "Ent. P"), ("entity_recall", "Ent. R")]


def collect(run_dir: str, split: str = "test") -> dict[str, dict]:
    """One row per run dir. Prefers evaluate-metrics-<split>.json; falls
    back to any other split ONLY if the preferred one is absent (globbing
    all splits would let validation numbers overwrite test numbers)."""
    rows = {}
    fallback = {}
    for path in sorted(glob.glob(os.path.join(run_dir, "*",
                                              "evaluate-metrics-*.json"))):
        name = os.path.basename(os.path.dirname(path))
        with open(path) as f:
            data = json.load(f)
        if path.endswith(f"evaluate-metrics-{split}.json"):
            rows[name] = data
        else:
            fallback.setdefault(name, data)
    for name, data in fallback.items():
        rows.setdefault(name, data)
    return rows


def render(dataset: str, rows: dict[str, dict]) -> str:
    lines = [
        r"\begin{table}", r"\centering",
        rf"\caption{{Results on {dataset}.}}",
        r"\begin{tabular}{l" + "r" * len(COLUMNS) + "}",
        r"\toprule",
        "Model & " + " & ".join(h for _, h in COLUMNS) + r" \\",
        r"\midrule",
    ]
    for name, m in rows.items():
        cells = [f"{m[k]:.1f}" if k in m else "--" for k, _ in COLUMNS]
        lines.append(name.replace("_", r"\_") + " & "
                     + " & ".join(cells) + r" \\")
    lines += [r"\bottomrule", r"\end{tabular}", r"\end{table}", ""]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+",
                    help="per-dataset run dirs (runs/nytimes ...)")
    args = ap.parse_args()
    for rd in args.run_dirs:
        rows = collect(rd)
        if rows:
            print(render(os.path.basename(rd.rstrip("/")), rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
