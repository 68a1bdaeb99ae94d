#!/usr/bin/env python
"""Export METEOR-1.5 data tables in the loadable format of
tell_tpu/evalm/meteor.py (TELL_TPU_METEOR_DATA).

The jar ships WordNet-derived synonym data and a paraphrase table
(paraphrase-en.gz); this environment has neither (zero egress), so this
tool runs on any machine that does and writes:

  synonyms.tsv        word<TAB>syn1,syn2,...   (from nltk WordNet synsets)
  paraphrases.tsv     phrase<TAB>phrase        (from the jar's
                      paraphrase-en.gz, '|||'-separated format)
  function_words.txt  one word per line        (from a corpus: words with
                      relative frequency > 1e-3, the jar's rule)

Usage:
  python tools/build_meteor_tables.py --out data/meteor \
      [--paraphrase-gz paraphrase-en.gz] [--corpus corpus.txt] \
      [--vocab-limit 200000]

Reference: the jar invocation at
/root/reference/scripts/compute_metrics.py:36-45; stage semantics in
tell_tpu/evalm/meteor.py.
"""
from __future__ import annotations

import argparse
import collections
import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_synonyms(out_path: str, vocab_limit: int,
                    wordnet=None) -> int:
    """word -> all lemmas sharing any synset (lowercased, single words)."""
    if wordnet is None:
        from nltk.corpus import wordnet  # needs the wordnet corpus data
    table: dict[str, set] = {}
    n = 0
    for synset in wordnet.all_synsets():
        lemmas = [l.name().lower() for l in synset.lemmas()
                  if "_" not in l.name()]
        for w in lemmas:
            if len(table) >= vocab_limit and w not in table:
                continue
            table.setdefault(w, set()).update(x for x in lemmas if x != w)
    with open(out_path, "w", encoding="utf-8") as f:
        for w in sorted(table):
            if table[w]:
                f.write(f"{w}\t{','.join(sorted(table[w]))}\n")
                n += 1
    return n


def export_paraphrases(gz_path: str, out_path: str) -> int:
    """Convert the jar's paraphrase-en.gz ('phrase ||| phrase' per line,
    optionally with a probability column) to our TSV."""
    n = 0
    opener = gzip.open if gz_path.endswith(".gz") else open
    with opener(gz_path, "rt", encoding="utf-8", errors="replace") as f, \
            open(out_path, "w", encoding="utf-8") as out:
        for line in f:
            parts = [p.strip() for p in line.split("|||")]
            if len(parts) < 2 or not parts[0] or not parts[1]:
                continue
            out.write(f"{parts[0].lower()}\t{parts[1].lower()}\n")
            n += 1
    return n


def export_function_words(corpus_path: str, out_path: str,
                          threshold: float = 1e-3) -> int:
    """Words with relative corpus frequency > threshold (the jar's
    function-word rule)."""
    counts: collections.Counter = collections.Counter()
    total = 0
    with open(corpus_path, encoding="utf-8", errors="replace") as f:
        for line in f:
            for w in line.lower().split():
                counts[w] += 1
                total += 1
    words = sorted(w for w, c in counts.items() if c / max(total, 1)
                   > threshold)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write("\n".join(words) + "\n")
    return len(words)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--paraphrase-gz", default=None)
    ap.add_argument("--corpus", default=None,
                    help="plain-text corpus for the function-word list")
    ap.add_argument("--vocab-limit", type=int, default=200_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    try:
        n = export_synonyms(os.path.join(args.out, "synonyms.tsv"),
                            args.vocab_limit)
        print(f"synonyms.tsv: {n} entries")
    except LookupError as e:
        print(f"skipping synonyms (wordnet data not installed: {e})")
    if args.paraphrase_gz:
        n = export_paraphrases(args.paraphrase_gz,
                               os.path.join(args.out, "paraphrases.tsv"))
        print(f"paraphrases.tsv: {n} pairs")
    if args.corpus:
        n = export_function_words(args.corpus,
                                  os.path.join(args.out,
                                               "function_words.txt"))
        print(f"function_words.txt: {n} words")
    print(f"score with: TELL_TPU_METEOR_DATA={args.out} tnt score ...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
