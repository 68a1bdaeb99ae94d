#!/usr/bin/env python
"""spaCy NER + POS annotation of article JSONL.

Equivalent of /root/reference/scripts/annotate_nytimes.py:93-156 (and
annotate_goodnews.py): runs spaCy over every parsed section's text and
writes `named_entities` (text/label/start/end) and `parts_of_speech`
(text/pos/start/end) back into each section, producing the annotated
articles.jsonl that the readers and the pointer-model copy masks consume.

Requires the spacy package + an en_core_web_* model; exits with a clear
message when absent (this image has no spaCy — run where it is installed).
"""
from __future__ import annotations

import argparse
import json
import sys


def annotate(articles, nlp):
    for art in articles:
        for section in art.get("parsed_section", []):
            text = section.get("text", "")
            if not text.strip():
                continue
            doc = nlp(text)
            section["named_entities"] = [
                {"text": e.text, "label": e.label_,
                 "start": e.start_char, "end": e.end_char}
                for e in doc.ents]
            section["parts_of_speech"] = [
                {"text": t.text, "pos": t.pos_,
                 "start": t.idx, "end": t.idx + len(t.text)}
                for t in doc if t.pos_ == "PROPN"]
        yield art


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="en_core_web_lg")
    args = ap.parse_args()
    try:
        import spacy
        nlp = spacy.load(args.model, disable=["parser"])
    except Exception as e:  # pragma: no cover
        print(f"spaCy unavailable ({e}); install spacy + {args.model}",
              file=sys.stderr)
        return 1
    n = 0
    with open(args.articles, encoding="utf-8") as fin, \
            open(args.out, "w", encoding="utf-8") as fout:
        arts = (json.loads(l) for l in fin if l.strip())
        for art in annotate(arts, nlp):
            fout.write(json.dumps(art) + "\n")
            n += 1
    print(f"annotated {n} articles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
