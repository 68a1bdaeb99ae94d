#!/usr/bin/env python
"""List caption entity names that never appear in the article context.

Equivalent of /root/reference/scripts/get_unknown_caption_names.py: these
are the names a captioner cannot learn from the paired article — the upper
bound on entity recall without a copy mechanism.

Usage: python tools/get_unknown_caption_names.py --articles train.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import Counter

ENTITY_LABELS = ("PERSON", "ORG", "GPE")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    unknown = Counter()
    n_caption_names = 0
    with open(args.articles, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            art = json.loads(line)
            sections = art.get("parsed_section", [])
            positions = set(art.get("image_positions", []))
            context_names = set()
            caption_names = []
            for i, sec in enumerate(sections):
                ents = [e["text"] for e in sec.get("named_entities", [])
                        if e.get("label") in ENTITY_LABELS]
                if i in positions:
                    caption_names.extend(ents)
                else:
                    context_names.update(ents)
            for name in caption_names:
                n_caption_names += 1
                if name not in context_names:
                    unknown[name] += 1
    result = {
        "n_caption_names": n_caption_names,
        "n_unknown": sum(unknown.values()),
        "unknown_ratio": (sum(unknown.values()) / n_caption_names
                          if n_caption_names else 0.0),
        "top_unknown": unknown.most_common(50),
    }
    out = json.dumps(result, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
