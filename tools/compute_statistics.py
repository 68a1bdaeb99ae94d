#!/usr/bin/env python
"""Dataset + name statistics over an articles JSONL.

Combines /root/reference/scripts/compute_name_statistics.py (per-name
train-split counters for caption and context, pickled for the rare-name
entity P/R metrics in compute_metrics.py:220-268) and
compute_data_statistics.py (articles / captions / token-length averages).

Usage:
  python tools/compute_statistics.py --articles train.jsonl \
      --counters-out name_counters.pkl [--stats-out stats.json]
"""
from __future__ import annotations

import argparse
import json
import pickle
import sys
from collections import Counter


def compute(articles):
    caption_counter: Counter = Counter()
    context_counter: Counter = Counter()
    stats = Counter(articles=0, images=0, caption_words=0, context_words=0)
    for art in articles:
        stats["articles"] += 1
        sections = art.get("parsed_section", [])
        positions = set(art.get("image_positions", []))
        for i, section in enumerate(sections):
            ents = [e["text"] for e in section.get("named_entities", [])
                    if e.get("label") in ("PERSON", "ORG", "GPE")]
            words = len(section.get("text", "").split())
            if i in positions and section.get("type") == "caption":
                stats["images"] += 1
                stats["caption_words"] += words
                caption_counter.update(ents)
            else:
                stats["context_words"] += words
                context_counter.update(ents)
    return caption_counter, context_counter, stats


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--counters-out")
    ap.add_argument("--stats-out")
    args = ap.parse_args()
    with open(args.articles, encoding="utf-8") as f:
        arts = (json.loads(l) for l in f if l.strip())
        cap, ctx, stats = compute(arts)
    if args.counters_out:
        with open(args.counters_out, "wb") as f:
            # schema of the reference's name_counters.pkl: (caption, context)
            pickle.dump({"caption": cap, "context": ctx}, f)
    out = dict(stats)
    if stats["images"]:
        out["avg_caption_words"] = stats["caption_words"] / stats["images"]
    if stats["articles"]:
        out["avg_context_words"] = stats["context_words"] / stats["articles"]
    out["unique_caption_names"] = len(cap)
    out["unique_context_names"] = len(ctx)
    if args.stats_out:
        with open(args.stats_out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
