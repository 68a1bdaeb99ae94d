#!/usr/bin/env python
"""Convert the released GoodNews dataset dumps into articles.jsonl.

Equivalent of /root/reference/scripts/goodnews_insert.py (which loads the
GoodNews authors' article/caption JSON + image_urls into Mongo): emits our
standard article schema with one caption section per image and a `splits`
field (the reference keeps splits in a separate collection;
goodnews_face_ner_matched.py:76-83 reads them back).

Usage:
  python tools/goodnews_import.py --captioning captioning_dataset.json \
      --splits article_urls.json --out goodnews.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys


def convert(captioning: dict, splits: dict | None) -> list[dict]:
    split_of = {}
    if splits:
        for split, urls in splits.items():
            for u in (urls if isinstance(urls, list) else urls.keys()):
                split_of[u] = split.replace("_img_url", "") \
                    if "_" in split else split
    articles = []
    for art_id, art in captioning.items():
        paragraphs = [p for p in art.get("article", {}).values()] \
            if isinstance(art.get("article"), dict) else \
            [art.get("article", "")]
        sections = [{"type": "paragraph", "text": p}
                    for p in paragraphs if p and p.strip()]
        image_positions = []
        for img_idx, caption in sorted(art.get("images", {}).items()):
            image_positions.append(len(sections))
            sections.append({
                "type": "caption",
                "text": caption.strip() if isinstance(caption, str) else "",
                "hash": f"{art_id}_{img_idx}",
            })
        if not image_positions:
            continue
        articles.append({
            "_id": art_id,
            "web_url": art.get("article_url", ""),
            "headline": {"main": art.get("headline", "")
                         if isinstance(art.get("headline"), str) else ""},
            "parsed_section": sections,
            "image_positions": image_positions,
            "split": split_of.get(art.get("article_url", ""), "train"),
        })
    return articles


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--captioning", required=True,
                    help="GoodNews captioning_dataset.json")
    ap.add_argument("--splits", default=None,
                    help="GoodNews article_urls.json (train/val/test)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    with open(args.captioning, encoding="utf-8") as f:
        captioning = json.load(f)
    splits = None
    if args.splits:
        with open(args.splits, encoding="utf-8") as f:
            splits = json.load(f)
    articles = convert(captioning, splits)
    with open(args.out, "w", encoding="utf-8") as f:
        for a in articles:
            f.write(json.dumps(a) + "\n")
    print(f"wrote {len(articles)} articles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
