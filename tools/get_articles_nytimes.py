#!/usr/bin/env python
"""Scrape NYTimes articles via the Archive API into articles.jsonl.

Equivalent of /root/reference/scripts/get_urls.py +
get_articles_nytimes.py:155-264: walk the Archive API month by month,
fetch each article page, section it with the demo extractor
(tell_tpu/serving/extractor.py), record image positions and image URLs.
Requires network egress and an NYT API key (https://developer.nytimes.com).

Usage:
  python tools/get_articles_nytimes.py --key KEY --start 2010-01 \
      --end 2018-12 --out articles.jsonl [--images-out raw_images/]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARCHIVE = "https://api.nytimes.com/svc/archive/v1/{year}/{month}.json?api-key={key}"


def months(start: str, end: str):
    y, m = map(int, start.split("-"))
    ye, me = map(int, end.split("-"))
    while (y, m) <= (ye, me):
        yield y, m
        m += 1
        if m > 12:
            y, m = y + 1, 1


def fetch_json(url: str) -> dict:
    from urllib.request import Request, urlopen
    req = Request(url, headers={"User-Agent": "Mozilla/5.0"})
    return json.loads(urlopen(req, timeout=30).read())


def article_record(meta: dict) -> dict | None:
    """Fetch + section one article; None when unusable (no text/images)."""
    from tell_tpu.serving.extractor import ExtractError, get_urls
    url = meta.get("web_url", "")
    if not url:
        return None
    try:
        out = get_urls(url)
    except ExtractError:
        return None
    except Exception:
        return None
    sections = out["sections"]
    image_positions = []
    for i, sec in enumerate(sections):
        if sec["type"] == "caption":
            if not sec.get("url"):
                # no image URL: not an image-bearing position (a hash of
                # the empty string would collide across the whole corpus)
                continue
            sec["hash"] = hashlib.sha256(
                sec["url"].encode()).hexdigest()[:24]
            image_positions.append(i)
    if not image_positions:
        return None
    return {
        "_id": meta.get("_id", url),
        "web_url": url,
        "headline": {"main": out["title"]},
        "pub_date": meta.get("pub_date", ""),
        "parsed_section": sections,
        "image_positions": image_positions,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--key", required=True)
    ap.add_argument("--start", required=True, help="YYYY-MM")
    ap.add_argument("--end", required=True, help="YYYY-MM")
    ap.add_argument("--out", required=True)
    ap.add_argument("--images-out", default=None,
                    help="also save base64'd images as <hash>.jpg")
    ap.add_argument("--sleep", type=float, default=6.0,
                    help="archive API rate limit (10 req/min)")
    ap.add_argument("--append", action="store_true",
                    help="append to --out instead of overwriting "
                    "(re-running an overlapping range without this flag "
                    "no longer silently duplicates articles)")
    args = ap.parse_args()
    if args.images_out:
        os.makedirs(args.images_out, exist_ok=True)
    n = 0
    with open(args.out, "a" if args.append else "w",
              encoding="utf-8") as f:
        for year, month in months(args.start, args.end):
            docs = fetch_json(ARCHIVE.format(year=year, month=month,
                                             key=args.key))
            docs = docs.get("response", {}).get("docs", [])
            print(f"{year}-{month:02d}: {len(docs)} articles")
            for meta in docs:
                rec = article_record(meta)
                if rec is None:
                    continue
                if args.images_out:
                    import base64
                    for i in rec["image_positions"]:
                        sec = rec["parsed_section"][i]
                        data = sec.pop("image_data", None)
                        if data:
                            path = os.path.join(args.images_out,
                                                f"{sec['hash']}.jpg")
                            with open(path, "wb") as imf:
                                imf.write(base64.b64decode(data))
                f.write(json.dumps(rec) + "\n")
                n += 1
            time.sleep(args.sleep)
    print(f"wrote {n} articles")
    return 0


if __name__ == "__main__":
    sys.exit(main())
