"""Export a text-only JSONL dump of a dataset (the reference's
scripts/dump_database.py: text projection of the Mongo articles collection,
newest first, filtered to News/archive material).

Our datasets already live as articles.jsonl (the data layer's source of
truth), so the dump is a projection + sort + filter over that file: it
strips face/object embeddings and image blobs down to the text fields the
reference exports (headline, section texts, web_url, pub_date, ...).

Usage:
    python tools/dump_dataset.py ARTICLES_JSONL DUMP_PATH [--keep-all]
"""
from __future__ import annotations

import argparse
import json
import sys

TEXT_KEYS = ("_id", "web_url", "pub_date", "type_of_material", "news_desk",
             "abstract")
# the reference keeps News-like material only (dump_database.py filter)
KEEP_MATERIAL = {"News", "Brief", "Obituary (Obit)", "Editorial",
                 "Op-Ed", "An Analysis", None, ""}


def project(article: dict, keep_all: bool) -> dict | None:
    if not keep_all:
        material = article.get("type_of_material")
        if material not in KEEP_MATERIAL:
            return None
    out = {k: article[k] for k in TEXT_KEYS if k in article}
    if "headline" in article:
        out["headline"] = {"main": (article["headline"] or {}).get("main")}
    sections = []
    for sec in article.get("parsed_section", []):
        sections.append({"type": sec.get("type"), "text": sec.get("text")})
    out["sections"] = sections
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("articles_jsonl")
    ap.add_argument("dump_path")
    ap.add_argument("--keep-all", action="store_true",
                    help="skip the type_of_material News filter")
    args = ap.parse_args(argv)

    rows = []
    with open(args.articles_jsonl, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            row = project(json.loads(line), args.keep_all)
            if row is not None:
                rows.append(row)
    rows.sort(key=lambda r: r.get("pub_date") or "", reverse=True)
    with open(args.dump_path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, ensure_ascii=False) + "\n")
    print(json.dumps({"exported": len(rows), "path": args.dump_path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
