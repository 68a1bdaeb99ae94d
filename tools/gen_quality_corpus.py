#!/usr/bin/env python
"""Deterministic synthetic news corpus for the offline quality-loop proof.

The reference's correctness was established empirically: train on
NYTimes800k, decode the test split, score with scripts/compute_metrics.py
(compute_metrics.py:61-289). Real datasets and pretrained towers are
unreachable here (zero egress), so this generator builds the smallest
corpus on which that SAME loop — `tnt preprocess -> train -> evaluate ->
score` — can demonstrably move the metrics: N distinct articles whose
captions name distinct (person, place, org) tuples, so a model that
memorizes the training set drives CIDEr from ~0 to near-max and entity
P/R to ~1, and one that doesn't cannot.

Everything is a pure function of --seed:
  articles.jsonl   text + captions + named_entities + face embeddings
                   (committed under tests/fixtures/quality/)
  objects.jsonl    per-image-hash object features (regenerated at run
                   time — float blobs are deterministic, not committed)
  grids/<hash>.npy 49x2048 image-grid features (regenerated at run time)
  vocab.json/      byte-BPE vocabulary TRAINED on the corpus text with
  merges.txt       classic pair-frequency BPE (GPT-2 pre-tokenization via
                   the repo tokenizer, ties broken lexicographically), so
                   captions tokenize word-like instead of char-like
  entities.json    the gazetteer of every generated entity — the offline
                   NER for entity P/R scoring (no spaCy in this image)

Usage: python tools/gen_quality_corpus.py --out DIR [--n 32] [--seed 7]
       python tools/gen_quality_corpus.py --out DIR --features-only
           (regenerate only the uncommitted float blobs next to an
            already-committed articles.jsonl)
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tell_tpu.data.tokenizer import _PRETOKENIZE, bytes_to_unicode  # noqa: E402

FIRST = ["Alice", "Marcus", "Priya", "Diego", "Yuki", "Amara", "Stefan",
         "Leila", "Tomas", "Ingrid", "Omar", "Beatriz", "Viktor", "Nadia",
         "Henrik", "Zainab"]
LAST = ["Johnson", "Okafor", "Lindqvist", "Ramirez", "Tanaka", "Haddad",
        "Novak", "Petrova", "Mensah", "Costa", "Weber", "Kaur", "Moreau",
        "Bakker", "Silva", "Eriksen"]
CITIES = ["Lisbon", "Nairobi", "Osaka", "Vienna", "Bogota", "Tallinn",
          "Marrakesh", "Adelaide", "Valparaiso", "Tbilisi", "Porto",
          "Hanoi", "Quebec", "Seville", "Krakow", "Geneva"]
ORGS = ["the Meridian Institute", "Halcyon Labs", "the Orchard Foundation",
        "Northwind Capital", "the Crescent Society", "Bluewater Group",
        "the Atlas Initiative", "Redwood Analytics", "the Lyric Theatre",
        "Summit Partners", "the Beacon Council", "Harbor Collective"]
TOPICS = ["climate policy", "urban farming", "deep sea mining",
          "rail transit", "vaccine research", "solar manufacturing",
          "coastal erosion", "wildlife corridors", "housing reform",
          "water rights", "grain exports", "battery recycling"]
VERBS = ["speaks about", "presents findings on", "unveils a plan for",
         "debates the future of", "announces new funding for",
         "leads a workshop on", "opens an exhibit on",
         "testifies about"]
WEEKDAYS = ["Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
            "Saturday", "Sunday"]


def make_articles(n: int, rng: np.random.Generator) -> list[dict]:
    arts = []
    for i in range(n):
        person = (FIRST[int(rng.integers(len(FIRST)))] + " "
                  + LAST[int(rng.integers(len(LAST)))])
        city = CITIES[i % len(CITIES)]
        org = ORGS[int(rng.integers(len(ORGS)))]
        topic = TOPICS[int(rng.integers(len(TOPICS)))]
        verb = VERBS[int(rng.integers(len(VERBS)))]
        day = WEEKDAYS[int(rng.integers(len(WEEKDAYS)))]
        caption = f"{person} {verb} {topic} at {org} in {city} on {day}."
        ents_cap = [{"text": person, "label": "PERSON"},
                    {"text": city, "label": "GPE"},
                    {"text": org.removeprefix("the "), "label": "ORG"}]
        paras = [
            f"{city} hosted a gathering of researchers this week, and "
            f"{person} was among the first to arrive. Delegates from "
            f"{org} filled the main hall to discuss {topic}.",
            f"\"The work on {topic} cannot wait,\" {person} told the "
            f"audience on {day}. Organizers at {org} said attendance "
            f"doubled compared with last year.",
            f"After the session, {person} met local officials in {city} "
            f"to outline the next phase. A report on {topic} is expected "
            f"later this year.",
        ]
        h = f"qh{i:04d}"
        face = rng.standard_normal((1, 512)).astype(np.float32)
        face /= np.linalg.norm(face)
        arts.append({
            "web_url": f"https://example.com/quality/{i}",
            "headline": {"main": f"{person} on {topic} in {city}"},
            "image_positions": [1],
            "parsed_section": [
                {"type": "paragraph", "text": paras[0],
                 "named_entities": ents_cap},
                {"type": "caption", "text": caption, "hash": h,
                 "named_entities": ents_cap,
                 "facenet_details": {
                     "embeddings": np.round(face, 4).tolist()}},
                {"type": "paragraph", "text": paras[1],
                 "named_entities": ents_cap},
                {"type": "paragraph", "text": paras[2],
                 "named_entities": ents_cap},
            ]})
    return arts


def train_bpe(texts: list[str], n_merges: int) -> tuple[dict, list]:
    """Classic BPE over GPT-2 pre-tokens: repeatedly merge the most
    frequent symbol pair (ties -> lexicographically smallest pair) so the
    result is a pure function of the corpus."""
    b2u = bytes_to_unicode()
    words: collections.Counter = collections.Counter()
    for t in texts:
        for chunk in _PRETOKENIZE.findall(t):
            words[tuple(b2u[b] for b in chunk.encode("utf-8"))] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, c in words.items():
            for a, b in zip(w[:-1], w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_count = max(pairs.values())
        if best_count < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_count)
        merges.append(best)
        merged = best[0] + best[1]
        new_words: collections.Counter = collections.Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words

    vocab_tokens = (["<s>", "<pad>", "</s>", "<unk>"]
                    + list(b2u.values()) + [a + b for a, b in merges])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    return vocab, merges


def write_features(arts: list[dict], out: str, seed: int) -> None:
    """Per-hash object features + image grids, seeded by the hash index so
    they are identical across regenerations (committed JSONL stays free of
    megabyte float blobs)."""
    os.makedirs(os.path.join(out, "grids"), exist_ok=True)
    with open(os.path.join(out, "objects.jsonl"), "w") as f:
        for a in arts:
            for s in a["parsed_section"]:
                if s["type"] != "caption":
                    continue
                h = s["hash"]
                r = np.random.default_rng(seed * 100003
                                          + int(h.removeprefix("qh")))
                feats = r.standard_normal((6, 2048)).astype(np.float32)
                f.write(json.dumps(
                    {"hash": h,
                     "object_features": np.round(feats, 3).tolist()}) + "\n")
                grid = r.standard_normal((49, 2048)).astype(np.float16)
                np.save(os.path.join(out, "grids", f"{h}.npy"), grid)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--merges", type=int, default=448)
    ap.add_argument("--features-only", action="store_true",
                    help="regenerate objects.jsonl + grids/ from an "
                    "existing articles.jsonl (the committed corpus)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    arts_path = os.path.join(args.out, "articles.jsonl")
    if args.features_only:
        with open(arts_path, encoding="utf-8") as f:
            arts = [json.loads(l) for l in f if l.strip()]
        write_features(arts, args.out, args.seed)
        print(json.dumps({"articles": len(arts), "features": "regenerated"}))
        return 0

    rng = np.random.default_rng(args.seed)
    arts = make_articles(args.n, rng)
    with open(arts_path, "w") as f:
        for a in arts:
            f.write(json.dumps(a) + "\n")

    texts = [s["text"] for a in arts for s in a["parsed_section"]]
    vocab, merges = train_bpe(texts, args.merges)
    with open(os.path.join(args.out, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(args.out, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")

    gaz = {}
    for a in arts:
        for s in a["parsed_section"]:
            for e in s.get("named_entities", []):
                gaz[e["text"]] = e["label"]
    with open(os.path.join(args.out, "entities.json"), "w") as f:
        json.dump(gaz, f, indent=1, sort_keys=True)

    write_features(arts, args.out, args.seed)
    print(json.dumps({"articles": len(arts), "vocab": len(vocab),
                      "merges": len(merges), "entities": len(gaz)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
