"""Offline preprocessing: article documents -> training shards.

Replaces the reference's per-epoch Mongo + image-decode + frozen-ResNet work
(SURVEY.md §2.5, §3.1 host path) with a run-once pipeline:

  articles.jsonl (exported Mongo docs) + processed images
      -> context assembly (readers.py) -> byte-BPE ids
      -> ResNet-152 grid features (frozen tower, computed ONCE, fp16)
      -> sharded .npz records (records.py)

The reference recomputes the frozen ResNet on every epoch of every run; with
the tower frozen, its output is a pure function of the image, so we hoist it
out of training entirely — one of the structural wins over the reference.
"""
from __future__ import annotations

import json
import re
import os
from typing import Callable, Iterator

import numpy as np

from .readers import ReaderConfig, iter_examples
from .records import write_shard
from .tokenizer import RobertaTokenizer


def entity_occurrences(text: str, entities: list[str]
                       ) -> list[tuple[int, int, int]]:
    """All occurrences of each entity string as (start, end, 1-based index)
    — the copy readers' span sets (nytimes_copy_matched.py:36-326 store
    spaCy spans; we re-find the surface strings in the assembled text)."""
    spans = []
    for i, name in enumerate(entities):
        if not name:
            continue
        # word-boundary match: a short name must not match inside a longer
        # word ('Rose' in 'Rosenberg') — the reference's spans come from
        # spaCy tokens, which are whole words by construction
        pat = r"(?<!\w)" + re.escape(name) + r"(?!\w)"
        for m in re.finditer(pat, text):
            spans.append((m.start(), m.end(), i + 1))
    return spans


def read_articles_jsonl(path: str) -> Iterator[dict]:
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def load_objects_jsonl(path: str) -> Callable[[str], dict | None]:
    """Per-image-hash object store: the output of tools/annotate_objects.py
    (one JSON line per hash with "object_features"), loaded once into a
    dict — the TPU-native stand-in for the reference's `objects` Mongo
    collection lookups (nytimes_faces_ner_matched.py:251-262)."""
    store: dict[str, dict] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                d = json.loads(line)
                store[d["hash"]] = d
    return store.get


def make_image_grid_fn(images_dir: str, towers_dir: str | None = None
                       ) -> Callable[[str], np.ndarray | None]:
    """hash -> [49, 2048] ResNet-152 grid features for preprocess.

    Precomputed `<hash>.npy` files win (the hoisted-frozen-tower layout —
    grids are a pure function of the image, computed once). Raw
    `<hash>.jpg/.jpeg/.png` images fall back to an on-the-fly embed
    through the converted ResNet-152 in `towers_dir` (the reference
    instead re-ran ResNet every epoch, resnet.py:120-126). Missing hash
    -> None (preprocess skips the example, mirroring the reference's
    skip-on-missing-image)."""
    state: dict = {}

    def embed(path: str) -> np.ndarray | None:
        if "fn" not in state:
            if not towers_dir or not os.path.exists(
                    os.path.join(towers_dir, "resnet152")):
                state["fn"] = None
            else:
                import jax
                import orbax.checkpoint as ocp
                from ..models.backbones.resnet import (
                    ResNetConfig, preprocess_image, resnet_forward)
                params = ocp.PyTreeCheckpointer().restore(
                    os.path.join(towers_dir, "resnet152"))
                rcfg = ResNetConfig.resnet152()
                state["fn"] = jax.jit(
                    lambda img: resnet_forward(
                        params, rcfg, preprocess_image(img[None] / 255.0),
                        pool=False)[0])
        if state["fn"] is None:
            return None
        from PIL import Image
        from .images import resize_shortest_crop
        im = resize_shortest_crop(Image.open(path).convert("RGB"))
        return np.asarray(state["fn"](np.asarray(im, np.float32)))

    def fn(image_hash: str) -> np.ndarray | None:
        if not image_hash:
            return None
        npy = os.path.join(images_dir, image_hash + ".npy")
        if os.path.exists(npy):
            return np.load(npy)
        for ext in (".jpg", ".jpeg", ".png"):
            p = os.path.join(images_dir, image_hash + ext)
            if os.path.exists(p):
                return embed(p)
        return None

    return fn


def preprocess_split(articles: Iterator[dict], tokenizer: RobertaTokenizer,
                     reader_cfg: ReaderConfig, out_dir: str, split: str,
                     image_grid_fn: Callable[[str], np.ndarray] | None = None,
                     objects_lookup=None, shard_size: int = 512,
                     max_caption_len: int = 100, glove=None) -> int:
    """Returns the number of examples written."""
    os.makedirs(out_dir, exist_ok=True)
    count_tokens = lambda s: len(tokenizer.bpe.encode(s))  # noqa: E731

    buf: list[dict] = []
    n_total = 0
    n_shard = 0

    def flush():
        nonlocal buf, n_shard
        if buf:
            write_shard(os.path.join(out_dir,
                                     f"{split}-{n_shard:05d}.npz"), buf)
            n_shard += 1
            buf = []

    for article in articles:
        for ex in iter_examples(article, reader_cfg, count_tokens,
                                objects_lookup):
            if ex.get("copy_entities") is not None:
                # pointer models: indexed entity masks
                # (roberta_indexer_names_matched.py:170-202)
                ents = ex["copy_entities"]
                ctx_spans = entity_occurrences(ex["context"], ents)
                cap_spans = entity_occurrences(ex["caption"], ents)
                context_ids, proper = tokenizer.encode_with_indexed_spans(
                    ex["context"], ctx_spans)
                caption_ids, cmask = tokenizer.encode_with_indexed_spans(
                    ex["caption"], cap_spans, max_len=max_caption_len)
                rec = {
                    "context_ids": np.asarray(context_ids, np.int32),
                    "caption_ids": np.asarray(caption_ids, np.int32),
                    "proper_masks": np.asarray(proper, np.int32),
                    "caption_copy_masks": np.asarray(cmask, np.int32),
                    "image_hash": ex["image_hash"],
                    "caption": ex["caption"],
                    "web_url": ex.get("web_url", ""),
                }
            else:
                rec = {
                    "context_ids": np.asarray(
                        tokenizer.encode(ex["context"]), np.int32),
                    "caption_ids": np.asarray(
                        tokenizer.encode(ex["caption"],
                                         max_len=max_caption_len),
                        np.int32),
                    "image_hash": ex["image_hash"],
                    "caption": ex["caption"],
                    "web_url": ex.get("web_url", ""),
                }
            if glove is not None:
                # glove experiments: article features ARE the context
                # (no RoBERTa encode at train time)
                rec["article"] = glove.embed_text(ex["context"]) \
                    .astype(np.float16)
            if ex.get("face_embeds") is not None:
                rec["face_embeds"] = ex["face_embeds"]
            if ex.get("obj_embeds") is not None:
                rec["obj_embeds"] = ex["obj_embeds"]
            if image_grid_fn is not None:
                grid = image_grid_fn(ex["image_hash"])
                if grid is None:
                    continue  # mirrors the reference's skip-on-missing-image
                rec["image_grid"] = grid.astype(np.float16)
            buf.append(rec)
            n_total += 1
            if len(buf) >= shard_size:
                flush()
    flush()
    return n_total
