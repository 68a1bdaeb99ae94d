"""Token-budget bucketing into FIXED pad shapes.

The reference uses AllenNLP's bucket iterator (batch 16, <=16384 tokens,
sort by context+caption length; config.yaml:99-110) which emits arbitrary
pad shapes — every batch a fresh shape. Under XLA that would recompile per
shape, so we quantize: article lengths to {128, 256, 512}, caption lengths
to {16, 32, 64, 100}, and pick the largest batch size within the token
budget for each (article, caption) bucket, rounded down to a power of two.
A handful of distinct shapes -> a handful of compiled programs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

PAD_ID = 1


@dataclass(frozen=True)
class BucketingConfig:
    article_lengths: tuple[int, ...] = (128, 256, 512)
    caption_lengths: tuple[int, ...] = (16, 32, 64, 100)
    token_budget: int = 16384
    max_batch: int = 64
    min_batch: int = 1
    max_faces: int = 4
    face_dim: int = 512
    max_objects: int = 64
    object_dim: int = 2048


def _bucket_len(n: int, lengths: tuple[int, ...]) -> int:
    for L in lengths:
        if n <= L:
            return L
    return lengths[-1]


def _batch_size(article_len: int, caption_len: int,
                cfg: BucketingConfig) -> int:
    per_example = article_len + caption_len
    b = max(cfg.token_budget // per_example, cfg.min_batch)
    b = min(b, cfg.max_batch)
    return 1 << (b.bit_length() - 1)  # floor to power of two


def _pad_masks(masks: np.ndarray, length: int) -> np.ndarray:
    """Copy/proper masks pad with -1 (roberta_indexer.py:185-200)."""
    masks = np.asarray(masks, np.int32)[:length]
    out = np.full((length,), -1, np.int32)
    out[: len(masks)] = masks
    return out


def _native_pack(examples: list, article_len: int, caption_len: int,
                 cfg: BucketingConfig) -> dict | None:
    """Batch assembly fully in C++ (native.gather_pad): each field is one
    FFI call that copies straight from the shard mmaps into the padded
    batch buffer. Returns None when the examples are not native-backed
    LazyExamples — pack_batch then takes the Python path."""
    e0 = examples[0]
    if not hasattr(e0, "field_member"):
        return None
    from .native import F32_NAN_BITS, gather_pad

    B = len(examples)
    batch: dict = {}
    ctx = np.empty((B, article_len), np.int32)
    if not gather_pad(examples, "context_ids", ctx, PAD_ID):
        return None  # mixed/non-native readers: fall back wholesale
    batch["context_ids"] = ctx
    cap = np.empty((B, caption_len), np.int32)
    gather_pad(examples, "caption_ids", cap, PAD_ID)
    batch["caption_ids"] = cap
    batch["article_mask"] = ctx == PAD_ID

    if "article" in e0:
        dt = e0.field_dtype("article")
        dim = e0.field_shape("article")[-1] if hasattr(e0, "field_shape") \
            else np.asarray(e0["article"]).shape[-1]
        feats = np.empty((B, article_len, dim), np.float32)
        gather_pad(examples, "article", feats, 0,
                   convert_f16=(dt == np.float16))
        batch["article"] = feats
        lens = np.asarray([min(e.field_len("article"), article_len)
                           for e in examples])
        batch["article_mask"] = np.arange(article_len)[None, :] >= lens[:, None]
    if "proper_masks" in e0:
        pm = np.empty((B, article_len), np.int32)
        gather_pad(examples, "proper_masks", pm, -1)
        batch["proper_masks"] = pm
    if "caption_copy_masks" in e0:
        cm = np.empty((B, caption_len), np.int32)
        gather_pad(examples, "caption_copy_masks", cm, -1)
        batch["caption_copy_masks"] = cm
    if "image_grid" in e0:
        gshape = e0.field_shape("image_grid")
        grids = np.empty((B,) + tuple(gshape), np.float32)
        gather_pad(examples, "image_grid", grids, 0,
                   convert_f16=(e0.field_dtype("image_grid") == np.float16))
        batch["image_grid"] = grids
    if "face_embeds" in e0:
        fe = np.empty((B, cfg.max_faces, cfg.face_dim), np.float32)
        gather_pad(examples, "face_embeds", fe, F32_NAN_BITS)
        batch["face_embeds"] = fe
    if "obj_embeds" in e0:
        oe = np.empty((B, cfg.max_objects, cfg.object_dim), np.float32)
        gather_pad(examples, "obj_embeds", oe, F32_NAN_BITS)
        batch["obj_embeds"] = oe
    return batch


def pack_batch(examples: list[dict], article_len: int, caption_len: int,
               cfg: BucketingConfig, include_meta: bool = False) -> dict:
    """Stack ragged examples into one fixed-shape numpy batch.

    include_meta: also carry string metadata ("caption", "image_hash") as
    plain lists — evaluation pops these for generations.jsonl; the trainer
    must NOT set it (strings cannot ride device_put/jit)."""
    native = _native_pack(examples, article_len, caption_len, cfg)
    if native is not None:
        if include_meta:
            for meta in ("caption", "image_hash", "web_url"):
                if meta in examples[0]:
                    native[meta] = [str(e.get(meta, "")) for e in examples]
        return native
    if hasattr(examples[0], "materialize"):
        examples = [e.materialize() for e in examples]
    B = len(examples)

    def _fill_ids(field: str, length: int) -> np.ndarray:
        # fill a preallocated [B, L] buffer row-by-row — one allocation per
        # batch instead of per-example pad + stack copy (this packing loop
        # is the host hot path once the native shard reader is in play)
        out = np.full((B, length), PAD_ID, np.int32)
        for i, e in enumerate(examples):
            ids = e[field][:length]
            out[i, : len(ids)] = ids
        return out

    batch: dict = {
        "context_ids": _fill_ids("context_ids", article_len),
        "caption_ids": _fill_ids("caption_ids", caption_len),
    }
    batch["article_mask"] = batch["context_ids"] == PAD_ID
    if "article" in examples[0]:
        # precomputed article features (GloVe experiments): pad rows to the
        # article bucket length; mask marks the padded rows
        dim = np.asarray(examples[0]["article"]).shape[-1]
        feats = np.zeros((B, article_len, dim), np.float32)
        mask = np.ones((B, article_len), bool)
        for i, e in enumerate(examples):
            a = np.asarray(e["article"], np.float32)[:article_len]
            feats[i, : len(a)] = a
            mask[i, : len(a)] = False
        batch["article"] = feats
        batch["article_mask"] = mask
    if "proper_masks" in examples[0]:
        batch["proper_masks"] = np.stack(
            [_pad_masks(e["proper_masks"], article_len) for e in examples])
    if "caption_copy_masks" in examples[0]:
        batch["caption_copy_masks"] = np.stack(
            [_pad_masks(e["caption_copy_masks"], caption_len)
             for e in examples])
    if "image_grid" in examples[0]:
        g0 = np.asarray(examples[0]["image_grid"])
        grids = np.empty((B,) + g0.shape, np.float32)
        for i, e in enumerate(examples):
            grids[i] = e["image_grid"]  # fp16 shard storage upcasts in place
        batch["image_grid"] = grids

    def _fill_embeds(field: str, n: int, dim: int) -> np.ndarray:
        # np.empty + per-row tail fill: a full-batch NaN prefill is a
        # 32 MB write for the object bucket alone (B=64 x 64 x 2048 fp32)
        # when most of it is immediately overwritten by real rows
        out = np.empty((B, n, dim), np.float32)
        for i, e in enumerate(examples):
            emb = e.get(field)
            k = 0
            if emb is not None and emb.size:
                k = min(n, emb.shape[0])
                out[i, :k] = emb[:k]
            out[i, k:] = np.nan
        return out

    if "face_embeds" in examples[0]:
        batch["face_embeds"] = _fill_embeds("face_embeds", cfg.max_faces,
                                            cfg.face_dim)
    if "obj_embeds" in examples[0]:
        batch["obj_embeds"] = _fill_embeds("obj_embeds", cfg.max_objects,
                                           cfg.object_dim)
    if include_meta:
        # string metadata rides as plain lists (evaluate.py pops these for
        # generations.jsonl: untruncated references + image linkage)
        for meta in ("caption", "image_hash", "web_url"):
            if meta in examples[0]:
                batch[meta] = [str(e.get(meta, "")) for e in examples]
    return batch


def bucket_batches(examples: Iterator[dict], cfg: BucketingConfig,
                   drop_last: bool = False,
                   include_meta: bool = False) -> Iterator[dict]:
    """Group a stream of examples into fixed-shape batches.

    Routes each example to its (article, caption) length bucket and emits a
    batch whenever a bucket fills (buffering is bounded by the bucket
    count x batch size). Mirrors the reference bucket iterator's locality
    (similar lengths batch together) without its arbitrary shapes.
    """
    buckets: dict[tuple[int, int], list[dict]] = {}
    for ex in examples:
        if hasattr(ex, "field_len"):  # lazy: lengths from the .npy headers
            nc, nk = ex.field_len("context_ids"), ex.field_len("caption_ids")
        else:
            nc, nk = len(ex["context_ids"]), len(ex["caption_ids"])
        al = _bucket_len(nc, cfg.article_lengths)
        cl = _bucket_len(nk, cfg.caption_lengths)
        key = (al, cl)
        buckets.setdefault(key, []).append(ex)
        b = _batch_size(al, cl, cfg)
        if len(buckets[key]) >= b:
            yield pack_batch(buckets[key][:b], al, cl, cfg, include_meta)
            buckets[key] = buckets[key][b:]
    if not drop_last:
        for (al, cl), rest in buckets.items():
            b = _batch_size(al, cl, cfg)
            while rest:
                chunk = rest[:b]
                # pad the final ragged batch by repeating the last example so
                # shapes stay fixed; a "real" mask marks genuine rows
                batch = pack_batch(chunk + [chunk[-1]] * (b - len(chunk)),
                                   al, cl, cfg, include_meta)
                batch["real"] = np.arange(b) < len(chunk)
                yield batch
                rest = rest[b:]
