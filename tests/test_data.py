"""Data engine tests: context assembly semantics, record round-trip, and
fixed-shape bucketing."""
import numpy as np

from tell_tpu.data.bucketing import BucketingConfig, bucket_batches
from tell_tpu.data.readers import (ReaderConfig, assemble_location_aware,
                                   assemble_simple, iter_examples, pad_embeds)
from tell_tpu.data.records import RecordDataset, ShardReader, write_shard


def make_article(n_paragraphs=12, image_pos=6):
    sections = []
    for i in range(n_paragraphs):
        if i == image_pos:
            sections.append({
                "type": "caption", "text": f"caption text {i}",
                "hash": "img123",
                "named_entities": [
                    {"label": "PERSON", "text": "Jane Doe"}],
                "facenet_details": {
                    "embeddings": np.random.rand(6, 512).tolist()},
            })
        else:
            sections.append({
                "type": "paragraph",
                "text": f"para{i} " + "word " * 10,
                "named_entities": [
                    {"label": "GPE", "text": f"City{i}"},
                    {"label": "DATE", "text": "today"}],  # filtered out
            })
    return {
        "headline": {"main": "The Headline"},
        "parsed_section": sections,
        "image_positions": [image_pos],
        "web_url": "http://example.com",
    }


def count_words(s):
    return len(s.split())


def test_location_aware_ordering_and_interleave():
    art = make_article()
    paras, names = assemble_location_aware(art, 6, count_words, budget=80)
    # title, first paragraph, then before-block (in order), then after-block
    assert paras[0] == "The Headline"
    assert paras[1].startswith("para0")
    idx = [int(p.split()[0][4:]) for p in paras[1:]]
    # before paragraphs ascending then after ascending, around pos 6
    before = [i for i in idx if i < 6][1:]
    after = [i for i in idx if i > 6]
    assert before == sorted(before) and after == sorted(after)
    assert "DATE" not in str(names) and any("City" in n for n in names)


def test_location_aware_budget_stops_growth():
    art = make_article(n_paragraphs=40, image_pos=20)
    paras_small, _ = assemble_location_aware(art, 20, count_words, budget=40)
    paras_big, _ = assemble_location_aware(art, 20, count_words, budget=4000)
    assert len(paras_small) < len(paras_big)
    assert len(paras_big) == 1 + 39  # everything included


def test_simple_assembly_truncates_at_500_words():
    art = make_article(n_paragraphs=80, image_pos=2)
    paras = assemble_simple(art)
    text = " ".join(paras)
    # keeps the paragraph that crosses the limit, then stops
    assert 500 < len(text.split()) < 600


def test_iter_examples_faces_and_objects():
    art = make_article()
    cfg = ReaderConfig()
    objects = {"img123": {"object_features": np.random.rand(3, 2048).tolist()}}
    exs = list(iter_examples(art, cfg, count_words,
                             objects_lookup=objects.get))
    assert len(exs) == 1
    ex = exs[0]
    assert ex["caption"] == "caption text 6"
    assert ex["face_embeds"].shape == (4, 512)  # top-4 of 6
    assert ex["obj_embeds"].shape == (3, 2048)
    padded = pad_embeds(ex["face_embeds"], 4, 512)
    assert not np.isnan(padded).any()
    padded2 = pad_embeds(ex["obj_embeds"], 64, 2048)
    assert np.isnan(padded2[3:]).all()


def test_records_roundtrip(tmp_path):
    examples = [
        {"context_ids": np.arange(10, dtype=np.int32),
         "caption_ids": np.arange(5, dtype=np.int32),
         "caption": "hello world",
         "face_embeds": np.random.rand(2, 8).astype(np.float32)}
        for _ in range(7)
    ]
    p = str(tmp_path / "shard-0.npz")
    write_shard(p, examples)
    r = ShardReader(p)
    assert len(r) == 7
    ex = r[3]
    np.testing.assert_array_equal(ex["context_ids"], examples[3]["context_ids"])
    assert ex["caption"] == "hello world"

    ds = RecordDataset(str(tmp_path / "shard-*.npz"), seed=1)
    seen = list(ds.epoch())
    assert len(seen) == 7
    # seeded shuffle is reproducible
    ds2 = RecordDataset(str(tmp_path / "shard-*.npz"), seed=1)
    ids1 = [tuple(e["context_ids"]) for e in RecordDataset(
        str(tmp_path / "shard-*.npz"), seed=2).epoch()]
    ids2 = [tuple(e["context_ids"]) for e in ds2.epoch()]
    assert len(ids1) == len(ids2)


def test_bucketing_fixed_shapes_and_budget():
    rng = np.random.RandomState(0)
    examples = []
    for _ in range(300):
        la = rng.randint(5, 512)
        lc = rng.randint(3, 60)
        examples.append({
            "context_ids": rng.randint(4, 100, size=la).astype(np.int32),
            "caption_ids": rng.randint(4, 100, size=lc).astype(np.int32),
        })
    cfg = BucketingConfig(token_budget=4096, max_batch=32)
    shapes = set()
    n = 0
    for batch in bucket_batches(iter(examples), cfg):
        B, AL = batch["context_ids"].shape
        _, CL = batch["caption_ids"].shape
        shapes.add((AL, CL, B))
        assert AL in cfg.article_lengths and CL in cfg.caption_lengths
        assert B * (AL + CL) <= cfg.token_budget * 2  # power-of-2 floor slack
        n += batch.get("real", np.ones(B, bool)).sum()
    assert n == 300  # nothing dropped
    assert len(shapes) <= 12  # bounded compile count


def test_copy_mask_pipeline_roundtrip(tmp_path):
    """Pointer-model data path: entity spans -> indexed BPE masks -> -1
    padded batches (roberta_indexer_names_matched.py semantics)."""
    from tell_tpu.data.pipeline import entity_occurrences
    from tell_tpu.data.bucketing import (BucketingConfig, bucket_batches)
    tok = _toy_tokenizer() if "_toy_tokenizer" in globals() else None
    text = "Tomas Maier met Tomas Maier in Milan."
    spans = entity_occurrences(text, ["Tomas Maier", "Milan"])
    assert (0, 11, 1) in spans and (16, 27, 1) in spans
    assert any(s[2] == 2 for s in spans)
    # bucketing pads masks with -1
    import numpy as np
    exs = [{"context_ids": np.arange(5) + 4,
            "caption_ids": np.arange(4) + 4,
            "proper_masks": np.array([0, 1, 1, 0, 2]),
            "caption_copy_masks": np.array([0, 1, 0, 0])}] * 2
    cfg = BucketingConfig(article_lengths=(8,), caption_lengths=(8,),
                          max_batch=2)
    batches = list(bucket_batches(iter(exs), cfg))
    b = batches[0]
    assert b["proper_masks"].shape == (2, 8)
    assert (b["proper_masks"][:, 5:] == -1).all()
    assert (b["caption_copy_masks"][:, 4:] == -1).all()


def test_glove_feature_pipeline(tmp_path):
    """GloVe experiments: vectors file -> per-example article features ->
    fixed-shape batches with a row mask."""
    import numpy as np
    from tell_tpu.data.glove import GloveVectors
    from tell_tpu.data.bucketing import BucketingConfig, bucket_batches

    gf = tmp_path / "glove.txt"
    gf.write_text("the " + " ".join(["0.5"] * 4) + "\n"
                  "news " + " ".join(["1.0"] * 4) + "\n")
    gv = GloveVectors.from_file(str(gf), dim=4)
    feats = gv.embed_text("The news about nothing")
    assert feats.shape == (4, 4)
    assert np.allclose(feats[0], 0.5)   # lowercased fallback
    assert np.allclose(feats[1], 1.0)
    assert np.allclose(feats[2], 0.0)   # OOV -> zeros

    exs = [{"context_ids": np.arange(6) + 4,
            "caption_ids": np.arange(4) + 4,
            "article": feats}] * 2
    cfg = BucketingConfig(article_lengths=(8,), caption_lengths=(8,),
                          max_batch=2)
    b = next(iter(bucket_batches(iter(exs), cfg)))
    assert b["article"].shape == (2, 8, 4)
    assert not b["article_mask"][:, :4].any()
    assert b["article_mask"][:, 4:].all()


def test_device_prefetcher_order_and_errors():
    import numpy as np
    import pytest
    from tell_tpu.data.prefetch import prefetch_to_device

    batches = [{"x": np.full((2,), i)} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert [int(b["x"][0]) for b in out] == list(range(5))

    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("loader died")

    it = prefetch_to_device(bad(), depth=1)
    next(it)
    with pytest.raises(RuntimeError, match="loader died"):
        list(it)


def test_device_prefetcher_exhaustion_and_close():
    import numpy as np
    from tell_tpu.data.prefetch import DevicePrefetcher

    pf = DevicePrefetcher(iter([{"x": np.zeros(2)}]), depth=1)
    assert len(list(pf)) == 1
    # exhausted iterator raises StopIteration again instead of hanging
    assert list(pf) == []

    # early abandonment: close() unblocks the worker and joins it
    many = ({"x": np.full((2,), i)} for i in range(100))
    pf2 = DevicePrefetcher(many, depth=1)
    next(pf2)
    pf2.close()
    assert not pf2._thread.is_alive()
    with pf2:  # context manager is idempotent
        pass


def test_dataset_process_striding_disjoint_equal(tmp_path):
    """Multi-host loader striding (RecordDataset.epoch process_index/count):
    same seed -> processes see disjoint example sets of EQUAL size whose
    union is the truncated shared epoch order."""
    examples = [
        {"context_ids": np.array([i], dtype=np.int32),
         "caption_ids": np.arange(3, dtype=np.int32)}
        for i in range(11)
    ]
    write_shard(str(tmp_path / "s-0.npz"), examples)

    def ids(pi, pc):
        ds = RecordDataset(str(tmp_path / "s-*.npz"), seed=7)
        return [int(e["context_ids"][0])
                for e in ds.epoch(process_index=pi, process_count=pc)]

    a, b = ids(0, 2), ids(1, 2)
    assert len(a) == len(b) == 5          # 11 truncated to 10, split 5/5
    assert not set(a) & set(b)
    full = RecordDataset(str(tmp_path / "s-*.npz"), seed=7)
    order = [int(e["context_ids"][0]) for e in full.epoch()][:10]
    assert sorted(a + b) == sorted(order)
    # interleaving matches the shared order exactly
    assert [x for pair in zip(a, b) for x in pair] == order
