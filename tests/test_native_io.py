"""Native npz shard reader (native/npz.cpp) vs the Python ShardReader.

The native reader must reproduce the Python reader field-for-field on
real record schemas (ragged int32 ids, fp16 grids, bool, 0-d unicode
strings) — records.RecordDataset routes through it by default.
"""
import numpy as np
import pytest

from tell_tpu.data.native import load_library, NativeShardReader
from tell_tpu.data.records import RecordDataset, ShardReader, write_shard

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native library unavailable")


def _examples(rng, n=7):
    out = []
    for i in range(n):
        ex = {
            "context_ids": rng.integers(0, 50000,
                                        rng.integers(3, 600), np.int32),
            "caption_ids": rng.integers(0, 50000,
                                        rng.integers(2, 100), np.int32),
            "image_grid": rng.normal(size=(49, 8)).astype(np.float16),
            "caption": f"caption {i} — héllo ☃ {'x' * i}",
            "image_hash": f"{i:032x}",
            "web_url": "https://example.com/" + "a" * i,
        }
        if i % 2 == 0:
            ex["face_embeds"] = rng.normal(size=(3, 16)).astype(np.float32)
        if i % 3 == 0:
            ex["real_flag"] = np.asarray(i % 2 == 0)
        out.append(ex)
    return out


def _assert_example_equal(a: dict, b: dict):
    assert sorted(a) == sorted(b)
    for k in a:
        if isinstance(a[k], str) or isinstance(b[k], str):
            assert str(a[k]) == str(b[k]), k
        else:
            va, vb = np.asarray(a[k]), np.asarray(b[k])
            assert va.dtype == vb.dtype, k
            assert va.shape == vb.shape, k
            assert np.array_equal(va, vb), k


def test_native_reader_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "t-00000.npz")
    write_shard(path, _examples(rng))

    py = ShardReader(path)
    nat = NativeShardReader(path)
    assert len(py) == len(nat)
    for i in range(len(py)):
        _assert_example_equal(py[i], nat[i])


def test_native_reader_survives_close_reopen(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "t-00000.npz")
    write_shard(path, _examples(rng, n=3))
    nat = NativeShardReader(path)
    first = nat[0]
    nat.close()       # LRU eviction path
    again = nat[0]    # transparently reopens
    _assert_example_equal(first, again)
    # reads are copies, not views of the (now remapped) file
    assert np.asarray(first["context_ids"]).flags.owndata


def test_record_dataset_epoch_native_vs_python(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    for s in range(2):
        write_shard(str(tmp_path / f"t-{s:05d}.npz"), _examples(rng, n=5))
    pattern = str(tmp_path / "t-*.npz")

    native = list(RecordDataset(pattern, seed=7).epoch())
    monkeypatch.setenv("TELL_TPU_NATIVE_IO", "0")
    python = list(RecordDataset(pattern, seed=7).epoch())
    assert len(native) == len(python) == 10
    for a, b in zip(native, python):
        _assert_example_equal(a, b)


def _flagship_examples(rng, n=13):
    out = []
    for i in range(n):
        ex = {
            "context_ids": rng.integers(0, 50000,
                                        int(rng.integers(5, 300)), np.int32),
            "caption_ids": rng.integers(0, 50000,
                                        int(rng.integers(2, 40)), np.int32),
            "image_grid": rng.normal(size=(49, 32)).astype(np.float16),
            "caption": f"cap {i}",
            "image_hash": f"{i:032x}",
        }
        if i % 3 != 0:  # some examples have no faces/objects at all
            ex["face_embeds"] = rng.normal(size=(int(rng.integers(1, 7)),
                                                 8)).astype(np.float32)
            ex["obj_embeds"] = rng.normal(size=(int(rng.integers(1, 80)),
                                                16)).astype(np.float32)
        out.append(ex)
    # ensure example 0 carries the optional fields (pack gates on it)
    if "face_embeds" not in out[0]:
        out[0], out[1] = out[1], out[0]
    return out


def _assert_batches_equal(a: list[dict], b: list[dict]):
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert sorted(ba) == sorted(bb)
        for k in ba:
            if isinstance(ba[k], list):
                assert ba[k] == bb[k], k
                continue
            va, vb = np.asarray(ba[k]), np.asarray(bb[k])
            assert va.dtype == vb.dtype, k
            assert va.shape == vb.shape, k
            if va.dtype.kind == "f":
                assert np.array_equal(va, vb, equal_nan=True), k
            else:
                assert np.array_equal(va, vb), k


def test_gather_pack_matches_python_pack(tmp_path, monkeypatch):
    """epoch(lazy=True) + C++ gather assembly == the Python packing path,
    bit-for-bit, on the flagship schema (fp16 grids, ragged NaN-padded
    embeds, examples missing optional fields)."""
    from tell_tpu.data.bucketing import BucketingConfig, bucket_batches

    rng = np.random.default_rng(5)
    for s in range(2):
        write_shard(str(tmp_path / f"t-{s:05d}.npz"),
                    _flagship_examples(rng))
    pattern = str(tmp_path / "t-*.npz")
    cfg = BucketingConfig(article_lengths=(64, 256),
                          caption_lengths=(16, 32),
                          max_batch=8, max_faces=4, face_dim=8,
                          max_objects=16, object_dim=16)

    fast = list(bucket_batches(
        RecordDataset(pattern, seed=9).epoch(lazy=True), cfg,
        include_meta=True))
    monkeypatch.setenv("TELL_TPU_NATIVE_IO", "0")
    slow = list(bucket_batches(
        RecordDataset(pattern, seed=9).epoch(), cfg, include_meta=True))
    _assert_batches_equal(fast, slow)
    # NaN padding actually present where an example had no faces
    assert any(np.isnan(b["face_embeds"]).any() for b in fast)


def test_gather_pack_glove_article_features(tmp_path, monkeypatch):
    """The GloVe experiments store precomputed fp16 article features; the
    gather path must upconvert + zero-pad + rebuild the mask identically."""
    from tell_tpu.data.bucketing import BucketingConfig, bucket_batches

    rng = np.random.default_rng(6)
    exs = []
    for i in range(9):
        exs.append({
            "context_ids": rng.integers(0, 300,
                                        int(rng.integers(4, 60)), np.int32),
            "caption_ids": rng.integers(0, 300,
                                        int(rng.integers(2, 15)), np.int32),
            "article": rng.normal(size=(int(rng.integers(4, 60)),
                                        12)).astype(np.float16),
        })
    write_shard(str(tmp_path / "t-00000.npz"), exs)
    pattern = str(tmp_path / "t-*.npz")
    cfg = BucketingConfig(article_lengths=(64,), caption_lengths=(16,),
                          max_batch=4)
    fast = list(bucket_batches(
        RecordDataset(pattern, seed=2).epoch(lazy=True), cfg))
    monkeypatch.setenv("TELL_TPU_NATIVE_IO", "0")
    slow = list(bucket_batches(RecordDataset(pattern, seed=2).epoch(), cfg))
    _assert_batches_equal(fast, slow)


def test_gather_pack_pointer_masks(tmp_path, monkeypatch):
    """Pointer-model shards carry proper/copy masks padded with -1."""
    from tell_tpu.data.bucketing import BucketingConfig, bucket_batches

    rng = np.random.default_rng(7)
    exs = []
    for i in range(8):
        nc = int(rng.integers(4, 60))
        nk = int(rng.integers(2, 15))
        exs.append({
            "context_ids": rng.integers(0, 300, nc, np.int32),
            "caption_ids": rng.integers(0, 300, nk, np.int32),
            "proper_masks": rng.integers(-1, 5, nc).astype(np.int32),
            "caption_copy_masks": rng.integers(-1, 5, nk).astype(np.int32),
        })
    write_shard(str(tmp_path / "t-00000.npz"), exs)
    pattern = str(tmp_path / "t-*.npz")
    cfg = BucketingConfig(article_lengths=(64,), caption_lengths=(16,),
                          max_batch=4)
    fast = list(bucket_batches(
        RecordDataset(pattern, seed=2).epoch(lazy=True), cfg))
    monkeypatch.setenv("TELL_TPU_NATIVE_IO", "0")
    slow = list(bucket_batches(RecordDataset(pattern, seed=2).epoch(), cfg))
    _assert_batches_equal(fast, slow)
    assert any((b["proper_masks"] == -1).any() for b in fast)


def test_lazy_example_mapping_surface(tmp_path):
    """LazyExample must behave like the dict it stands in for."""
    rng = np.random.default_rng(8)
    write_shard(str(tmp_path / "t-00000.npz"), _examples(rng, n=3))
    ds = RecordDataset(str(tmp_path / "t-*.npz"))
    lazy = list(ds.epoch(lazy=True, shuffle=False))
    eager = list(RecordDataset(str(tmp_path / "t-*.npz")).epoch(
        shuffle=False))
    for le, ee in zip(lazy, eager):
        assert sorted(le.keys()) == sorted(ee.keys())
        assert ("caption" in le) == ("caption" in ee)
        assert le.get("missing", 42) == 42
        assert le.field_len("context_ids") == len(ee["context_ids"])
        _assert_example_equal(le.materialize(), ee)
        for k in ee:
            v = le[k]
            if isinstance(v, str):
                assert v == ee[k]
            else:
                assert np.array_equal(v, ee[k])


def test_native_open_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not a zip file at all, definitely " * 4)
    with pytest.raises(RuntimeError):
        NativeShardReader(str(bad))


def test_fallback_on_compressed_npz(tmp_path):
    # savez_compressed members are deflated — the native reader refuses
    # (open fails) and native_shard_reader falls back to ShardReader
    path = str(tmp_path / "c.npz")
    with open(path, "wb") as f:
        np.savez_compressed(f, **{"__len__": np.asarray(1),
                                  "0/x": np.arange(5, dtype=np.int32)})
    with pytest.raises(RuntimeError):
        NativeShardReader(path)
    from tell_tpu.data.native import native_shard_reader
    r = native_shard_reader(path)
    assert isinstance(r, ShardReader)
    assert np.array_equal(r[0]["x"], np.arange(5, dtype=np.int32))
