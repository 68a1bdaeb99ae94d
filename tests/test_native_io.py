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
