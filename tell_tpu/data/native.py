"""ctypes bindings for the native (C++) host-path components.

`native_bpe(vocab, merges)` returns a NativeBPE with the same encode/decode
surface as the pure-Python ByteBPE, backed by native/bpe.cpp (GPT-2 regex
pre-tokenizer with exact unicode tables + BPE merge loop). The shared
library is built on demand with make; anything failing (no compiler, no
make) falls back to the Python implementation transparently.

The reference's equivalent of this layer is fairseq's (C-accelerated)
GPT-2 BPE loaded via torch.hub (roberta_indexer.py:55-60).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("tell_tpu.native")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtnt_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception as e:  # pragma: no cover
        log.warning("native build failed: %s", e)
        return False


def load_library():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover
        log.warning("native load failed: %s", e)
        return None
    lib.tnt_bpe_new.restype = ctypes.c_void_p
    lib.tnt_bpe_new.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.tnt_bpe_free.argtypes = [ctypes.c_void_p]
    lib.tnt_bpe_encode.restype = ctypes.c_int
    lib.tnt_bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
    lib.tnt_npz_open.restype = ctypes.c_void_p
    lib.tnt_npz_open.argtypes = [ctypes.c_char_p]
    lib.tnt_npz_close.argtypes = [ctypes.c_void_p]
    lib.tnt_npz_count.restype = ctypes.c_int
    lib.tnt_npz_count.argtypes = [ctypes.c_void_p]
    lib.tnt_npz_name.restype = ctypes.c_int
    lib.tnt_npz_name.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_char_p, ctypes.c_int]
    lib.tnt_npz_info.restype = ctypes.c_int
    lib.tnt_npz_info.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.tnt_npz_read.restype = ctypes.c_int64
    lib.tnt_npz_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_void_p]
    lib.tnt_npz_read_multi.restype = ctypes.c_int64
    lib.tnt_npz_read_multi.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
    lib.tnt_npz_gather_pad.restype = ctypes.c_int64
    lib.tnt_npz_gather_pad.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.c_uint32, ctypes.c_int]
    _lib = lib
    return lib


class NativeBPE:
    """encode() via the C++ core; decode() delegates to the Python tables
    (decode is not hot — it runs per generated caption, not per corpus)."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 lib=None):
        self._lib = lib or load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        tokens = list(vocab.keys())
        ids = np.asarray([vocab[t] for t in tokens], np.int32)
        blob = "\n".join(tokens).encode("utf-8")
        mblob = "\n".join(f"{a} {b}" for a, b in merges).encode("utf-8")
        unk = vocab.get("<unk>", 3)
        self._h = self._lib.tnt_bpe_new(
            blob, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(tokens), mblob, len(merges), unk)
        if not self._h:
            raise RuntimeError("native BPE construction failed (null "
                               "handle) — callers fall back to ByteBPE")
        # Python twin for decode()
        from .tokenizer import ByteBPE
        self._py = ByteBPE(vocab, merges)
        self.encoder = self._py.encoder
        self.decoder = self._py.decoder
        self.byte_encoder = self._py.byte_encoder
        self.byte_decoder = self._py.byte_decoder

    def __del__(self):
        try:
            if getattr(self, "_h", None) and self._lib is not None:
                self._lib.tnt_bpe_free(self._h)
        except Exception:  # pragma: no cover
            pass

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        if b"\x00" in data:
            # the C API takes a NUL-terminated string; embedded NULs (seen
            # in scraped data) would silently truncate — the Python twin
            # byte-maps NUL like any other byte
            return self._py.encode(text)
        cap = max(4 * len(data) + 16, 64)
        out = np.empty((cap,), np.int32)
        n = self._lib.tnt_bpe_encode(
            self._h, data, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap)
        if n < 0:  # pragma: no cover - cap is generous
            raise RuntimeError("native encode overflow")
        return out[:n].tolist()

    def decode(self, ids) -> str:
        return self._py.decode(ids)

    def _bpe(self, token: str) -> list[str]:
        return self._py._bpe(token)


class NativeShardReader:
    """Drop-in for records.ShardReader backed by native/npz.cpp.

    The shard is mmapped once; the zip central directory and every
    member's .npy header are parsed at open in C++, and each field read
    is a single memcpy — no Python zipfile, no CRC pass, no per-read
    header parsing. Reads are copied out of the mapping (not aliased), so
    examples stay valid after the LRU evicts/closes the shard handle.
    """

    def __init__(self, path: str, lib=None):
        self._lib = lib or load_library()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.path = path
        self._h = None
        self.open()
        try:
            n = self._lib.tnt_npz_count(self._h)
            namebuf = ctypes.create_string_buffer(512)
            dbuf = ctypes.create_string_buffer(64)
            shape = (ctypes.c_int64 * 8)()
            # member index + dtype/shape per (example, field), parsed once
            self._members: dict[tuple[int, str], tuple[int, np.dtype,
                                                       tuple]] = {}
            self._fields: dict[int, list[str]] = {}
            self._len = 0
            for i in range(n):
                if self._lib.tnt_npz_name(self._h, i, namebuf, 512) < 0:
                    raise RuntimeError("member name overflow")
                name = namebuf.value.decode("utf-8")
                ndim = self._lib.tnt_npz_info(self._h, i, dbuf, 64, shape, 8)
                if ndim < 0:
                    raise RuntimeError(f"bad member {name}")
                dt = np.dtype(dbuf.value.decode("ascii"))
                shp = tuple(shape[d] for d in range(ndim))
                if name == "__len__":
                    buf = np.empty(shp, dt)
                    self._read_into(i, buf)
                    self._len = int(buf)
                    continue
                idx_s, field = name.split("/", 1)
                idx = int(idx_s)
                self._members[(idx, field)] = (i, dt, shp)
                self._fields.setdefault(idx, []).append(field)
        except Exception:
            self.close()
            raise

    def _read_into(self, i: int, arr: np.ndarray) -> None:
        got = self._lib.tnt_npz_read(
            self._h, i, arr.ctypes.data_as(ctypes.c_void_p))
        if got != arr.nbytes:
            raise RuntimeError(
                f"short read on {self.path}[{i}]: {got} != {arr.nbytes}")

    def open(self):
        if self._h is None:
            h = self._lib.tnt_npz_open(self.path.encode("utf-8"))
            if not h:
                raise RuntimeError(f"native npz open failed: {self.path}")
            self._h = h

    def close(self):
        if self._h is not None:
            self._lib.tnt_npz_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # pragma: no cover
            pass

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int) -> dict:
        self.open()
        fields = self._fields.get(i, [])
        n = len(fields)
        arrs = []
        idx = (ctypes.c_int32 * n)()
        ptrs = (ctypes.c_void_p * n)()
        expect = 0
        for k, field in enumerate(fields):
            mi, dt, shp = self._members[(i, field)]
            arr = np.empty(shp, dt)
            arrs.append(arr)
            idx[k] = mi
            ptrs[k] = arr.ctypes.data
            expect += arr.nbytes
        # one FFI round-trip for the whole example (per-field calls cost
        # ~35 us of ctypes overhead each — more than the memcpys)
        got = self._lib.tnt_npz_read_multi(self._h, idx, ptrs, n)
        if got != expect:
            raise RuntimeError(
                f"short read on {self.path}[{i}]: {got} != {expect}")
        out = {}
        for field, arr in zip(fields, arrs):
            if arr.dtype.kind == "U" and arr.ndim == 0:
                out[field] = arr.item()  # str(0-d) goes through arrayprint
            else:
                out[field] = arr
        return out

    # --- lazy-example surface (zero-read metadata + per-field access) ---

    def fields_of(self, i: int) -> list[str]:
        return self._fields.get(i, [])

    def field_shape(self, i: int, field: str) -> tuple | None:
        m = self._members.get((i, field))
        return m[2] if m is not None else None

    def field_dtype(self, i: int, field: str):
        m = self._members.get((i, field))
        return m[1] if m is not None else None

    def field_member(self, i: int, field: str):
        """(open mmap handle, member index) for the C++ gather — opens the
        shard if the LRU evicted it."""
        m = self._members.get((i, field))
        if m is None:
            return None
        self.open()
        return self._h, m[0]

    def read_field(self, i: int, field: str):
        m = self._members.get((i, field))
        if m is None:
            raise KeyError(field)
        self.open()
        mi, dt, shp = m
        arr = np.empty(shp, dt)
        self._read_into(mi, arr)
        if dt.kind == "U" and arr.ndim == 0:
            return arr.item()
        return arr


def gather_pad(examples: list, field: str, out: np.ndarray,
               pad: int, convert_f16: bool = False) -> bool:
    """Fill the row-major batch buffer `out` ([B, ...]) with each example's
    `field`, truncating/padding rows to the buffer shape, entirely in C++
    (one FFI call per field per batch). `pad` is the raw 4-byte pattern
    (e.g. PAD_ID, -1, float32 NaN bits). Returns False when any example
    is not native-backed (caller falls back to the Python packing path).
    Examples missing the field get all-pad rows."""
    lib = load_library()
    if lib is None:
        return False
    n = len(examples)
    handles = (ctypes.c_void_p * n)()
    idx = (ctypes.c_int32 * n)()
    for k, ex in enumerate(examples):
        if not hasattr(ex, "field_member"):
            return False                    # plain dict: Python packing path
        if field not in ex:
            handles[k], idx[k] = None, -1   # missing field: all-pad row
            continue
        fm = ex.field_member(field)
        if fm is None:
            return False                    # non-native reader backing
        handles[k], idx[k] = fm
    row_elems = int(np.prod(out.shape[1:], dtype=np.int64))
    got = lib.tnt_npz_gather_pad(
        handles, idx, n, out.ctypes.data_as(ctypes.c_void_p),
        row_elems, out.dtype.itemsize, ctypes.c_uint32(pad & 0xFFFFFFFF),
        1 if convert_f16 else 0)
    if got < 0:
        raise RuntimeError(f"native gather failed for field {field}")
    return True


F32_NAN_BITS = 0x7FC00000


def native_shard_reader(path: str):
    """NativeShardReader when the library is available and the shard
    parses (stored members, no zip64), else the Python ShardReader."""
    if os.environ.get("TELL_TPU_NATIVE_IO", "1") != "0":
        try:
            return NativeShardReader(path)
        except Exception as e:
            log.info("falling back to Python ShardReader for %s: %s",
                     path, e)
    from .records import ShardReader
    return ShardReader(path)


def native_bpe(vocab: dict[str, int], merges: list[tuple[str, str]]):
    """NativeBPE when buildable, else the pure-Python ByteBPE."""
    try:
        return NativeBPE(vocab, merges)
    except Exception as e:
        log.info("falling back to Python BPE: %s", e)
        from .tokenizer import ByteBPE
        return ByteBPE(vocab, merges)
