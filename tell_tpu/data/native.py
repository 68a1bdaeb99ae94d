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


def native_bpe(vocab: dict[str, int], merges: list[tuple[str, str]]):
    """NativeBPE when buildable, else the pure-Python ByteBPE."""
    try:
        return NativeBPE(vocab, merges)
    except Exception as e:
        log.info("falling back to Python BPE: %s", e)
        from .tokenizer import ByteBPE
        return ByteBPE(vocab, merges)
