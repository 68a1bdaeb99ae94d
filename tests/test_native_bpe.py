"""C++ byte-BPE parity against the pure-Python reference.

Exercises the native pre-tokenizer's unicode classes, contraction handling,
whitespace lookahead, the merge loop, and unknown-token fallback on
adversarial and random inputs.
"""
import json
import random

import pytest

from tell_tpu.data.native import NativeBPE, load_library
from tell_tpu.data.tokenizer import ByteBPE, bytes_to_unicode

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native toolchain unavailable")


def synthetic(tmp_path):
    b2u = bytes_to_unicode()
    chars = list(b2u.values())
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("e", "r"),
        ("Ġ", "a"), ("o", "n"), ("t", "he"), ("Ġ", "n"), ("e", "w"),
        ("Ġn", "ew"), ("s", "."), ("â", "Ģ"), ("âĢ", "Ļ"),
        ("e", "rr"),  # never fires: 'rr' is not a base symbol
    ]
    vocab_tokens = (["<s>", "<pad>", "</s>", "<unk>"] + chars
                    + [a + b for a, b in merges])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    return vocab, merges


TEXTS = [
    "the news.",
    "The New\nYork Times won't say 'hello' — it said ’this’.",
    "  multiple   spaces\tand\ttabs ",
    "café naïve 中文 \U0001f600",
    "numbers 12345 and punct!!! ...",
    "don't can't we'll they've I'm he'd it's 'd 's",
    "", " ", "  ", "\t", "\n\n\n", "a", " a", "a ",
    "trailing spaces   ",
    "mixed　ideographic　space",  # U+3000 Zs
    " nbsp runs  here",
    "ends with apostrophe '",
    "'s at the start",
    "ｆｕｌｌｗｉｄｔｈ １２３",  # fullwidth letters + numbers
]


@pytest.fixture(scope="module")
def pair():
    vocab, merges = synthetic(None)
    return ByteBPE(vocab, merges), NativeBPE(vocab, merges)


@pytest.mark.parametrize("text", TEXTS)
def test_parity_fixed(pair, text):
    py, cc = pair
    assert cc.encode(text) == py.encode(text)


def test_parity_random(pair):
    py, cc = pair
    rng = random.Random(0)
    pools = ["abcdefgh ", "the news er on in ", "'s't'll'd'",
             "áéí中文🎉 　 \t\n", "0123 !?.,:;"]
    for i in range(300):
        pool = pools[i % len(pools)]
        text = "".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
        assert cc.encode(text) == py.encode(text), repr(text)


def test_decode_roundtrip(pair):
    _, cc = pair
    text = "the news. won't stop — 中文 😀"
    assert cc.decode(cc.encode(text)) == text


def test_native_used_by_tokenizer_wrapper(tmp_path):
    vocab, merges = synthetic(None)
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
                  encoding="utf-8")
    from tell_tpu.data.tokenizer import RobertaTokenizer
    tok = RobertaTokenizer.from_files(str(vf), str(mf), use_native=True)
    ref = RobertaTokenizer.from_files(str(vf), str(mf), use_native=False)
    t = "the news won't stop"
    assert tok.encode(t) == ref.encode(t)


def test_builds_from_clean_checkout(tmp_path):
    """A fresh clone has no .so: load_library must rebuild it with make."""
    import os
    import tell_tpu.data.native as native

    lib = native._LIB_PATH
    if os.path.exists(lib):
        os.remove(lib)
    native._lib = None
    assert native.load_library() is not None
    assert os.path.exists(lib)
