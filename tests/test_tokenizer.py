"""Byte-BPE parity against the HuggingFace slow tokenizer on a synthetic
vocab (no pretrained downloads in this environment — the algorithm, byte
mapping, regex and merge order are what's under test)."""
import json

import pytest

from tell_tpu.data.tokenizer import ByteBPE, RobertaTokenizer, bytes_to_unicode


def build_synthetic_vocab(tmp_path):
    b2u = bytes_to_unicode()
    chars = list(b2u.values())
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("e", "r"),
        ("Ġ", "a"), ("o", "n"), ("Ġthe", "Ġa"),  # never fires (space inside)
        ("t", "he"), ("Ġ", "n"), ("e", "w"), ("Ġn", "ew"), ("s", "."),
        ("â", "Ģ"), ("âĢ", "Ļ"),  # U+2019 apostrophe bytes
    ]
    vocab_tokens = (["<s>", "<pad>", "</s>", "<unk>"] + chars
                    + [a + b for a, b in merges])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_tokens))}
    vf = tmp_path / "vocab.json"
    mf = tmp_path / "merges.txt"
    vf.write_text(json.dumps(vocab), encoding="utf-8")
    mf.write_text("#version: 0.2\n"
                  + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
                  encoding="utf-8")
    return str(vf), str(mf)


TEXTS = [
    "the news.",
    "The New\nYork Times won't say 'hello' — it said ’this’.",
    "  multiple   spaces\tand\ttabs ",
    "café naïve 中文 \U0001f600",
    "numbers 12345 and punct!!! ...",
    "don't can't we'll they've I'm he'd",
]


@pytest.mark.parametrize("text", TEXTS)
def test_matches_hf_slow_tokenizer(tmp_path, text):
    transformers = pytest.importorskip("transformers")
    vf, mf = build_synthetic_vocab(tmp_path)
    ours = ByteBPE.from_files(vf, mf)
    theirs = transformers.GPT2Tokenizer(vf, mf)
    assert ours.encode(text) == theirs.encode(text)
    assert ours.decode(ours.encode(text)) == text


def test_roberta_framing(tmp_path):
    vf, mf = build_synthetic_vocab(tmp_path)
    tok = RobertaTokenizer.from_files(vf, mf, max_len=8)
    ids = tok.encode("the news. the news. the news.")
    assert ids[0] == 0 and ids[-1] == 2 and len(ids) <= 8
    assert tok.pad(ids, 10)[-2:] == [1, 1]
    # round trip without specials
    short = tok.encode("the news.")
    assert tok.decode(short) == "the news."


def test_entity_copy_masks(tmp_path):
    vf, mf = build_synthetic_vocab(tmp_path)
    tok = RobertaTokenizer.from_files(vf, mf)
    text = "the news in Yorkshire today"
    span = (text.index("Yorkshire"), text.index("Yorkshire") + len("Yorkshire"))
    ids, masks = tok.encode_with_spans(text, [span])
    assert len(ids) == len(masks)
    assert masks[0] == 0 and masks[-1] == 0  # specials
    decoded_inside = tok.bpe.decode(
        [i for i, m in zip(ids, masks) if m == 1])
    assert "Yorkshire" in decoded_inside
    assert "news" not in decoded_inside


def test_indexed_spans_multibyte_entity(tmp_path):
    """Accented (multi-byte UTF-8) entity names must have ALL their BPE
    pieces masked, including pieces holding partial bytes."""
    vf, mf = build_synthetic_vocab(tmp_path)
    tok = RobertaTokenizer.from_files(vf, mf, max_len=64)
    text = "by Émile Zola today"
    a = text.index("Émile")
    spans = [(a, a + len("Émile Zola"), 1)]
    ids, masks = tok.encode_with_indexed_spans(text, spans)
    dec = [tok.decode([i], skip_special=False) for i in ids]
    # every non-special token overlapping the entity chars is masked
    inner = [m for i, m in zip(ids, masks)
             if i not in (tok.BOS, tok.EOS)]
    text_toks = [d for i, d in zip(ids, dec) if i not in (tok.BOS, tok.EOS)]
    covered = "".join(t for t, m in zip(text_toks, inner) if m == 1)
    assert "mile" in covered and "Zola" in covered
    # round-trip is exact (byte-level BPE)
    assert tok.decode(ids) == text


def test_entity_occurrences_word_boundaries():
    from tell_tpu.data.pipeline import entity_occurrences
    text = "Rosenberg met Rose at the Rose garden; Roses bloomed."
    spans = entity_occurrences(text, ["Rose"])
    surf = [text[a:b] for a, b, _ in spans]
    assert surf == ["Rose", "Rose"]  # not Rosenberg, not Roses
