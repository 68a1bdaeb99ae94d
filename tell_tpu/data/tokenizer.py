"""Byte-level BPE tokenizer (GPT-2 / RoBERTa), from scratch.

Replaces the reference's dependency on torch.hub-loaded fairseq RoBERTa for
encoding/decoding everywhere (roberta_indexer.py:117-147, SURVEY.md §2.5).
Token ids match HuggingFace/fairseq RoBERTa: <s>=0, <pad>=1, </s>=2,
<unk>=3, then the 50k byte-BPE merges — loaded from standard
vocab.json/merges.txt files.

The hot path (training-data preprocessing over 800k articles) also has a C++
implementation in native/ (see tell_tpu/data/native.py); this pure-Python
version is the semantic reference and the fallback.
"""
from __future__ import annotations

import functools
import json

import regex as re

# GPT-2's pre-tokenization pattern (contractions, letter runs, number runs,
# punctuation runs, and whitespace with trailing-space lookahead).
_PRETOKENIZE = re.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""
    r"""|\s+(?!\S)|\s+""")


@functools.lru_cache()
def bytes_to_unicode() -> dict[int, str]:
    """The reversible byte <-> printable-unicode map of GPT-2.

    Printable ASCII + two latin-1 ranges map to themselves; the remaining 68
    bytes map to 256+i so every byte is a visible character and BPE merges
    operate on strings.
    """
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _pairs(word: tuple[str, ...]) -> set[tuple[str, str]]:
    return set(zip(word[:-1], word[1:]))


class ByteBPE:
    """Byte-level BPE encoder over a vocab.json + merges.txt pair."""

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]]):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in vocab.items()}
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._cache: dict[str, list[str]] = {}

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str) -> "ByteBPE":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges)

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = _pairs(word)
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            a, b = best
            out = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == a and word[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        result = list(word)
        if len(self._cache) < 500_000:
            self._cache[token] = result
        return result

    def encode(self, text: str) -> list[int]:
        ids: list[int] = []
        unk = self.encoder.get("<unk>", 3)
        for chunk in _PRETOKENIZE.findall(text):
            mapped = "".join(self.byte_encoder[b]
                             for b in chunk.encode("utf-8"))
            for tok in self._bpe(mapped):
                ids.append(self.encoder.get(tok, unk))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder.get(int(i), "") for i in ids)
        data = bytearray(self.byte_decoder[c] for c in text
                         if c in self.byte_decoder)
        return data.decode("utf-8", errors="replace")


class RobertaTokenizer:
    """RoBERTa wrapper: <s> ... </s> framing, pad/truncate, entity masks.

    Mirrors the reference indexer's behavior
    (/root/reference/tell/data/token_indexers/roberta_indexer.py:99-208):
    sequences are wrapped in BOS/EOS, truncated to max_len (including the
    specials), padded on the right with pad_id=1; `copy_masks` mark tokens
    inside named-entity character spans (1) vs outside (0) with -1 padding.
    """

    BOS, PAD, EOS, UNK = 0, 1, 2, 3

    def __init__(self, bpe: ByteBPE, max_len: int = 512):
        self.bpe = bpe
        self.max_len = max_len

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str,
                   max_len: int = 512,
                   use_native: bool = True) -> "RobertaTokenizer":
        """use_native: encode through the C++ core (native/bpe.cpp) when it
        builds; the Python ByteBPE otherwise. Both are parity-tested
        (tests/test_native_bpe.py)."""
        bpe = ByteBPE.from_files(vocab_file, merges_file)
        if use_native:
            from .native import native_bpe
            bpe = native_bpe(bpe.encoder,
                             sorted(bpe.ranks, key=bpe.ranks.get))
        return cls(bpe, max_len)

    def encode(self, text: str, max_len: int | None = None) -> list[int]:
        max_len = max_len or self.max_len
        ids = self.bpe.encode(text)[: max_len - 2]
        return [self.BOS] + ids + [self.EOS]

    def encode_with_spans(self, text: str,
                          entity_spans: list[tuple[int, int]],
                          max_len: int | None = None
                          ) -> tuple[list[int], list[int]]:
        """ids plus a 0/1 copy-mask per token (1 = inside an entity span;
        roberta_indexer.py:149-178). Thin wrapper over the indexed variant
        with every span mapped to index 1."""
        return self.encode_with_indexed_spans(
            text, [(a, b, 1) for a, b in entity_spans], max_len)

    def encode_with_indexed_spans(self, text: str,
                                  entity_spans: list[tuple[int, int, int]],
                                  max_len: int | None = None
                                  ) -> tuple[list[int], list[int]]:
        """ids plus a per-entity int mask per token, with the REFERENCE's
        word-level containment semantics (roberta_indexer.py:149-178 and
        roberta_indexer_names_matched.py:170-202):

        - masks are decided per pre-tokenizer word (regex chunk), then
          inherited by every BPE piece of that word — a word only partially
          overlapping an entity span gets 0 for ALL its pieces;
        - a word is inside span (start, end, idx) iff
          word_start >= start - (1 if the word begins with ' ' else 0)
          and word_end <= end — the space-shift quirk lets the leading
          Ġ-space word of an entity match the spaCy char span, which starts
          at the first letter;
        - spans are applied in order and later spans overwrite earlier ones
          on overlap, so idx identifies WHICH entity a token belongs to
          (pointer models' per-entity copy loss). Specials get 0.

        The GPT-2 pre-tokenizer regex consumes every character, so word
        offsets computed by accumulation equal text character offsets —
        the same invariant the reference's get_copy_mask relies on.
        """
        max_len = max_len or self.max_len
        ids: list[int] = []
        masks: list[int] = []
        pos = 0
        for chunk in _PRETOKENIZE.findall(text):
            start, end = pos, pos + len(chunk)
            pos = end
            idx = 0
            shift = 1 if chunk[0] == " " else 0
            for (a, b, i) in entity_spans:
                if start >= a - shift and end <= b:
                    idx = i
            mapped = "".join(self.bpe.byte_encoder[b]
                             for b in chunk.encode("utf-8"))
            for tok in self.bpe._bpe(mapped):
                ids.append(self.bpe.encoder.get(tok, self.UNK))
                masks.append(idx)
        ids = ids[: max_len - 2]
        masks = masks[: max_len - 2]
        return ([self.BOS] + ids + [self.EOS], [0] + masks + [0])

    def pad_masks(self, masks: list[int], length: int) -> list[int]:
        """Copy/proper masks pad with -1 (roberta_indexer.py:185-200)."""
        return masks[:length] + [-1] * max(0, length - len(masks))

    def pad(self, ids: list[int], length: int) -> list[int]:
        return ids[:length] + [self.PAD] * max(0, length - len(ids))

    def decode(self, ids, skip_special: bool = True) -> str:
        if skip_special:
            ids = [i for i in ids if int(i) > 3]
        return self.bpe.decode(ids)
