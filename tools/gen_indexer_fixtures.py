"""Generate golden indexer fixtures: text (+ entity spans) -> token ids
(+ copy masks), following the REFERENCE indexer pipeline exactly.

The oracle here is a transcription of the reference's control flow
(/root/reference/tell/data/token_indexers/roberta_indexer.py:99-178 and
roberta_indexer_names_matched.py:116-202):

  split(' ') -> ' '.join         (an identity on the text)
  regex findall over the text    (GPT-2 pre-tokenizer, whole text)
  per word: byte-encode -> BPE -> vocab ids
  masks per WORD (strict containment, space-shift quirk), inherited by
  every BPE piece; truncate to max_len-2; wrap <s>/</s>.

executed with HuggingFace's slow GPT2Tokenizer as the BPE machinery — an
independent implementation of the same public algorithm (fairseq's
encoder.py and HF's tokenization_gpt2.py both derive from OpenAI's
encoder.py, with identical pat/byte_encoder/bpe-merge semantics). The
production tokenizer (tell_tpu/data/tokenizer.py, Python and C++ paths)
must reproduce these fixtures token for token.

The committed fixture vocabulary is SYNTHETIC (the real roberta
vocab.json/merges.txt cannot be downloaded in this environment): a 300-merge
BPE trained here, deterministically, on a news-like corpus with the risk
cases SURVEY.md §7 flags as CIDEr movers — newlines, multiple spaces,
accented names, unicode punctuation, long words. Point
TELL_TPU_VOCAB_DIR at a directory holding the real vocab.json/merges.txt
and tests/test_indexer_fixtures.py re-runs the same oracle comparison on
the real vocabulary.

Usage:  python tools/gen_indexer_fixtures.py  [out.json]
"""
from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tell_tpu.data.tokenizer import bytes_to_unicode  # byte map is public

MAX_LEN = 48  # small so truncation cases actually truncate

CORPUS = """
The New York Times reported on Tuesday that President Emmanuel Macron met
Chancellor Angela Merkel in Berlin . The leaders discussed the European
Union 's budget , climate change , and the humanitarian situation .
Photographs by José Andrés and Zoë Kravitz appeared alongside the article .
In Milan , designer Tomas Maier presented the autumn / winter 2014
collection . Critics said the show was " extraordinary " — a word rarely
used . The orchestra performed Beethoven 's Ninth Symphony at Carnegie Hall
in Manhattan on Saturday night . Prime Minister Boris Johnson spoke about
the negotiations . François Hollande visited São Paulo and Köln . The
committee 's recommendation was unanimous ; the vote passed 97 - 3 .
Scientists at the university published their findings in Nature . The
quarterback threw for 300 yards . Señora García lived on Calle Verde .
children 's toys don 't break easily , they said . internationalization
and antidisestablishablishmentarianism are long words . the newspaper 's
editor - in - chief resigned yesterday afternoon amid controversy .
"""

NAMES = ["Emmanuel Macron", "Angela Merkel", "José Andrés", "Zoë Kravitz",
         "Tomas Maier", "Boris Johnson", "François Hollande", "São Paulo",
         "Köln", "Señora García", "New York", "Carnegie Hall", "Manhattan",
         "Berlin", "Milan", "Nature", "Beethoven"]


def train_bpe(words: dict[str, int], n_merges: int):
    """Classic BPE training on byte-mapped words; deterministic tie-break
    (count desc, pair lexicographic)."""
    vocab = {tuple(w): c for w, c in words.items()}
    merges = []
    for _ in range(n_merges):
        counts: collections.Counter = collections.Counter()
        for word, c in vocab.items():
            for pair in zip(word[:-1], word[1:]):
                counts[pair] += c
        if not counts:
            break
        best = max(sorted(counts), key=lambda p: counts[p])
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


def build_vocab():
    import regex as re
    pat = re.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""
        r"""|\s+(?!\S)|\s+""")
    b2u = bytes_to_unicode()
    words: collections.Counter = collections.Counter()
    for chunk in pat.findall(CORPUS + " " + " ".join(NAMES)):
        mapped = "".join(b2u[b] for b in chunk.encode("utf-8"))
        words[mapped] += 1
    merges = train_bpe(dict(words), 300)
    tokens = (["<s>", "<pad>", "</s>", "<unk>"] + list(b2u.values())
              + [a + b for a, b in merges])
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    return vocab, merges


def reference_indexer_oracle(text, spans, hf_tok, max_len=MAX_LEN):
    """The reference pipeline, executed with HF's slow-BPE machinery.

    spans: list of (char_start, char_end, entity_index) in entity order.
    Returns (token_ids, masks) with <s>/</s> wrapping.
    """
    # splitter roundtrip (word_splitter.py:8-21 + tokens_to_indices):
    # split(' ') then ' '.join — exact identity, asserted to stay honest
    assert " ".join(text.split(" ")) == text
    raw_tokens = hf_tok.pat.findall(text)
    assert "".join(raw_tokens) == text  # offsets-by-accumulation invariant

    # get_copy_mask (roberta_indexer_names_matched.py:170-202)
    starts, ends, cur = [], [], 0
    for t in raw_tokens:
        starts.append(cur)
        cur += len(t)
        ends.append(cur)
    word_masks = [0] * len(raw_tokens)
    for (c_start, c_end, idx) in spans:
        for i, (s, e, t) in enumerate(zip(starts, ends, raw_tokens)):
            adj = c_start - 1 if t[0] == " " else c_start
            if s >= adj and e <= c_end:
                word_masks[i] = idx

    # _byte_pair_encode (roberta_indexer.py:117-147)
    bpe_ids, bpe_masks = [], []
    for raw, m in zip(raw_tokens, word_masks):
        token = "".join(hf_tok.byte_encoder[b] for b in raw.encode("utf-8"))
        pieces = hf_tok.bpe(token).split(" ")
        for p in pieces:
            bpe_ids.append(hf_tok.encoder[p])
            bpe_masks.append(m)

    # truncate + wrap (roberta_indexer.py:99-110)
    bpe_ids = bpe_ids[: max_len - 2]
    bpe_masks = bpe_masks[: max_len - 2]
    bos = hf_tok.encoder.get("<s>", 0)
    eos = hf_tok.encoder.get("</s>", 2)
    return [bos] + bpe_ids + [eos], [0] + bpe_masks + [0]


def build_cases():
    """~120 risk-case texts, each with 0..n entity spans."""
    base = [
        "Tomas Maier, autumn/winter 2014,\n in Milan.",
        "The New York Times reported from Berlin.",
        "José Andrés cooked; Zoë Kravitz watched.",
        "François Hollande visited São Paulo and Köln.",
        "Señora García lived on Calle Verde.",
        "President Emmanuel Macron met Angela Merkel.",
        "a  double  space between   words",
        "line one\nline two\n\nline four",
        "tabs\tand\ttabs\t\tdouble",
        "trailing spaces   \nand newline",
        " leading space",
        "\nleading newline",
        "don't can't won't they've we'll I'm he'd she's",
        "numbers 1234567890 and 3.14159 and 97-3",
        'quotes "straight" and “curly” and ‘single’',
        "dashes - en – em — minus −",
        "ellipsis… and . . . spaced",
        "antidisestablishablishmentarianism internationalization",
        "CamelCase iPhone McDonald's USA U.S.A.",
        "mixed 中文 chinese and \U0001f600 emoji",
        "café naïve résumé über",
        "ALL CAPS SHOUTING then lowercase",
        "punctuation!!! ??? ;;; :::",
        "a",
        " ",
        "\n",
        "",
        "Beethoven's Ninth at Carnegie Hall in Manhattan.",
        "The committee's recommendation was unanimous; the vote passed.",
        "editor-in-chief resigned yesterday",
        "Boris Johnson spoke about the negotiations at length, far beyond "
        "the allotted time, which forced the moderators to intervene "
        "repeatedly during the session.",  # > MAX_LEN tokens: truncation
    ]
    cases = []
    for text in base:
        spans = []
        for i, name in enumerate(NAMES):
            start = text.find(name)
            if start >= 0:
                spans.append((start, start + len(name), len(spans) + 1))
        cases.append({"text": text, "spans": spans})
        # no-span variant exercises the plain-encode path on the same text
        if spans:
            cases.append({"text": text, "spans": []})
    # partial-overlap quirk cases: span cuts a word in half -> word masked 0
    t = "the New Yorker magazine"
    cases.append({"text": t, "spans": [(t.index("New"),
                                        t.index("New") + len("New York"),
                                        1)]})
    t2 = "Rosenberg met Rose at the Rose garden"
    cases.append({"text": t2, "spans": [(t2.index("Rose", 10),
                                         t2.index("Rose", 10) + 4, 1),
                                        (26, 30, 2)]})
    # templated combinations: every name through four context shapes
    # (start-of-text, post-newline, doubled occurrence, punctuation-heavy)
    templates = [
        "{n} spoke first.",
        "Then,\n{n}  answered twice:  yes.",
        "“{n}” — {n} again…",
        "photo: {n}/AP (file)",
    ]
    for name in NAMES:
        for tpl in templates:
            text = tpl.format(n=name)
            spans = []
            start = 0
            while True:
                i = text.find(name, start)
                if i < 0:
                    break
                spans.append((i, i + len(name), 1))
                start = i + 1
            cases.append({"text": text, "spans": spans})
    # entity span starting mid-word: strict containment -> nothing masked
    t3 = "unbreakable Yorkshire pudding"
    cases.append({"text": t3, "spans": [(3, 11, 1)]})
    # overlapping entities: later index overwrites
    t4 = "New York City Hall stands in New York"
    cases.append({"text": t4, "spans": [(0, 13, 1), (0, 18, 2),
                                        (29, 37, 3)]})
    return cases


def main(out_path):
    import transformers
    vocab, merges = build_vocab()
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        vf = os.path.join(td, "vocab.json")
        mf = os.path.join(td, "merges.txt")
        with open(vf, "w", encoding="utf-8") as f:
            json.dump(vocab, f, ensure_ascii=False)
        with open(mf, "w", encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for a, b in merges:
                f.write(f"{a} {b}\n")
        hf = transformers.GPT2Tokenizer(vf, mf)
    cases = []
    for case in build_cases():
        ids, masks = reference_indexer_oracle(case["text"], case["spans"],
                                              hf)
        cases.append({**case, "ids": ids, "masks": masks})
    fixture = {"max_len": MAX_LEN, "vocab": vocab,
               "merges": [list(m) for m in merges], "cases": cases}
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(fixture, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(cases)} cases to {out_path}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "indexer_golden.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    main(out)
