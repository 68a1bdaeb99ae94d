"""Word-level attention merge for the demo frontend (reference contract:
transformer_faces_objects.py:142-309 — caption BPE steps collapse into
words with averaged maps, article source columns collapse into words with
summed attention, newlines stay standalone)."""
import numpy as np

from tell_tpu.data.tokenizer import RobertaTokenizer
from tell_tpu.serving.word_attention import (group_pieces,
                                             merge_word_attentions)
from tests.test_tokenizer import build_synthetic_vocab


def make_tok(tmp_path):
    vf, mf = build_synthetic_vocab(tmp_path)
    return RobertaTokenizer.from_files(vf, mf, use_native=False)


def test_group_pieces_words_and_newlines(tmp_path):
    tok = make_tok(tmp_path)
    text = "the news.\nthe inner"
    ids = tok.encode(text)  # <s> ... </s>
    words = group_pieces(tok, ids)
    texts = [w for w, _ in words]
    assert texts == ["the", "news.", "\n", "the", "inner"]
    # every non-special position consumed exactly once
    all_pos = [p for _, pos in words for p in pos]
    assert sorted(all_pos) == list(range(1, len(ids) - 1))


def test_merge_word_attentions_shapes_and_sums(tmp_path):
    tok = make_tok(tmp_path)
    context = "the news.\nthe inner story"
    ctx_ids = tok.encode(context)
    S = len(ctx_ids) + 2              # + bias/zero columns
    # caption "the news." -> BPE ids via encode (strip specials)
    cap_ids = tok.encode("the news.")[1:-1]
    token_ids = [0] + cap_ids + [2]   # <s> ... </s>
    gen_len = len(cap_ids) + 1
    rng = np.random.RandomState(0)
    attns = {"article": rng.rand(gen_len, S),
             "image": rng.rand(gen_len, 51)}

    out = merge_word_attentions(tok, token_ids, attns,
                                context_ids=ctx_ids)
    assert out["caption_words"] == ["the", "news."]
    assert out["article_words"] == ["the", "news.", "\n", "the", "inner",
                                    "story"]
    assert len(out["word_attns"]) == 2
    row = out["word_attns"][0]
    assert len(row["article"]) == len(out["article_words"])
    assert len(row["image"]) == 49    # bias/zero columns dropped
    # article word attention = sum of its pieces' (step-averaged) columns;
    # check word 0 ("the" at position 1 in ctx_ids)
    steps0 = [0]                       # "the" is one piece -> step 0
    want = attns["article"][steps0].mean(axis=0)[1]
    assert row["article"][0] == float(np.float32(want))


def test_merge_stops_at_eos(tmp_path):
    tok = make_tok(tmp_path)
    cap_ids = tok.encode("the news.")[1:-1]
    token_ids = [0] + cap_ids + [2, 1, 1]   # eos then pads
    gen_len = len(token_ids) - 1
    attns = {"image": np.ones((gen_len, 51))}
    out = merge_word_attentions(tok, token_ids, attns)
    assert out["caption_words"] == ["the", "news."]
    assert "article_words" not in out
