"""Decode-perf levers: one-hot conv gather (bit-exact), int8 softmax
tables and int8 step projections (approximate, engine/one-shot
consistency pinned)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from tell_tpu.config import small_test_config
from tell_tpu.models import init_captioner
from tell_tpu.models.beam import beam_search


def _batch(cfg, seed=0, B=3):
    dcfg = cfg.decoder
    ks = jr.split(jr.PRNGKey(seed), 5)
    s_art = dcfg.context("article").max_len
    return {
        "image_grid": jr.normal(ks[0], (B, dcfg.context("image").max_len,
                                        dcfg.context("image").kv_dim)),
        "article_hiddens": jr.normal(
            ks[1], (B, s_art, cfg.num_bert_layers,
                    dcfg.context("article").kv_dim)),
        "article_mask": jnp.zeros((B, s_art), bool),
        "face_embeds": jr.normal(ks[2], (B, dcfg.context("faces").max_len,
                                         dcfg.context("faces").kv_dim)),
        "obj_embeds": jr.normal(ks[3], (B, dcfg.context("obj").max_len,
                                        dcfg.context("obj").kv_dim)),
    }


def _setup(gen_len=8):
    cfg = dataclasses.replace(small_test_config(), gen_len=gen_len)
    params = init_captioner(jr.PRNGKey(0), cfg)
    return cfg, params


# (a one-hot-gather lever was A/B'd on the chip, lost decisively, and was
# removed — see models/decoder.py's round-5 negative-finding note)


@pytest.mark.parametrize("lever", ["TELL_TPU_DEC8_SM", "TELL_TPU_DEC8"])
def test_int8_decode_levers_run_and_stay_close(monkeypatch, lever):
    """The int8 levers change numerics (~1e-2 logit perturbation) — the
    hard gate is bench.py's forced agreement on the chip. Here: the path
    runs, produces valid captions, and the per-step top-1 choice agrees
    with the exact path on a clear majority of steps at random weights."""
    from tell_tpu.models.captioner import generate, predict_forced
    cfg, params = _setup(gen_len=10)
    batch = _batch(cfg, seed=3, B=4)
    ref = np.asarray(generate(params, cfg, batch,
                              early_stop=False)["token_ids"])
    monkeypatch.setenv(lever, "1")
    preds = np.asarray(predict_forced(params, cfg, batch, ref))
    live = ref[:, 1:] != cfg.decoder.pad_id
    if not live.any():
        live = np.ones_like(live)
    agree = float((preds == ref[:, 1:])[live].mean())
    assert agree > 0.7, agree    # broken kernel would be ~1/vocab


@pytest.mark.parametrize("lever", ["TELL_TPU_DEC8_SM", "TELL_TPU_DEC8"])
def test_engine_matches_one_shot_under_lever(monkeypatch, lever):
    """Slot isolation must hold under every decode lever: the engine's
    captions equal one-shot beam_search WITH THE SAME LEVER active."""
    from tell_tpu.serving.engine import DecodeEngine
    monkeypatch.setenv(lever, "1")
    cfg, params = _setup(gen_len=6)
    reqs = [{k: v[i:i + 1] for k, v in _batch(cfg, seed=7, B=3).items()}
            for i in range(3)]
    refs = [beam_search(params, cfg, r, beam_size=2, early_stop=True)
            for r in reqs]
    eng = DecodeEngine(params, cfg, slots=2, beam=2, chunk_steps=3)
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        out = fut.result(timeout=0)
        np.testing.assert_array_equal(np.asarray(out["token_ids"]),
                                      np.asarray(ref["token_ids"])[0])


def test_quantize_softmax_tables_pad_column_zeroed():
    from tell_tpu.ops.adaptive import quantize_softmax_tables
    cfg, params = _setup()
    dec = params["decoder"]
    q = quantize_softmax_tables(dec["adaptive_softmax"], dec["embed"],
                                cfg.decoder.full_cutoffs,
                                padding_idx=cfg.decoder.embed_padding_idx)
    pad = cfg.decoder.embed_padding_idx
    assert float(q["head"]["scale"][pad]) == 0.0
    for t in q["tails"]:
        assert float(t["scale"][pad]) == 0.0
