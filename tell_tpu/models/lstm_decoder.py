"""LSTM caption decoder (Biten-style baseline, expts 1 and 3).

Replaces /root/reference/tell/models/decoder_flattened_lstm.py:29-223: an
input-feeding stacked-LSTM decoder with learned initial h/c, dot-product
attention over image and article contexts, tanh output fusion, and the same
tied adaptive softmax as the conv decoder.

TPU-native: the time recursion is one `lax.scan` whose per-step matmuls
batch all four LSTM gates ([x;h] @ W -> 4H), instead of the reference's
Python loop over torch LSTMCells. The same step function serves training
(scan over teacher-forced inputs) and decoding (carried state).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.common import dropout
from ..ops.linear import gehring_linear, init_gehring_linear
from .decoder import embed_tokens


def _lstm_cell_init(rng, input_size, hidden_size):
    """torch LSTMCell layout: W_ih [4H, in], W_hh [4H, H], gates i,f,g,o;
    init U(-0.1, 0.1) (decoder_flattened_lstm.py:21-26)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -0.1, 0.1)
    return {"w_ih": u(k1, (input_size, 4 * hidden_size)),
            "w_hh": u(k2, (hidden_size, 4 * hidden_size)),
            "b_ih": u(k3, (4 * hidden_size,)),
            "b_hh": u(k4, (4 * hidden_size,))}


def _lstm_cell(p, x, h, c):
    gates = (jnp.dot(x, p["w_ih"], preferred_element_type=jnp.float32)
             + p["b_ih"]
             + jnp.dot(h, p["w_hh"], preferred_element_type=jnp.float32)
             + p["b_hh"])
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def _attention_init(rng, input_dim, source_dim, output_dim):
    k1, k2 = jax.random.split(rng)
    return {"input_proj": init_gehring_linear(k1, input_dim, source_dim,
                                              bias=True),
            "output_proj": init_gehring_linear(
                k2, input_dim + source_dim, output_dim, bias=True)}


def _attention(p, query, source, padding_mask):
    """Dot-product attention (AttentionLayer, :29-66). query [B, H],
    source [B, S, D], padding_mask [B, S] True=pad."""
    x = gehring_linear(p["input_proj"], query)
    scores = jnp.einsum("bd,bsd->bs", x, source,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(padding_mask, -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1).astype(source.dtype)
    ctx = jnp.einsum("bs,bsd->bd", probs, source,
                     preferred_element_type=jnp.float32).astype(query.dtype)
    out = jnp.tanh(gehring_linear(p["output_proj"],
                                  jnp.concatenate([ctx, query], axis=-1)))
    return out, probs


def init_lstm_decoder(rng: jax.Array, cfg: DecoderConfig,
                      num_layers: int = 4,
                      image_dim: int = 2048, article_dim: int = 1024) -> dict:
    """Shares the embedding/adaptive-softmax params with the conv decoder's
    init (so the loss/log-prob paths are reused unchanged)."""
    from .decoder import init_decoder
    import dataclasses
    base = init_decoder(rng, dataclasses.replace(cfg, kernel_sizes=()))
    H = cfg.embed_dim
    ks = jax.random.split(jax.random.fold_in(rng, 7), num_layers + 4)
    base["lstm"] = {
        "cells": [_lstm_cell_init(ks[i], H + H if i == 0 else H, H)
                  for i in range(num_layers)],
        "h0": [jnp.zeros((H,), jnp.float32) for _ in range(num_layers)],
        "c0": [jnp.zeros((H,), jnp.float32) for _ in range(num_layers)],
        "image_attn": _attention_init(ks[-4], H, image_dim, H),
        "article_attn": _attention_init(ks[-3], H, article_dim, H),
        "attn_proj": init_gehring_linear(ks[-2], 2 * H, H),
    }
    return base


def _lstm_step(lp: dict, cfg: DecoderConfig, x_t: jax.Array, state: tuple,
               contexts: dict, rng=None, deterministic=True):
    hs, cs, input_feed = state
    rnn_input = jnp.concatenate([x_t, input_feed], axis=-1)
    new_hs, new_cs = [], []
    for i, cell in enumerate(lp["cells"]):
        h, c = _lstm_cell(cell, rnn_input, hs[i], cs[i])
        rnn_input = dropout(h, cfg.dropout,
                            None if rng is None else jax.random.fold_in(rng, i),
                            deterministic)
        new_hs.append(h)
        new_cs.append(c)
    img, img_attn = _attention(lp["image_attn"], h, *contexts["image"])
    art, art_attn = _attention(lp["article_attn"], h, *contexts["article"])
    out = jnp.concatenate([img, art], axis=-1)
    out = dropout(out, cfg.dropout,
                  None if rng is None else jax.random.fold_in(rng, 99),
                  deterministic)
    out = gehring_linear(lp["attn_proj"], out)
    return out, (new_hs, new_cs, out), {"image": img_attn, "article": art_attn}


def init_lstm_state(params: dict, batch: int, dtype=jnp.float32) -> tuple:
    lp = params["lstm"]
    hs = [jnp.broadcast_to(h, (batch, h.shape[-1])).astype(dtype)
          for h in lp["h0"]]
    cs = [jnp.broadcast_to(c, (batch, c.shape[-1])).astype(dtype)
          for c in lp["c0"]]
    feed = jnp.zeros((batch, lp["h0"][0].shape[-1]), dtype)
    return hs, cs, feed


def lstm_decoder_forward(params: dict, cfg: DecoderConfig, ids: jax.Array,
                         contexts: dict, rng=None, deterministic=True
                         ) -> jax.Array:
    """Teacher-forced forward: ids [B, T] -> features [B, T, E]."""
    r_embed = None if rng is None else jax.random.fold_in(rng, 0)
    x = embed_tokens(params, cfg, ids, rng=r_embed,
                     deterministic=deterministic)
    B = ids.shape[0]
    state = init_lstm_state(params, B, x.dtype)

    def step(carry, inp):
        x_t, t = inp
        r = None if rng is None else jax.random.fold_in(rng, t)
        out, carry, _ = _lstm_step(params["lstm"], cfg, x_t, carry, contexts,
                                   r, deterministic)
        return carry, out

    _, outs = jax.lax.scan(step, state,
                           (jnp.swapaxes(x, 0, 1),
                            jnp.arange(ids.shape[1])))
    return jnp.swapaxes(outs, 0, 1)


def lstm_decoder_loss(params: dict, cfg: DecoderConfig,
                      caption_ids: jax.Array, contexts: dict, rng=None,
                      deterministic=True):
    from ..ops.adaptive import adaptive_softmax_loss
    inputs = caption_ids[:, :-1]
    targets = caption_ids[:, 1:]
    feats = lstm_decoder_forward(params, cfg, inputs, contexts, rng,
                                 deterministic)
    B, T, E = feats.shape
    return adaptive_softmax_loss(
        params["adaptive_softmax"], params["embed"], feats.reshape(B * T, E),
        targets.reshape(-1), cfg.full_cutoffs, pad_id=cfg.pad_id,
        padding_idx=cfg.embed_padding_idx)


# ---------------------------------------------------------------------------
# Task-model wrappers (baseline_glove, /root/reference/tell/models/
# baseline_glove.py:22-354): image+article contexts, adaptive loss, greedy/
# top-k generation — the same surface as the conv captioner so the trainer,
# evaluator and server can drive either through the model registry.
# ---------------------------------------------------------------------------

def init_lstm_captioner(rng: jax.Array, cfg) -> dict:
    """cfg: CaptionerConfig (decoder contexts must include image+article)."""
    import jax as _jax
    r_dec, r_bert = _jax.random.split(rng)
    params = {"decoder": init_lstm_decoder(
        r_dec, cfg.decoder,
        image_dim=cfg.decoder.context("image").kv_dim,
        article_dim=cfg.decoder.context("article").kv_dim)}
    if cfg.weigh_bert:
        params["bert_weight"] = _jax.random.uniform(
            r_bert, (cfg.num_bert_layers,), jnp.float32)
    return params


def lstm_captioner_loss(params: dict, cfg, batch: dict, rng=None,
                        deterministic=True):
    from .captioner import build_contexts
    contexts = build_contexts(params, cfg, batch)
    loss_sum, size, aux = lstm_decoder_loss(
        params["decoder"], cfg.decoder, batch["caption_ids"], contexts,
        rng, deterministic)
    size = jnp.maximum(size, 1)
    return loss_sum / jnp.log(2.0) / size, {"sample_size": size, **aux}


def lstm_generate(params: dict, cfg, batch: dict, rng=None,
                  need_weights: bool = False) -> dict:
    from ..ops.adaptive import adaptive_top_k
    from .captioner import build_contexts
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    dec = params["decoder"]
    state0 = init_lstm_state(dec, B, feat0.dtype)
    seed = jnp.full((B,), dcfg.bos_id, jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, step_rng):
        tokens, finished, state, t = carry
        x = embed_tokens(dec, dcfg, tokens[:, None], start_pos=t)[:, 0]
        feats, state, attns = _lstm_step(dec["lstm"], dcfg, x, state,
                                         contexts)
        topk_lp, topk_idx = adaptive_top_k(
            dec["adaptive_softmax"], dec["embed"], feats, dcfg.full_cutoffs,
            cfg.sampling_topk, padding_idx=dcfg.embed_padding_idx)
        if cfg.sampling_topk == 1:
            sampled = topk_idx[:, 0]
            sel_lp = topk_lp[:, 0]
        else:
            choice = jax.random.categorical(
                step_rng, topk_lp / cfg.sampling_temp, axis=-1)
            sampled = jnp.take_along_axis(topk_idx, choice[:, None],
                                          axis=-1)[:, 0]
            sel_lp = jnp.take_along_axis(topk_lp, choice[:, None],
                                         axis=-1)[:, 0]
        next_tok = jnp.where(finished, dcfg.pad_id, sampled)
        sel_lp = jnp.where(finished, 0.0, sel_lp)
        new_finished = finished | (sampled == dcfg.eos_id)
        outs = (next_tok, sel_lp, attns if need_weights else ())
        return (next_tok, new_finished, state, t + 1), outs

    step_rngs = jax.random.split(rng, cfg.gen_len)
    (_, finished, _, _), (toks, lps, attns) = jax.lax.scan(
        step, (seed, jnp.zeros((B,), bool), state0,
               jnp.zeros((), jnp.int32)), step_rngs)
    out = {"token_ids": jnp.concatenate([seed[:, None], toks.T], axis=1),
           "log_probs": lps.T, "finished": finished}
    if need_weights:
        out["attns"] = attns
    return out
