"""Pointer/copy captioning models (transformer_pointer, transformer_pointer_2).

Re-implements the reference's appendix copy-mechanism models
(/root/reference/tell/models/transformer_pointer.py:27-722,
 transformer_pointer_2.py — diff only in the copy loss, lines 77, 304-312)
TPU-natively:

* the base captioner is the faces model (image/article/faces contexts,
  dynamic_conv_decoder_faces_parallel per
  expt/nytimes/a3_copy_loss/config.yaml:27), warm-startable from a trained
  faces checkpoint (LoadStateDictWithPrefix semantics = param-pytree merge);
* an entity-presence head: strict-causal gated self-attention over decoder
  features + a 2-way classifier (transformer_pointer.py:216-232);
* a copy-attention head over the article encoding, mixed with a SECOND
  learned 25-layer weight vector `bert_weight_2`
  (transformer_pointer.py:66-69,196-207);
* the reference's reduced-vocabulary scatter-add + gather
  (transformer_pointer.py:262-303) is replaced by an equivalent
  static-shape formulation: the copy probability of target token w equals
  the total attention mass on proper-noun source positions holding w, i.e.
  an (ids-equal AND proper) masked sum — no unique()/scatter needed, which
  would be dynamic under jit;
* per-entity means use a static MAX_COPY_ENTITIES bound instead of the
  batch max (transformer_pointer.py:297-311).

Loss semantics preserved exactly: total loss = entity_loss + copy_loss (the
generation loss is logged but NOT backpropagated — these models fine-tune
copy heads on a frozen-ish base, transformer_pointer.py:125-128); zero-prob
copy targets contribute log-prob 0, not -inf (":292-293"); batches with no
entity tokens contribute zero loss (":189-190").
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from ..ops.linear import gehring_linear, init_gehring_linear
from ..ops.self_attention import (
    copy_attention_scores, init_copy_attention, init_self_attention,
    self_attention,
)
from .captioner import build_contexts, init_captioner
from .decoder import (
    decode_vocab_table, decoder_forward, decoder_step, decoder_top_k,
    init_decode_state,
)

MAX_COPY_ENTITIES = 24  # static bound on distinct entities per caption


@dataclasses.dataclass(frozen=True)
class PointerConfig:
    """transformer_pointer(+_2) hyper-params
    (expt/nytimes/a3_copy_loss/config.yaml:24-88)."""
    captioner: CaptionerConfig
    copy_loss_version: int = 1  # 1 = transformer_pointer, 2 = _2
    attn_dropout: float = 0.1   # dropout inside the copy-score attention


def init_pointer(rng: jax.Array, cfg: PointerConfig) -> dict:
    ra, rb, rc, rd, re = jax.random.split(rng, 5)
    cap = cfg.captioner
    dim = cap.decoder.embed_dim
    params = {
        "captioner": init_captioner(ra, cap),
        "entity_attn": init_self_attention(rb, dim),
        "entity_fc": init_gehring_linear(rc, dim, 2),
        "copy_attn": init_copy_attention(
            rd, dim, kdim=cap.decoder.context("article").kv_dim),
    }
    if cap.weigh_bert:
        params["bert_weight_2"] = jax.random.uniform(
            re, (cap.num_bert_layers,), jnp.float32)
    return params


def warm_start_from_captioner(pointer_params: dict, captioner_params: dict
                              ) -> dict:
    """Load a trained faces-captioner into the base (model_path semantics,
    transformer_pointer.py:97-100 + LoadStateDictWithPrefix)."""
    out = dict(pointer_params)
    out["captioner"] = captioner_params
    return out


def _copy_article(params: dict, cfg: PointerConfig, batch: dict) -> jax.Array:
    """Article features for the copy head: weighted sum with bert_weight_2
    (transformer_pointer.py:196-207) or the final hidden state."""
    if cfg.captioner.weigh_bert and "article_hiddens" in batch:
        w = jax.nn.softmax(params["bert_weight_2"].astype(jnp.float32))
        h = batch["article_hiddens"]
        return jnp.einsum("bsld,l->bsd", h, w.astype(h.dtype))
    return batch["article"]


def _copy_target_probs(copy_attn: jax.Array, context_ids: jax.Array,
                       proper: jax.Array, target_ids: jax.Array
                       ) -> jax.Array:
    """p[b,l] = sum of attention mass on proper source positions whose token
    equals target_ids[b,l] — identical to the reference's reduced-vocab
    scatter_add + gather (transformer_pointer.py:262-303)."""
    match = (context_ids[:, None, :] == target_ids[:, :, None])  # [B,L,S]
    match = match & proper[:, None, :]
    return jnp.sum(copy_attn * match, axis=-1)


def pointer_loss(params: dict, cfg: PointerConfig, batch: dict,
                 rng: jax.Array | None = None, deterministic: bool = True
                 ) -> tuple[jax.Array, dict]:
    """batch adds to the captioner batch:
      context_ids        [B, S]  article BPE ids
      proper_masks       [B, S]  per-entity int index at proper-noun
                                  positions, 0 elsewhere, -1 at padding
      caption_copy_masks [B, T]  same for the caption tokens
    Returns (loss = (entity + copy)/ln2, aux dict incl. gen_loss)."""
    cap = cfg.captioner
    dcfg = cap.decoder
    contexts = build_contexts(params["captioner"], cap, batch)
    caption_ids = batch["caption_ids"]
    inputs, targets = caption_ids[:, :-1], caption_ids[:, 1:]
    r_dec = None if rng is None else jax.random.fold_in(rng, 0)
    X, _ = decoder_forward(params["captioner"]["decoder"], dcfg, inputs,
                           contexts, r_dec, deterministic)
    B, L, E = X.shape

    # generation loss — tracked, not part of the optimized loss (reuses the
    # decoder features above; the reference likewise computes it from the
    # same decoder_out, transformer_pointer.py:114-122)
    from ..ops.adaptive import adaptive_softmax_loss
    dec_params = params["captioner"]["decoder"]
    gen_sum, gen_size, _ = adaptive_softmax_loss(
        dec_params["adaptive_softmax"], dec_params["embed"],
        jax.lax.stop_gradient(X).reshape(B * L, E), targets.reshape(-1),
        dcfg.full_cutoffs, pad_id=dcfg.pad_id,
        padding_idx=dcfg.embed_padding_idx)
    gen_loss = gen_sum / jnp.maximum(gen_size, 1) / jnp.log(2.0)

    cap_masks = batch["caption_copy_masks"][:, 1:]        # align to targets
    has_entities = jnp.any(cap_masks >= 1)

    # ---- entity-presence loss (transformer_pointer.py:216-232) ----
    X_entity = self_attention(params["entity_attn"], X,
                              num_heads=dcfg.num_heads)
    ent_logits = gehring_linear(params["entity_fc"], X_entity)  # [B, L, 2]
    ent_targets = jnp.clip(cap_masks, -1, 1)
    valid = ent_targets >= 0
    ent_lp = jax.nn.log_softmax(ent_logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(
        ent_lp, jnp.maximum(ent_targets, 0)[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    entity_loss = -jnp.sum(jnp.where(valid, picked, 0.0)) / n_valid

    # ---- copy loss ----
    article = _copy_article(params, cfg, batch)
    r_attn = None if rng is None else jax.random.fold_in(rng, 2)
    pad_mask = batch.get("article_mask")
    scores = copy_attention_scores(
        params["copy_attn"], X, article, pad_mask,
        num_heads=dcfg.num_heads, drop_rate=cfg.attn_dropout, rng=r_attn,
        deterministic=deterministic)[:, :, :-2]           # [B, L, S]
    proper = batch["proper_masks"] >= 1
    scores = scores * proper[:, None, :]
    p_tgt = _copy_target_probs(scores, batch["context_ids"], proper, targets)
    lp_tgt = jnp.where(p_tgt > 0, jnp.log(jnp.maximum(p_tgt, 1e-30)), 0.0)

    if cfg.copy_loss_version == 1:
        # mean of -lp over tokens of entity i, summed over entity indices
        copy_loss = 0.0
        for i in range(1, MAX_COPY_ENTITIES + 1):
            m = (cap_masks == i)
            cnt = jnp.sum(m)
            mean_i = -jnp.sum(jnp.where(m, lp_tgt, 0.0)) / jnp.maximum(cnt, 1)
            copy_loss = copy_loss + jnp.where(cnt > 0, mean_i, 0.0)
    else:
        copy_loss = _copy_loss_v2(scores, batch, targets, lp_tgt, cap_masks)

    loss = jnp.where(has_entities,
                     (entity_loss + copy_loss) / jnp.log(2.0), 0.0)
    return loss, {
        "gen_loss": gen_loss,
        "entity_loss": jnp.where(has_entities, entity_loss, 0.0) / jnp.log(2.0),
        "copy_loss": jnp.where(has_entities, copy_loss, 0.0) / jnp.log(2.0),
    }


def _count_unique(ids: jax.Array) -> jax.Array:
    """Number of distinct values in a 1-D int array (static shape)."""
    s = jnp.sort(ids)
    return 1 + jnp.sum(s[1:] != s[:-1])


def _copy_loss_v2(scores: jax.Array, batch: dict, targets: jax.Array,
                  lp_tgt: jax.Array, cap_masks: jax.Array) -> jax.Array:
    """transformer_pointer_2's CrossEntropy over the reduced vocabulary,
    replicated with static shapes. The reference treats the stitched
    log-prob vector as LOGITS (transformer_pointer_2.py:310-312): entries
    are log(p_v) where p_v>0 and 0 elsewhere, so the CE normalizer is
    sum_{v in U, p_v>0} p_v + #(v in U with p_v == 0)  — U = batch-global
    unique ids over context+targets. We compute |U| and each row's count of
    distinct proper-position tokens without materializing U."""
    context_ids = batch["context_ids"]
    proper = batch["proper_masks"] >= 1
    B, L, S = scores.shape
    all_ids = jnp.concatenate(
        [context_ids.reshape(-1), targets.reshape(-1)])
    U = _count_unique(all_ids)

    # distinct proper tokens per row: sort with non-proper pushed to a
    # sentinel, count transitions among proper entries
    sentinel = jnp.int32(1 << 30)
    row_ids = jnp.where(proper, context_ids, sentinel)
    srt = jnp.sort(row_ids, axis=1)
    firsts = jnp.concatenate(
        [jnp.ones((B, 1), bool), srt[:, 1:] != srt[:, :-1]], axis=1)
    distinct = jnp.sum(firsts & (srt != sentinel), axis=1)     # [B]

    mass = jnp.sum(scores, axis=-1)                            # [B, L]
    Z = mass + (U - distinct)[:, None].astype(mass.dtype)
    ce = -(lp_tgt - jnp.log(jnp.maximum(Z, 1e-30)))            # [B, L]

    copy_loss = 0.0
    for i in range(1, MAX_COPY_ENTITIES + 1):
        m = (cap_masks == i)
        cnt = jnp.sum(m)
        mean_i = jnp.sum(jnp.where(m, ce, 0.0)) / jnp.maximum(cnt, 1)
        copy_loss = copy_loss + jnp.where(cnt > 0, mean_i, 0.0)
    return copy_loss


def pointer_generate(params: dict, cfg: PointerConfig, batch: dict,
                     rng: jax.Array | None = None) -> dict:
    """Generation with the copy mechanism (transformer_pointer.py:426-700):
    per step, the entity head decides should-copy; if copying, the next
    token is the proper-noun context token with the highest total copy
    mass (exact for sampling_topk=1, which every shipped config uses),
    unless its mass is < 1e-6 or that id was already copied."""
    cap = cfg.captioner
    dcfg = cap.decoder
    contexts = build_contexts(params["captioner"], cap, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    G = cap.gen_len
    E = dcfg.embed_dim
    state = init_decode_state(params["captioner"]["decoder"], dcfg, contexts,
                              B, dtype=feat0.dtype)
    kv = state.pop("kv")  # constant during decode: closed over, not carried
    embed_table = state.pop("embed_table")
    vocab_table = decode_vocab_table(params["captioner"]["decoder"], dcfg,
                                     feat0.dtype)
    article = _copy_article(params, cfg, batch)
    context_ids = batch["context_ids"]
    proper = batch["proper_masks"] >= 1
    pad_mask = batch.get("article_mask")
    # precompute same-token match matrix over proper positions: [B, S, S]
    match = ((context_ids[:, None, :] == context_ids[:, :, None])
             & proper[:, None, :] & proper[:, :, None])

    seed = jnp.full((B,), dcfg.bos_id, jnp.int32)
    carry0 = {
        "tokens": seed,
        "finished": jnp.zeros((B,), bool),
        "state": state,
        "feats": jnp.zeros((B, G, E), feat0.dtype),   # decoder feature hist
        "copied": jnp.full((B, G), -1, jnp.int32),    # copied token ids
        "step": jnp.zeros((), jnp.int32),
    }
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, step_rng):
        t = carry["step"]
        feats, new_state, _ = decoder_step(
            params["captioner"]["decoder"], dcfg, carry["tokens"],
            {**carry["state"], "kv": kv,
             "embed_table": embed_table})                     # [B, E]
        new_state = {k: v for k, v in new_state.items()
                     if k not in ("kv", "embed_table")}
        hist = jax.lax.dynamic_update_slice(
            carry["feats"], feats[:, None, :].astype(carry["feats"].dtype),
            (0, t, 0))
        valid = jnp.arange(G)[None, :] <= t                   # rows filled
        x_ent = self_attention(params["entity_attn"], feats[:, None, :],
                               num_heads=dcfg.num_heads, q_offset=t,
                               kv=hist, kv_valid=valid)
        ent_logits = gehring_linear(params["entity_fc"], x_ent[:, 0])
        should_copy = jnp.argmax(ent_logits, axis=-1) == 1

        scores = copy_attention_scores(
            params["copy_attn"], feats[:, None, :], article, pad_mask,
            num_heads=dcfg.num_heads)[:, 0, :-2]              # [B, S]
        scores = scores * proper
        mass = jnp.einsum("bs,bts->bt", scores, match)        # [B, S]
        best = jnp.argmax(mass, axis=-1)
        copy_prob = jnp.take_along_axis(mass, best[:, None], axis=-1)[:, 0]
        copy_id = jnp.take_along_axis(context_ids, best[:, None],
                                      axis=-1)[:, 0]
        empty = copy_prob < 1e-6
        has_copied = jnp.any(carry["copied"] == copy_id[:, None], axis=-1)
        should_copy = should_copy & ~empty & ~has_copied

        topk_lp, topk_idx = decoder_top_k(params["captioner"]["decoder"],
                                          dcfg, feats, cap.sampling_topk,
                                          vocab_table=vocab_table)
        if cap.sampling_topk == 1:
            gen_id = topk_idx[:, 0]
            sel_lp = topk_lp[:, 0]
        else:
            choice = jax.random.categorical(
                step_rng, topk_lp / cap.sampling_temp, axis=-1)
            gen_id = jnp.take_along_axis(topk_idx, choice[:, None],
                                         axis=-1)[:, 0]
            sel_lp = jnp.take_along_axis(topk_lp, choice[:, None],
                                         axis=-1)[:, 0]
        tok = jnp.where(should_copy, copy_id, gen_id)
        tok = jnp.where(carry["finished"], dcfg.pad_id, tok)
        should_copy = should_copy & ~carry["finished"]
        copied = jax.lax.dynamic_update_slice(
            carry["copied"],
            jnp.where(should_copy, copy_id, -1)[:, None], (0, t))
        finished = carry["finished"] | (tok == dcfg.eos_id)
        new_carry = {"tokens": tok, "finished": finished, "state": new_state,
                     "feats": hist, "copied": copied, "step": t + 1}
        # log_probs reports the probability of the token actually EMITTED:
        # on copy steps that is the copy mass, not the generator's argmax
        # (which was discarded)
        lp_emit = jnp.where(should_copy,
                            jnp.log(jnp.maximum(copy_prob, 1e-9)), sel_lp)
        outs = (tok, jnp.where(carry["finished"], 0.0, lp_emit), should_copy,
                jnp.where(should_copy, copy_prob, 0.0))
        return new_carry, outs

    step_rngs = jax.random.split(rng, G)
    final, (toks, lps, copies, cprobs) = jax.lax.scan(step, carry0, step_rngs)
    return {
        "token_ids": jnp.concatenate([seed[:, None], toks.T], axis=1),
        "log_probs": lps.T,
        "should_copy": copies.T,
        "copy_probs": cprobs.T,
        "finished": final["finished"],
    }
