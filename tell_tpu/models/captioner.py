"""Task model: multi-context news captioner.

Replaces the transformer_* task models
(/root/reference/tell/models/transformer_faces_objects.py:22-517 and its
faces/flattened/glove siblings) with one config-driven model. The frozen
towers (ResNet-152 grid, RoBERTa article encoder) plug in via
`tell_tpu.models.backbones`; this module consumes their *features* so the
same code serves training (precomputed features from the data pipeline) and
serving (features computed on-device in the same jitted program).

Generation is a fixed-length `lax.scan` with top-k sampling (k=1 == greedy,
matching every shipped config's sampling_topk=1) and an EOS mask instead of
the reference's dynamic active-set shrinking
(transformer_faces_objects.py:399-494).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from .decoder import (
    decode_softmax_quant, decode_step_quant, decode_vocab_table,
    decoder_loss, decoder_step, decoder_top_k,
    init_decode_state,
    init_decoder,
)


def init_captioner(rng: jax.Array, cfg: CaptionerConfig) -> dict:
    r_dec, r_bert = jax.random.split(rng)
    params = {"decoder": init_decoder(r_dec, cfg.decoder)}
    if cfg.weigh_bert:
        # learned softmax-weighted sum over all encoder hidden layers
        # (transformer_faces_objects.py:56-59, uniform init)
        params["bert_weight"] = jax.random.uniform(
            r_bert, (cfg.num_bert_layers,), jnp.float32)
    return params


def weighted_layer_sum(params: dict, hiddens: jax.Array) -> jax.Array:
    """hiddens: [B, S, L, D] -> [B, S, D] with softmax(bert_weight) mixing
    (transformer_faces_objects.py:355-364)."""
    w = jax.nn.softmax(params["bert_weight"].astype(jnp.float32))
    return jnp.einsum("bsld,l->bsd", hiddens, w.astype(hiddens.dtype))


def mask_nan_embeds(embeds: jax.Array) -> tuple[jax.Array, jax.Array]:
    """NaN rows mark absent faces/objects: zero them and return the pad mask
    (transformer_faces_objects.py:373-379)."""
    mask = jnp.isnan(embeds).any(axis=-1)
    return jnp.where(mask[..., None], 0.0, embeds), mask


def build_contexts(params: dict, cfg: CaptionerConfig, batch: dict) -> dict:
    """Assemble the decoder's context dict from encoder features.

    batch keys (any subset matching cfg.decoder.contexts):
      image_grid     [B, 49, 2048]   ResNet-152 7x7 grid, already flattened
      article        [B, S, D] or article_hiddens [B, S, L, D] when weighing
      article_mask   [B, S]          True = pad
      face_embeds    [B, F, 512]     NaN rows = absent
      obj_embeds     [B, O, 2048]    NaN rows = absent
    """
    contexts = {}
    names = {c.name for c in cfg.decoder.contexts}
    if "image" in names:
        grid = batch["image_grid"]
        pad = jnp.zeros(grid.shape[:2], bool)
        contexts["image"] = (grid, pad)
    if "article" in names:
        if cfg.weigh_bert and "article_hiddens" in batch:
            art = weighted_layer_sum(params, batch["article_hiddens"])
        else:
            art = batch["article"]
        contexts["article"] = (art, batch["article_mask"])
    if "faces" in names:
        feats, mask = mask_nan_embeds(batch["face_embeds"])
        contexts["faces"] = (feats, mask)
    if "obj" in names:
        feats, mask = mask_nan_embeds(batch["obj_embeds"])
        contexts["obj"] = (feats, mask)
    return contexts


def encode_contexts(frozen: dict, cfg: CaptionerConfig, batch: dict) -> dict:
    """Run the frozen towers that still need computing for this batch.

    The data pipeline precomputes ResNet grids; the RoBERTa article encode
    runs on-device here (its 25-hidden-layer output is too large to store).
    Gradients are stopped — the towers are frozen (config.yaml no_grad).
    """
    out = dict(batch)
    if ("context_ids" in batch and "article_hiddens" not in batch
            and "article" not in batch):
        from .backbones.roberta import roberta_encode_windowed
        rcfg = frozen["roberta_cfg"]
        # windowed past the position table (long-article configs: the
        # decoder attends over all windows' features; see
        # backbones/roberta.py::roberta_encode_windowed)
        hiddens = roberta_encode_windowed(frozen["roberta"], rcfg,
                                          batch["context_ids"],
                                          return_all_hiddens=cfg.weigh_bert)
        if not cfg.weigh_bert:
            out["article"] = jax.lax.stop_gradient(hiddens)
        else:
            out["article_hiddens"] = jax.lax.stop_gradient(hiddens)
        out["article_mask"] = batch["context_ids"] == rcfg.pad_id
    if "image" in batch and "image_grid" not in batch:
        from .backbones.resnet import resnet_forward
        grid = resnet_forward(frozen["resnet"], frozen["resnet_cfg"],
                              batch["image"])
        out["image_grid"] = jax.lax.stop_gradient(grid)
    return out


def captioner_loss_e2e(params: dict, frozen: dict, cfg: CaptionerConfig,
                       batch: dict, rng: jax.Array | None = None,
                       deterministic: bool = True) -> tuple[jax.Array, dict]:
    """Loss including frozen-tower encodes (the full training objective)."""
    return captioner_loss(params, cfg, encode_contexts(frozen, cfg, batch),
                          rng, deterministic)


def captioner_loss(params: dict, cfg: CaptionerConfig, batch: dict,
                   rng: jax.Array | None = None,
                   deterministic: bool = True) -> tuple[jax.Array, dict]:
    """Mean per-token loss in BITS (the reference reports loss/log2/sample,
    transformer_faces_objects.py:82-90). batch['caption_ids']: [B, T]."""
    contexts = build_contexts(params, cfg, batch)
    loss_sum, size, aux = decoder_loss(params["decoder"], cfg.decoder,
                                       batch["caption_ids"], contexts, rng,
                                       deterministic)
    size = jnp.maximum(size, 1)
    loss = loss_sum / jnp.log(2.0) / size
    return loss, {"sample_size": size, **aux}


def generate(params: dict, cfg: CaptionerConfig, batch: dict,
             rng: jax.Array | None = None, need_weights: bool = False,
             early_stop: bool = True) -> dict:
    """Top-k sampled generation (greedy when sampling_topk == 1).

    Returns {token_ids [B, gen_len+1] incl. seed <s>, log_probs [B, gen_len],
    attns (optional per-step per-layer head-averaged maps)}.

    early_stop: decode in a while_loop that exits once EVERY row has
    emitted EOS (captions average ~15 tokens vs gen_len=100, so serving
    latency drops several-fold on real batches). Exact: post-finish steps
    emit <pad> / 0.0 log-prob, which is precisely the buffer prefill, and
    the reference retires finished rows the same way
    (transformer_faces_objects.py:478-486). Ignored when need_weights
    (the demo's attention path keeps the scan). bench.py passes False —
    its contract is conservative full-length decode.
    """
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    state = init_decode_state(params["decoder"], dcfg, contexts, B,
                              dtype=feat0.dtype)
    # KV never changes during decode: close over it instead of carrying it
    # through the scan (a carried copy costs ~2 GB of HBM traffic PER STEP
    # at production shapes — XLA cannot alias unchanged scan carries).
    kv = state.pop("kv")
    embed_table = state.pop("embed_table")
    vocab_table = decode_vocab_table(params["decoder"], dcfg, feat0.dtype)
    quant_sm = decode_softmax_quant(params["decoder"], dcfg)
    step_quant = decode_step_quant(params["decoder"], dcfg)
    seed = jnp.full((B,), dcfg.bos_id, jnp.int32)
    # rows padded into the batch for shape stability (serving packs every
    # micro-batch to max_batch) start out finished, so the early-exit
    # condition depends only on real requests
    if "row_live" in batch:
        finished0 = ~batch["row_live"]
    else:
        finished0 = jnp.zeros((B,), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, step_rng):
        tokens, finished, dyn = carry
        feats, state, attns = decoder_step(
            params["decoder"], dcfg, tokens,
            {**dyn, "kv": kv, "embed_table": embed_table},
            need_weights=need_weights, quant=step_quant)
        state = {k: v for k, v in state.items()
                 if k not in ("kv", "embed_table")}
        topk_lp, topk_idx = decoder_top_k(params["decoder"], dcfg, feats,
                                          cfg.sampling_topk,
                                          vocab_table=vocab_table,
                                          quant_sm=quant_sm)
        if cfg.sampling_topk == 1:
            choice = jnp.zeros((B,), jnp.int32)
            sel_lp = topk_lp[:, 0]
        else:
            # temperature shapes the SAMPLING distribution only; the
            # reported log_probs stay the model's actual log-probability
            # of the sampled token (lstm_generate's contract)
            scaled = topk_lp / cfg.sampling_temp
            choice = jax.random.categorical(step_rng, scaled, axis=-1)
            sel_lp = jnp.take_along_axis(topk_lp,
                                         choice[:, None], axis=-1)[:, 0]
        sampled = jnp.take_along_axis(topk_idx, choice[:, None], axis=-1)[:, 0]
        next_tok = jnp.where(finished, dcfg.pad_id, sampled)
        sel_lp = jnp.where(finished, 0.0, sel_lp)
        new_finished = finished | (sampled == dcfg.eos_id)
        outs = (next_tok, sel_lp, attns if need_weights else ())
        return (next_tok, new_finished, state), outs

    step_rngs = jax.random.split(rng, cfg.gen_len)
    if early_stop and not need_weights:
        toks0 = jnp.full((cfg.gen_len, B), dcfg.pad_id, jnp.int32)
        lps0 = jnp.zeros((cfg.gen_len, B), jnp.float32)

        def w_cond(c):
            t, _, finished, _, _, _ = c
            return (t < cfg.gen_len) & ~jnp.all(finished)

        def w_body(c):
            t, tokens, finished, dyn, toks, lps = c
            (tokens, finished, dyn), (tok, lp, _) = step(
                (tokens, finished, dyn), step_rngs[t])
            return (t + 1, tokens, finished, dyn,
                    toks.at[t].set(tok), lps.at[t].set(lp))

        _, _, finished, _, toks, lps = jax.lax.while_loop(
            w_cond, w_body, (0, seed, finished0, state, toks0, lps0))
        attns = ()
    else:
        (_, finished, _), (toks, lps, attns) = jax.lax.scan(
            step, (seed, finished0, state), step_rngs)
    token_ids = jnp.concatenate([seed[:, None], toks.T], axis=1)
    out = {"token_ids": token_ids, "log_probs": lps.T, "finished": finished}
    if need_weights:
        # per-layer stacked maps [gen_len, B, M, 1, S_tot] -> per-context
        # dicts [gen_len, B, 1, S_m] (the demo's attention payload)
        from .decoder import attn_segment_bounds, split_attn_segments
        bounds = attn_segment_bounds(dcfg, contexts)
        out["attns"] = [split_attn_segments(bounds, a) for a in attns]
    return out


def predict_forced(params: dict, cfg: CaptionerConfig, batch: dict,
                   token_ids: jax.Array) -> jax.Array:
    """Teacher-forced next-token argmax predictions for a KNOWN sequence.

    Feeds token_ids[:, t] through the incremental decode path (the same
    decoder_step + decoder_top_k the free-running loop uses, building the
    same K/V cache) and records each step's top-1 prediction WITHOUT
    letting it influence the next step. This is the numerics-gate
    primitive: free-running greedy agreement between two decode numerics
    (e.g. fp vs int8 K/V) is chaotic — one near-tie argmax flip rewrites
    the whole suffix — so it cannot distinguish a ~1%/step rounding flip
    from a broken kernel. Per-step forced agreement has no cascade: a
    healthy quantized path scores ~0.99 at even RANDOM-weight margins,
    a broken one ~1/sqrt(V). Used by bench.py's numerics gate and
    `tnt serve --numerics-ab`.

    token_ids: [B, T+1] including the seed <s> (generate's contract).
    Returns [B, T] int32 argmax predictions (compare to token_ids[:, 1:]).
    """
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    state = init_decode_state(params["decoder"], dcfg, contexts, B,
                              dtype=feat0.dtype)
    kv = state.pop("kv")
    embed_table = state.pop("embed_table")
    vocab_table = decode_vocab_table(params["decoder"], dcfg, feat0.dtype)
    quant_sm = decode_softmax_quant(params["decoder"], dcfg)
    step_quant = decode_step_quant(params["decoder"], dcfg)

    def step(dyn, tok):
        feats, st, _ = decoder_step(
            params["decoder"], dcfg, tok,
            {**dyn, "kv": kv, "embed_table": embed_table},
            quant=step_quant)
        st = {k: v for k, v in st.items()
              if k not in ("kv", "embed_table")}
        _, idx = decoder_top_k(params["decoder"], dcfg, feats, 1,
                               vocab_table=vocab_table, quant_sm=quant_sm)
        return st, idx[:, 0]

    _, preds = jax.lax.scan(step, state,
                            jnp.asarray(token_ids)[:, :-1].T)
    return preds.T


def replay_attention(params: dict, cfg: CaptionerConfig, batch: dict,
                     token_ids: jax.Array) -> list[dict]:
    """Attention maps for a KNOWN token sequence, teacher-forced.

    Cross-attention at step t depends only on the token prefix, so
    replaying a finished caption reproduces exactly the maps the decode
    loop would have recorded (asserted vs generate(need_weights=True) in
    tests/test_serving.py). This is how the continuous-batching engine
    serves the demo's per-word attention payload
    (transformer_faces_objects.py:142-309) without carrying per-step
    attention state for every beam of every slot: one B=1 scan per
    attention-requesting caption, off the engine's hot path.

    token_ids: [B, T+1] including the seed <s> (generate's contract).
    Returns per-layer per-context dicts of [T, B, 1, S_m] maps.
    """
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    state = init_decode_state(params["decoder"], dcfg, contexts, B,
                              dtype=feat0.dtype)
    kv = state.pop("kv")
    embed_table = state.pop("embed_table")

    def step(dyn, tok):
        _, st, attns = decoder_step(
            params["decoder"], dcfg, tok,
            {**dyn, "kv": kv, "embed_table": embed_table},
            need_weights=True)
        st = {k: v for k, v in st.items()
              if k not in ("kv", "embed_table")}
        return st, attns

    _, attns = jax.lax.scan(step, state,
                            jnp.asarray(token_ids)[:, :-1].T)
    from .decoder import attn_segment_bounds, split_attn_segments
    bounds = attn_segment_bounds(dcfg, contexts)
    return [split_attn_segments(bounds, a) for a in attns]
