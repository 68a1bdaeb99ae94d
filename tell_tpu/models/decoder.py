"""DynamicConv caption decoder with N parallel cross-attended contexts.

Replaces the reference's four near-identical decoder classes
(/root/reference/tell/models/decoder_faces_objects.py:22-380 and the
_faces_parallel / _flattened / _flattened_no_image variants, SURVEY.md §2.4)
with ONE decoder parameterized by `DecoderConfig.contexts`.

Layer structure (post-norm, normalize_before=False in all shipped configs):

    x ─ input_dropout → linear1 → GLU → dynamic_conv → linear2 → dropout
      ─ +residual → LN                                  (conv block)
    for each context c: LN(x + dropout(cross_attn_c(x)))  (parallel branches)
    x = context_fc(concat(branches))                       (no residual here!)
    x ─ relu(fc1) → relu_dropout → fc2 → dropout → +residual → LN   (FFN)

Decoding is a fixed-shape `lax.scan`: the decode state carries per-layer conv
ring buffers, precomputed static K/V for every context
(multi_head.py:382-403 static_kv semantics) and a step counter — replacing
the reference's mutable incremental-state dict and its dynamic batch
shrinking (transformer_faces_objects.py:417-431) with masking.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import DecoderConfig
from ..ops.adaptive import (
    adaptive_embed, adaptive_log_probs, adaptive_softmax_loss,
    adaptive_top_k, init_adaptive_embedding, init_adaptive_softmax,
)
from ..ops.attention import (
    cross_attention_with_kv, init_cross_attention, precompute_kv,
)
from ..ops.common import dropout, glu, init_layer_norm, layer_norm
from ..ops.dynamic_conv import (
    dynamic_conv, dynamic_conv_step, init_conv_state, init_dynamic_conv,
    init_lightweight_conv, lightweight_conv, lightweight_conv_step,
)
from ..ops.linear import gehring_linear, init_gehring_linear
from ..ops.positional import sinusoidal_embed, sinusoidal_table


@functools.lru_cache(maxsize=8)
def _pos_table(n: int, dim: int, pad: int):
    return sinusoidal_table(n, dim, padding_idx=pad)


def init_decoder(rng: jax.Array, cfg: DecoderConfig) -> dict:
    r_embed, r_sm, r_layers = jax.random.split(rng, 3)
    params: dict = {
        "embed": init_adaptive_embedding(
            r_embed, cfg.full_cutoffs, initial_dim=cfg.embed_dim,
            factor=cfg.adaptive_factor, output_dim=cfg.embed_dim,
            padding_idx=cfg.embed_padding_idx),
        "adaptive_softmax": init_adaptive_softmax(
            r_sm, cfg.full_cutoffs, cfg.embed_dim, factor=cfg.adaptive_factor),
        "layers": [],
    }
    for i, k in enumerate(cfg.kernel_sizes):
        params["layers"].append(_init_layer(jax.random.fold_in(r_layers, i),
                                            cfg, k))
    if cfg.normalize_before and cfg.final_norm:
        params["final_ln"] = init_layer_norm(cfg.embed_dim)
    return params


def _init_layer(rng: jax.Array, cfg: DecoderConfig, kernel_size: int) -> dict:
    keys = jax.random.split(rng, 8 + len(cfg.contexts))
    conv_in = 2 * cfg.conv_dim if cfg.glu else cfg.conv_dim
    if cfg.conv_type == "dynamic":
        conv = init_dynamic_conv(keys[1], cfg.conv_dim, kernel_size,
                                 cfg.num_heads)
    else:
        conv = init_lightweight_conv(keys[1], kernel_size, cfg.num_heads)
    p = {
        "linear1": init_gehring_linear(keys[0], cfg.embed_dim, conv_in),
        "conv": conv,
        "linear2": init_gehring_linear(keys[2], cfg.conv_dim, cfg.embed_dim),
        "conv_ln": init_layer_norm(cfg.embed_dim),
        "attn": {},
        "attn_ln": {},
        "context_fc": init_gehring_linear(
            keys[3], cfg.embed_dim * len(cfg.contexts), cfg.embed_dim),
        "fc1": init_gehring_linear(keys[4], cfg.embed_dim, cfg.ffn_dim),
        "fc2": init_gehring_linear(keys[5], cfg.ffn_dim, cfg.embed_dim),
        "final_ln": init_layer_norm(cfg.embed_dim),
    }
    for j, spec in enumerate(cfg.contexts):
        p["attn"][spec.name] = init_cross_attention(
            keys[8 + j], cfg.embed_dim, cfg.num_heads,
            kdim=spec.kv_dim, vdim=spec.kv_dim)
        p["attn_ln"][spec.name] = init_layer_norm(cfg.embed_dim)
    return p


def embed_tokens(params: dict, cfg: DecoderConfig, ids: jax.Array,
                 start_pos: jax.Array | int = 0,
                 rng: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
    """Adaptive + sinusoidal sum (SumTextFieldEmbedder semantics), dropout."""
    x = adaptive_embed(params["embed"], ids, cfg.full_cutoffs, cfg.embed_dim,
                       padding_idx=cfg.embed_padding_idx,
                       scale_embeds=cfg.scale_embeds)
    table = _pos_table(cfg.max_target_positions + cfg.pad_id + 2,
                       cfg.embed_dim, cfg.pad_id)
    x = x + sinusoidal_embed(table, ids, cfg.pad_id, start_pos).astype(x.dtype)
    return dropout(x, cfg.dropout, rng, deterministic)


def _conv_block_full(lp: dict, cfg: DecoderConfig, kernel_size: int,
                     x: jax.Array, rng, deterministic: bool) -> jax.Array:
    residual = x
    r1, r2 = _split(rng, 2)
    h = dropout(x, cfg.input_dropout, r1, deterministic)
    h = gehring_linear(lp["linear1"], h)
    if cfg.glu:
        h = glu(h)
    if cfg.conv_type == "dynamic":
        h = dynamic_conv(lp["conv"], h, kernel_size=kernel_size,
                         num_heads=cfg.num_heads,
                         weight_softmax=cfg.weight_softmax,
                         weight_dropout=cfg.weight_dropout,
                         rng=r2, deterministic=deterministic)
    else:
        h = lightweight_conv(lp["conv"], h, kernel_size=kernel_size,
                             num_heads=cfg.num_heads,
                             weight_softmax=cfg.weight_softmax,
                             weight_dropout=cfg.weight_dropout,
                             rng=r2, deterministic=deterministic)
    h = gehring_linear(lp["linear2"], h)
    h = dropout(h, cfg.dropout, _split(rng, 3)[2], deterministic)
    return layer_norm(lp["conv_ln"], residual + h)


def _attn_and_ffn(lp: dict, cfg: DecoderConfig, x: jax.Array,
                  kv: dict, rng, deterministic: bool,
                  need_weights: bool) -> tuple[jax.Array, dict]:
    """Shared between full forward and decode step: the cross-attention
    branches + context_fc + FFN, given precomputed per-context K/V."""
    attns = {}
    branches = []
    for j, spec in enumerate(cfg.contexts):
        k, v, mask = kv[spec.name]
        r = None if rng is None else jax.random.fold_in(rng, 100 + j)
        out, attn = cross_attention_with_kv(
            lp["attn"][spec.name], x, k, v, mask, num_heads=cfg.num_heads,
            attn_dropout=cfg.attention_dropout, rng=r,
            deterministic=deterministic, need_weights=need_weights)
        out = dropout(out, cfg.dropout,
                      None if rng is None else jax.random.fold_in(rng, 200 + j),
                      deterministic)
        branches.append(layer_norm(lp["attn_ln"][spec.name], x + out))
        if attn is not None:
            attns[spec.name] = attn
    h = gehring_linear(lp["context_fc"], jnp.concatenate(branches, axis=-1))

    residual = h
    h = jax.nn.relu(gehring_linear(lp["fc1"], h))
    h = dropout(h, cfg.relu_dropout,
                None if rng is None else jax.random.fold_in(rng, 300),
                deterministic)
    h = gehring_linear(lp["fc2"], h)
    h = dropout(h, cfg.dropout,
                None if rng is None else jax.random.fold_in(rng, 301),
                deterministic)
    return layer_norm(lp["final_ln"], residual + h), attns


def _split(rng, n):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def precompute_context_kv(params: dict, cfg: DecoderConfig,
                          contexts: dict) -> list[dict]:
    """Per-layer, per-context projected K/V (+bias/zero cols) and masks.

    contexts: {name: (features [B,S,D], padding_mask [B,S] True=pad)}.
    """
    kvs = []
    for lp in params["layers"]:
        layer_kv = {}
        for spec in cfg.contexts:
            feats, mask = contexts[spec.name]
            layer_kv[spec.name] = precompute_kv(lp["attn"][spec.name],
                                                feats, mask)
        kvs.append(layer_kv)
    return kvs


def decoder_forward(params: dict, cfg: DecoderConfig, ids: jax.Array,
                    contexts: dict, rng: jax.Array | None = None,
                    deterministic: bool = True,
                    need_weights: bool = False
                    ) -> tuple[jax.Array, list[dict]]:
    """Teacher-forced forward. ids: [B, T] -> features [B, T, E]."""
    r_embed = None if rng is None else jax.random.fold_in(rng, 0)
    x = embed_tokens(params, cfg, ids, rng=r_embed,
                     deterministic=deterministic)
    kvs = precompute_context_kv(params, cfg, contexts)
    all_attns = []
    for i, (lp, k) in enumerate(zip(params["layers"], cfg.kernel_sizes)):
        r = None if rng is None else jax.random.fold_in(rng, 1 + i)
        x = _conv_block_full(lp, cfg, k, x, r, deterministic)
        x, attns = _attn_and_ffn(lp, cfg, x, kvs[i], r, deterministic,
                                 need_weights)
        all_attns.append(attns)
    if "final_ln" in params:
        x = layer_norm(params["final_ln"], x)
    return x, all_attns


def decoder_loss(params: dict, cfg: DecoderConfig, caption_ids: jax.Array,
                 contexts: dict, rng: jax.Array | None = None,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array, dict]:
    """Adaptive-softmax loss on right-shifted targets.

    caption_ids: [B, T] = <s> tokens </s> pads. Input is ids[:, :-1], target
    is ids[:, 1:] (transformer_faces_objects.py:321-328). Returns
    (loss_sum_nats, sample_size, aux).
    """
    inputs = caption_ids[:, :-1]
    targets = caption_ids[:, 1:]
    feats, _ = decoder_forward(params, cfg, inputs, contexts, rng,
                               deterministic)
    B, T, E = feats.shape
    cap = None
    if cfg.tail_capacity_frac is not None:
        n = B * T
        cap = tuple(max(int(n * f), 8) for f in cfg.tail_capacity_frac)
    r_sm = None if rng is None else jax.random.fold_in(rng, 999)
    loss, size, aux = adaptive_softmax_loss(
        params["adaptive_softmax"], params["embed"], feats.reshape(B * T, E),
        targets.reshape(-1), cfg.full_cutoffs, pad_id=cfg.pad_id,
        padding_idx=cfg.embed_padding_idx, tail_capacity=cap,
        drop_rate=cfg.adaptive_softmax_dropout, rng=r_sm,
        deterministic=deterministic)
    return loss, size, aux


def decoder_log_probs(params: dict, cfg: DecoderConfig,
                      feats: jax.Array) -> jax.Array:
    """Full-vocab log-probs from decoder features [..., E] -> [..., V]."""
    shape = feats.shape[:-1]
    lp = adaptive_log_probs(params["adaptive_softmax"], params["embed"],
                            feats.reshape(-1, feats.shape[-1]),
                            cfg.full_cutoffs,
                            padding_idx=cfg.embed_padding_idx)
    return lp.reshape(*shape, cfg.vocab_size)


def decoder_top_k(params: dict, cfg: DecoderConfig, feats: jax.Array,
                  k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k next-token log-probs from step features [B, E] — the
    decode hot path (never materializes the [B, V] distribution)."""
    return adaptive_top_k(params["adaptive_softmax"], params["embed"],
                          feats, cfg.full_cutoffs, k,
                          padding_idx=cfg.embed_padding_idx)


# ---------------------------------------------------------------------------
# Incremental decode
# ---------------------------------------------------------------------------

def init_decode_state(params: dict, cfg: DecoderConfig, contexts: dict,
                      batch: int, beam: int = 1, dtype=jnp.float32) -> dict:
    """Fixed-shape decode state pytree: conv ring buffers + static KV + step.

    KV is stored UNtiled — one copy per batch element, shared by all beams.
    During beam decode the beam axis rides the attention query's "time" axis
    (cross-attention has no causal mask, so beams stay independent), which
    cuts the dominant per-step HBM traffic (article K/V reads) by the beam
    factor versus the reference-style tiled layout.
    """
    return {
        "conv": [init_conv_state(batch * beam, cfg.conv_dim, k, dtype)
                 for k in cfg.kernel_sizes],
        "kv": precompute_context_kv(params, cfg, contexts),
        "step": jnp.zeros((), jnp.int32),
    }


def decoder_step(params: dict, cfg: DecoderConfig, tokens: jax.Array,
                 state: dict, need_weights: bool = False
                 ) -> tuple[jax.Array, dict, list[dict]]:
    """One decode step. tokens: [B*beam] -> (features [B*beam, E], state',
    attns). beam is inferred from tokens vs KV row counts.

    Deterministic (no dropout) — decoding never trains.
    """
    R = tokens.shape[0]
    first_kv = next(iter(state["kv"][0].values()))[0]
    B = first_kv.shape[0]
    K = R // B
    x = embed_tokens(params, cfg, tokens[:, None],
                     start_pos=state["step"])[:, 0]  # [R, E]
    new_conv = []
    all_attns = []
    for i, (lp, k) in enumerate(zip(params["layers"], cfg.kernel_sizes)):
        # conv block, single step (row-wise)
        residual = x
        h = gehring_linear(lp["linear1"], x)
        if cfg.glu:
            h = glu(h)
        step_fn = (dynamic_conv_step if cfg.conv_type == "dynamic"
                   else lightweight_conv_step)
        h, buf = step_fn(lp["conv"], h, state["conv"][i], kernel_size=k,
                         num_heads=cfg.num_heads,
                         weight_softmax=cfg.weight_softmax)
        new_conv.append(buf)
        h = gehring_linear(lp["linear2"], h)
        h = layer_norm(lp["conv_ln"], residual + h)
        # attention + FFN on [B, beam, E] against shared per-batch KV
        h, attns = _attn_and_ffn(lp, cfg, h.reshape(B, K, -1),
                                 state["kv"][i], None, True, need_weights)
        x = h.reshape(R, -1)
        all_attns.append(attns)
    if "final_ln" in params:
        x = layer_norm(params["final_ln"], x)
    new_state = {"conv": new_conv, "kv": state["kv"],
                 "step": state["step"] + 1}
    return x, new_state, all_attns
