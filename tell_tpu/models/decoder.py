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
    merged_decode_table,
    merged_embed_table,
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
from ..ops.positional import (init_learned_positional, sinusoidal_embed,
                              sinusoidal_table)


@functools.lru_cache(maxsize=8)
def _pos_table(n: int, dim: int, pad: int):
    return sinusoidal_table(n, dim, padding_idx=pad)


def _positional_table(params: dict, cfg: DecoderConfig):
    if cfg.positional == "learned":
        return params["pos_embed"]["table"]
    return _pos_table(cfg.max_target_positions + cfg.pad_id + 2,
                      cfg.embed_dim, cfg.pad_id)


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
    if cfg.positional == "learned":
        params["pos_embed"] = init_learned_positional(
            jax.random.fold_in(r_embed, 7919),
            cfg.max_target_positions + cfg.pad_id + 2, cfg.embed_dim,
            padding_idx=cfg.pad_id)
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
    """Adaptive + positional sum (SumTextFieldEmbedder semantics), dropout.

    The positional term is the static sinusoidal table or, with
    cfg.positional == "learned", the trainable table in params["pos_embed"]
    (same pad-aware position semantics either way)."""
    x = adaptive_embed(params["embed"], ids, cfg.full_cutoffs, cfg.embed_dim,
                       padding_idx=cfg.embed_padding_idx,
                       scale_embeds=cfg.scale_embeds)
    table = _positional_table(params, cfg)
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


# ---------------------------------------------------------------------------
# Stacked decode attention: context branches batched into few op chains.
#
# The reference runs four independent MultiHeadAttention modules per layer
# per decode step (decoder_faces_objects.py:271-352) — at one token per
# step those are dozens of tiny kernels, and decode becomes launch-latency
# bound rather than HBM bound. Here ALL contexts share ONE concatenated-KV
# attention chain per layer (context_groups() returns a single group):
# modalities ride a "virtual modality" axis with a segment-masked softmax.
# Decode is bound by serial op-chain latency, not score bytes — measured
# 6.1 ms/step for one chain vs 27 ms for either per-context chains or a
# 2-chain article split (see the context_groups docstring), so the extra
# stacked-score traffic over the article's 514 rows is free in practice.
# ---------------------------------------------------------------------------

def _kv8_enabled() -> bool:
    """int8 K/V cache — DEFAULT ON on TPU (disable with TELL_TPU_KV8=0):
    halves the decode loop's dominant HBM stream, measured 263 -> 304
    captions/s beam-5 B=128 on v5e-1. Per-source-row, per-head symmetric
    quantization with fp32 scales; scales factor out of both attention
    contractions, so the only approximation is the int8 rounding of K/V
    themselves (~1e-2 relative on attention outputs). The parity gate is
    tests/test_decoder.py::test_int8_kv_decode_parity_gate (token-level
    agreement vs the fp path, which stays the parity reference); off-TPU
    the fp path is the default so CPU parity tests are exact."""
    from ..ops.kernels.dispatch import env_flag, on_tpu
    return env_flag("TELL_TPU_KV8", default=on_tpu())


def _kv4_enabled() -> bool:
    """int4 packed K/V cache — OPT-IN (TELL_TPU_KV4=1, overrides the int8
    default): halves the decode loop's dominant HBM stream AGAIN relative
    to int8 by nibble-packing two 4-bit K/V values per byte along the head
    dim. Same per-source-row/per-head symmetric scales factoring out of
    both contractions; the approximation is the 4-bit rounding (15 levels
    per row). Opt-in for two measured reasons: (a) token-level drift vs
    the fp path is larger than int8's (tests/test_decoder.py::
    test_int4_kv_decode_parity); (b) at production decode shapes it is a
    memory lever, NOT a speed lever — the in-kernel nibble unpack costs
    more than the halved DMA saves (0.137-0.151 ms/call vs int8's 0.122
    at B=64/S=640 on v5e, tools/kernel_variants.py VARIANT=q4/q4split),
    so use it to fit longer contexts or bigger batches in HBM, not to
    chase captions/s."""
    from ..ops.kernels.dispatch import env_flag
    return env_flag("TELL_TPU_KV4")


def kv_cache_mode() -> str:
    """The active decode K/V cache numerics: "int4", "int8", or "fp".
    Surfaced in eval/bench/serving status output so reported scores and
    throughputs are attributable to the quantized or fp path (the int8
    default changes decode numerics vs the fp reference)."""
    if _kv4_enabled():
        return "int4"
    return "int8" if _kv8_enabled() else "fp"


# A time-slot ring conv decode state (TELL_TPU_CONV_RING) — one [R, C]
# slot write per step, beam lineage resolved at read time through an
# ancestor table — was built as an exact alternative to the shifting
# window and REMOVED after round-4 A/Bs measured it slower on both the
# micro-batch and engine paths (see ops/dynamic_conv.py's note for the
# numbers and why).


def _quantize_kv(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """t: [B, H, hd, S] -> (int8 values, scales [B, H, 1, S])."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def _quantize_kv4(t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """t: [B, H, hd, S] -> (nibble-packed int8 [B, H, hd/2, S], scales
    [B, H, 1, S]). Byte d packs rows (d, d + hd/2) as two's-complement
    low/high nibbles in [-7, 7] — the layout unpack_int4 restores."""
    hd = t.shape[2]
    assert hd % 2 == 0, "int4 packing needs an even head dim"
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale), -7, 7)
    q = q.astype(jnp.int8)
    lo = q[:, :, :hd // 2] & jnp.int8(0x0F)
    hi = q[:, :, hd // 2:] << jnp.int8(4)
    return lo | hi, scale.astype(jnp.float32)


def context_groups(cfg: DecoderConfig) -> tuple[tuple[int, ...], ...]:
    """Static grouping of context indices into stacked attention chains.

    Measured on v5e-1 (tools/profile_decode.py, B=320, S=512): ONE chain
    for all four modalities runs the decode step in 6.1 ms vs 27 ms for
    separate per-context chains — and a 2-chain split (article singled
    out to avoid the 4x stacked-score traffic over its 514 rows) measures
    the same 27 ms as 4 chains. Decode is bound by the serial op-chain
    latency, not by score bytes, so everything shares one chain. Derived
    from config only, so it is identical at decode-state build time and
    inside the scanned step."""
    return (tuple(range(len(cfg.contexts))),)


def precompute_context_kv_cat(params: dict, cfg: DecoderConfig,
                              contexts: dict,
                              beam: int | None = None) -> list[list[dict]]:
    """Per-layer, per-group concatenated K/V with within-group segment ids.

    Returns [layers][groups] of {k: [B,S_g,E], v: [B,S_g,E],
    mask: [B,S_g] True=masked, seg: [S_g] int32 in-group modality index}.
    With `beam` given, the fused kernel's additive segment bias
    [B, M*beam, S_g] is also precomputed once per group (identical across
    layers and decode steps — recomputing it inside the scanned step
    costs a [B, MG, S] materialization per layer per step)."""
    groups = context_groups(cfg)
    H = cfg.num_heads
    kvs = []
    for lp in params["layers"]:
        layer = []
        for gi, group in enumerate(groups):
            ks, vs, masks, segs = [], [], [], []
            for j, idx in enumerate(group):
                spec = cfg.contexts[idx]
                feats, mask = contexts[spec.name]
                k, v, kmask = precompute_kv(lp["attn"][spec.name], feats,
                                            mask)
                ks.append(k)
                vs.append(v)
                masks.append(kmask)
                segs.append(jnp.full((k.shape[1],), j, jnp.int32))
            k = jnp.concatenate(ks, axis=1)
            v = jnp.concatenate(vs, axis=1)
            B, S, E = k.shape
            # HEAD-MAJOR TRANSPOSED storage [B, H, hd, S]: each kernel
            # grid cell reads contiguous lane-aligned [hd, S] tiles
            # (Mosaic cannot relayout a lane-dim split in-kernel, and an
            # hd-minor layout would halve DMA efficiency)
            kt = k.reshape(B, S, H, E // H).transpose(0, 2, 3, 1)
            vt = v.reshape(B, S, H, E // H).transpose(0, 2, 3, 1)
            entry = {"mask": jnp.concatenate(masks, axis=1),
                     "seg": jnp.concatenate(segs)}
            if _kv4_enabled():
                entry["k"], entry["k_scale"] = _quantize_kv4(kt)
                entry["v"], entry["v_scale"] = _quantize_kv4(vt)
            elif _kv8_enabled():
                entry["k"], entry["k_scale"] = _quantize_kv(kt)
                entry["v"], entry["v_scale"] = _quantize_kv(vt)
            else:
                entry["k"], entry["v"] = kt, vt
            # Stacked per-modality q/out projection weights, PRECOMPUTED
            # once per decode call: inside the scanned step XLA does not
            # reliably hoist the jnp.stack concatenations out of the
            # loop, and re-materializing [M, E, E] x2 per layer per step
            # is ~134 MB/step of pure write traffic at flagship shapes.
            names = [cfg.contexts[i].name for i in group]
            ap = lp["attn"]
            entry["wq"] = jnp.stack([ap[n]["q_proj"]["w"] for n in names])
            entry["bq"] = jnp.stack([ap[n]["q_proj"]["b"] for n in names])
            entry["wo"] = jnp.stack([ap[n]["out_proj"]["w"] for n in names])
            entry["bo"] = jnp.stack([ap[n]["out_proj"]["b"] for n in names])
            if "attn_ln" in lp:  # flagship decoder; the modern LM's cross
                # block has no per-branch LN (llm_decoder.py)
                entry["ln_s"] = jnp.stack([lp["attn_ln"][n]["scale"]
                                           for n in names])
                entry["ln_b"] = jnp.stack([lp["attn_ln"][n]["bias"]
                                           for n in names])
            if beam:
                # one buffer PER LAYER even though the values are
                # identical: sharing one array across the 4 layers'
                # pytree leaves breaks donation ("donate the same buffer
                # twice") in the serving engine's donated-state _admit
                from ..ops.kernels.decode_attention import segment_bias
                entry["bias"] = segment_bias(entry["seg"], entry["mask"],
                                             len(group), beam)
            layer.append(entry)
        kvs.append(layer)
    return kvs


def attn_segment_bounds(cfg: DecoderConfig, contexts: dict
                        ) -> tuple[tuple[tuple[str, int, int], ...], ...]:
    """Static per-group (name, offset, length) of each modality on its
    group's concatenated source axis (+2 bias/zero KV columns). Used to
    split stacked attention maps back into per-context dicts AFTER a scan
    — static metadata must not ride the scanned state."""
    out = []
    for group in context_groups(cfg):
        bounds = []
        off = 0
        for idx in group:
            spec = cfg.contexts[idx]
            S_m = contexts[spec.name][0].shape[1] + 2
            bounds.append((spec.name, off, S_m))
            off += S_m
        out.append(tuple(bounds))
    return tuple(out)


def split_attn_segments(group_bounds, group_probs) -> dict:
    """group_probs: per group [..., M_g, G, S_g] -> {name: [..., G, S_m]}."""
    attns = {}
    for bounds, probs in zip(group_bounds, group_probs):
        for j, (name, off, S_m) in enumerate(bounds):
            attns[name] = probs[..., j, :, off:off + S_m]
    return attns


def _ln_stacked(scale: jax.Array, bias: jax.Array, x: jax.Array,
                eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis with per-modality [M, E] params;
    x: [B, M, G, E]."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale[None, :, None, :] + bias[None, :, None, :]
    return y.astype(x.dtype)


def stacked_attention_core(attn_params: dict, names: list[str],
                           num_heads: int, x: jax.Array, cat: dict,
                           need_weights: bool
                           ) -> tuple[jax.Array, jax.Array | None]:
    """The shared stacked multi-context attention body: per-modality q/out
    projections stacked over a modality axis, one segment-masked attention
    chain over the group's concatenated K/V (fused Pallas kernel or jnp
    fallback, int8-K/V aware). Used by both the flagship decoder's
    _attn_group (which adds per-branch residual+LN) and the modern LM's
    cross block (which doesn't) — one implementation, one quant path.

    x: [B, G, E] -> (out [B, M, G, E] pre-residual,
    head-averaged probs [B, M, G, S] or None)."""
    B, G, E = x.shape
    M = len(names)
    H = num_heads
    hd = E // H

    # use precomputed stacks when the decode-state cat carries them
    # (precompute_context_kv_cat); stack on the fly in the full forward
    if "wq" in cat:
        wq, bq = cat["wq"], cat["bq"]
    else:
        wq = jnp.stack([attn_params[n]["q_proj"]["w"] for n in names])
        bq = jnp.stack([attn_params[n]["q_proj"]["b"] for n in names])
    q = jnp.einsum("bge,mef->bmgf", x, wq.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    q = (q + bq.astype(x.dtype)[None, :, None, :]) * (hd ** -0.5)
    # Fold the modality axis into the query-row axis so the score/value
    # contractions read K and V from HBM once for all M branches; KV is
    # stored head-major transposed [B, H, hd, S]
    # (see precompute_context_kv_cat).
    qh = q.reshape(B, M * G, H, hd).transpose(0, 2, 1, 3)  # [B,H,MG,hd]
    kh, vh = cat["k"], cat["v"]                    # [B,H,hd,S] transposed
    S = kh.shape[3]
    from ..ops.kernels.dispatch import fused_kernels_enabled
    probs = None
    quant = "k_scale" in cat
    if fused_kernels_enabled() and not need_weights:
        from ..ops.kernels.decode_attention import (
            fused_decode_attention, fused_decode_attention_q8, segment_bias)
        bias = cat.get("bias")
        if bias is None or bias.shape[1] != M * G:
            bias = segment_bias(cat["seg"], cat["mask"], M, G)
        if quant:
            out = fused_decode_attention_q8(
                qh, kh, cat["k_scale"], vh, cat["v_scale"], bias)
        else:
            out = fused_decode_attention(qh, kh, vh, bias)
    else:
        if quant and kh.shape[2] != hd:
            # nibble-packed int4 K/V: unpack to int8 values, then the
            # int8 math below applies unchanged
            from ..ops.kernels.decode_attention import unpack_int4
            kh, vh = unpack_int4(kh), unpack_int4(vh)
        if quant:
            # int8 K/V: per-row scales factor out of both contractions
            scores = jnp.einsum("bhxd,bhds->bhxs", qh,
                                kh.astype(x.dtype),
                                preferred_element_type=jnp.float32)
            scores = scores * cat["k_scale"]          # fp32 [B, H, 1, S]
        else:
            scores = jnp.einsum("bhxd,bhds->bhxs", qh, kh,
                                preferred_element_type=jnp.float32)
        seg_ok = cat["seg"][None, :] == jnp.arange(M)[:, None]      # [M,S]
        allowed = seg_ok[None] & ~cat["mask"][:, None, :]           # [B,M,S]
        allowed = jnp.repeat(allowed, G, axis=1)                    # [B,MG,S]
        scores = jnp.where(allowed[:, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        pv = probs
        if quant:
            pv = probs * cat["v_scale"].reshape(B, H, 1, S)
        out = jnp.einsum("bhxs,bhds->bhxd", pv.astype(x.dtype),
                         vh.astype(x.dtype) if quant else vh,
                         preferred_element_type=jnp.float32
                         ).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, M, G, E)
    if "wo" in cat:
        wo, bo = cat["wo"], cat["bo"]
    else:
        wo = jnp.stack([attn_params[n]["out_proj"]["w"] for n in names])
        bo = jnp.stack([attn_params[n]["out_proj"]["b"] for n in names])
    out = jnp.einsum("bmge,mef->bmgf", out, wo.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + bo.astype(x.dtype)[None, :, None, :]
    attn = (jnp.mean(probs, axis=1).reshape(B, M, G, S)
            if need_weights else None)
    return out, attn


def _attn_group(lp: dict, cfg: DecoderConfig, x: jax.Array,
                group: tuple[int, ...], cat: dict, need_weights: bool
                ) -> tuple[jax.Array, jax.Array | None]:
    """One stacked attention chain for a context group.

    x: [B, G, E] -> branches [B, M_g, G, E] (post residual+LN),
    optionally head-averaged probs [B, M_g, G, S_g]."""
    names = [cfg.contexts[i].name for i in group]
    out, attn = stacked_attention_core(lp["attn"], names, cfg.num_heads, x,
                                       cat, need_weights)
    if "ln_s" in cat:
        ln_s, ln_b = cat["ln_s"], cat["ln_b"]
    else:
        ln_s = jnp.stack([lp["attn_ln"][n]["scale"] for n in names])
        ln_b = jnp.stack([lp["attn_ln"][n]["bias"] for n in names])
    branches = _ln_stacked(ln_s, ln_b, x[:, None] + out)            # [B,M,G,E]
    return branches, attn


def _attn_and_ffn_cat(lp: dict, cfg: DecoderConfig, x: jax.Array,
                      cats: list[dict], need_weights: bool,
                      q8: dict | None = None) -> tuple[jax.Array, list]:
    """Decode-step equivalent of _attn_and_ffn over grouped stacked KV.

    x: [B, G, E] (G = beam or 1). Deterministic (no dropout) — decode only.
    Numerics match the per-context path exactly when q8 is None: same
    projections, fp32 segment softmax, same LN/FFN. q8 (decode_step_quant
    layer entry) switches the context_fc/FFN matmuls to int8."""
    B, G, E = x.shape
    groups = context_groups(cfg)
    by_index: dict[int, jax.Array] = {}
    attns = []
    for group, cat in zip(groups, cats):
        branches, attn = _attn_group(lp, cfg, x, group, cat, need_weights)
        for j, idx in enumerate(group):
            by_index[idx] = branches[:, j]
        attns.append(attn)
    ordered = [by_index[i] for i in range(len(cfg.contexts))]
    h = jnp.concatenate(ordered, axis=-1)                           # [B,G,ME]
    h = _step_lin(lp, q8, "context_fc", h)

    residual = h
    h = jax.nn.relu(_step_lin(lp, q8, "fc1", h))
    h = _step_lin(lp, q8, "fc2", h)
    h = layer_norm(lp["final_ln"], residual + h)
    return h, attns


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
                  k: int, vocab_table: jax.Array | None = None,
                  quant_sm: dict | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """Exact top-k next-token log-probs from step features [B, E] — the
    decode hot path (never materializes the [B, V] distribution).
    vocab_table: optional decode_vocab_table() — collapses the per-step
    head/tail chain into one matmul (see merged_decode_table).
    quant_sm: optional decode_softmax_quant() — int8 cluster matmuls."""
    return adaptive_top_k(params["adaptive_softmax"], params["embed"],
                          feats, cfg.full_cutoffs, k,
                          padding_idx=cfg.embed_padding_idx,
                          vocab_table=vocab_table, quant_sm=quant_sm)


def decode_softmax_quant(params: dict, cfg: DecoderConfig) -> dict | None:
    """int8 decode softmax tables (ops/adaptive.py::
    quantize_softmax_tables), computed once per generate/beam/engine call
    and closed over like the KV — active under TELL_TPU_DEC8_SM."""
    from ..ops.adaptive import dec8_sm_enabled, quantize_softmax_tables
    if not dec8_sm_enabled():
        return None
    return quantize_softmax_tables(params["adaptive_softmax"],
                                   params["embed"], cfg.full_cutoffs,
                                   padding_idx=cfg.embed_padding_idx)


def dec8_step_enabled() -> bool:
    """int8 decode-step projections — OPT-IN (TELL_TPU_DEC8=1): w8a8 for
    the per-step linear1/linear2/context_fc/fc1/fc2 chain. Measured
    round 5 (tools/dec8_ab.py, v5e-1): THROUGHPUT-NEUTRAL — 335.8 (solo)
    / 336.8 (with DEC8_SM) vs 334.7 captions/s — the decode step is
    bound by its serial dependent op chain (attention kernel at its DMA
    bound + sorts + per-op overhead), not by MXU matmul throughput, so
    halving matmul time moves nothing. Kept as a memory lever (halves
    ~120 MB/step of weight reads and the resident copies). Gated like
    every other decode-numerics lever."""
    from ..ops.kernels.dispatch import env_flag
    return env_flag("TELL_TPU_DEC8")


def decode_step_quant(params: dict, cfg: DecoderConfig) -> list | None:
    """Per-layer int8 tables for the decode-step projections, computed
    once per decode call (weight-norm materialized via gehring_weight,
    then per-out-channel int8). None when TELL_TPU_DEC8 is off."""
    if not dec8_step_enabled():
        return None
    from ..ops.linear import gehring_weight
    from ..ops.quant import quantize_weight_int8
    names = ("linear1", "linear2", "context_fc", "fc1", "fc2")
    out = []
    for lp in params["layers"]:
        layer = {}
        for n in names:
            q = quantize_weight_int8(gehring_weight(lp[n]))
            if "b" in lp[n]:
                q["b"] = jnp.asarray(lp[n]["b"], jnp.float32)
            layer[n] = q
        out.append(layer)
    return out


def _step_lin(lp: dict, q8: dict | None, name: str, x: jax.Array
              ) -> jax.Array:
    """Decode-step dense dispatch: int8 (precomputed decode_step_quant
    tables) or the exact gehring path."""
    if q8 is not None:
        from ..ops.quant import int8_linear
        return int8_linear(q8[name], x)
    return gehring_linear(lp[name], x)


def decode_vocab_table(params: dict, cfg: DecoderConfig,
                       dtype=None) -> jax.Array | None:
    """Merged [E, ~V] softmax matmul table for the decode loop — computed
    once per generate/beam call (closed over, like the KV), consumed by
    decoder_top_k(vocab_table=).

    OPT-IN (TELL_TPU_MERGED_VOCAB=1): collapsing the head/tail chain into
    one matmul measured SLOWER end-to-end on v5e-1 — 230.4 vs 261.9
    captions/s beam-5 B=128 — despite ~5 fewer dispatches and identical
    HBM bytes: the split chain lets XLA overlap each tail's MXU matmul
    with the previous cluster's VPU sort, and one serial
    [640, 1024]x[1024, 50267] matmul followed by three sorts leaves the
    MXU idle through the sort phase (same mechanism that keeps the fused
    top-k kernel opt-in, see adaptive_top_k). Default None = per-cluster
    chain.

    The table is kept fp32 regardless of the requested compute dtype: the
    default chain matmuls against param-dtype tables with fp32
    accumulation, and rounding the fp32-composed table (incl. the
    collapsed tail product P@T^T) to bf16 can flip near-tie top-k ids."""
    from ..ops.kernels.dispatch import env_flag
    del dtype  # always fp32; see docstring
    if not env_flag("TELL_TPU_MERGED_VOCAB"):
        return None
    return merged_decode_table(params["adaptive_softmax"], params["embed"],
                               cfg.full_cutoffs,
                               padding_idx=cfg.embed_padding_idx,
                               dtype=None)


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

    Conv state is a shifting window [R, K-1, C] rewritten each step (a
    one-slot-per-step time-slot ring alternative measured slower and was
    removed — ops/dynamic_conv.py's note).
    """
    R = batch * beam
    state = {
        "kv": precompute_context_kv_cat(params, cfg, contexts, beam=beam),
        # dense projected embedding table: one gather per decode step
        # instead of the banded gather+projection chain
        "embed_table": merged_embed_table(
            params["embed"], cfg.full_cutoffs, cfg.embed_dim,
            padding_idx=cfg.embed_padding_idx,
            scale_embeds=cfg.scale_embeds).astype(dtype),
        "step": jnp.zeros((), jnp.int32),
        "conv": [init_conv_state(R, cfg.conv_dim, k, dtype)
                 for k in cfg.kernel_sizes],
    }
    return state


# Negative finding (round 5, v5e-1): routing the beam-parent conv-state
# gather through the MXU as a [B, K, K] one-hot einsum (bit-exact, same
# bytes) measured 272.6 vs 334.7 captions/s at the flagship beam shape —
# the gather unit beats the einsum's extra reshape/materialization
# traffic decisively. The lever (TELL_TPU_ONEHOT_GATHER) was removed so
# decode carries exactly one gather path (same discipline as the round-4
# conv-ring deletion); git history has the implementation.


def decoder_step(params: dict, cfg: DecoderConfig, tokens: jax.Array,
                 state: dict, need_weights: bool = False,
                 row_gather: jax.Array | None = None,
                 quant: list | None = None
                 ) -> tuple[jax.Array, dict, list[dict]]:
    """One decode step. tokens: [B*beam] -> (features [B*beam, E], state',
    attns). beam is inferred from tokens vs KV row counts.

    Deterministic (no dropout) — decoding never trains.

    row_gather [B*beam] int32: beam parent indices applied to the conv
    ring buffers AT READ TIME (fused into the window concat) instead of a
    separate post-selection gather+rewrite — see beam_search_core's fused
    mode. KV is per-batch (shared by beams) and never needs gathering.

    quant: optional decode_step_quant() per-layer int8 tables for the
    projection/FFN matmuls (TELL_TPU_DEC8).
    """
    R = tokens.shape[0]
    B = state["kv"][0][0]["k"].shape[0]
    K = R // B
    tok_embed = jnp.take(state["embed_table"], tokens, axis=0)
    table = _positional_table(params, cfg)
    pos = sinusoidal_embed(table, tokens[:, None], cfg.pad_id,
                           state["step"])[:, 0]
    x = tok_embed + pos.astype(tok_embed.dtype)       # [R, E]
    new_conv = []
    all_attns = []
    for i, (lp, k) in enumerate(zip(params["layers"], cfg.kernel_sizes)):
        # conv block, single step (row-wise)
        residual = x
        h = _step_lin(lp, quant[i] if quant else None, "linear1", x)
        if cfg.glu:
            h = glu(h)
        step_fn = (dynamic_conv_step if cfg.conv_type == "dynamic"
                   else lightweight_conv_step)
        h, buf = step_fn(lp["conv"], h, state["conv"][i], kernel_size=k,
                         num_heads=cfg.num_heads,
                         weight_softmax=cfg.weight_softmax,
                         row_gather=row_gather)
        new_conv.append(buf)
        h = _step_lin(lp, quant[i] if quant else None, "linear2", h)
        h = layer_norm(lp["conv_ln"], residual + h)
        # attention + FFN on [B, beam, E] against shared per-batch KV —
        # all context branches in one stacked op chain (_attn_and_ffn_cat)
        h, attns = _attn_and_ffn_cat(lp, cfg, h.reshape(B, K, -1),
                                     state["kv"][i], need_weights,
                                     q8=quant[i] if quant else None)
        x = h.reshape(R, -1)
        all_attns.append(attns)
    if "final_ln" in params:
        x = layer_norm(params["final_ln"], x)
    new_state = {"conv": new_conv, "kv": state["kv"],
                 "embed_table": state["embed_table"],
                 "step": state["step"] + 1}
    return x, new_state, all_attns
