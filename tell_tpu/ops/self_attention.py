"""Gated self-attention and copy-attention scores for the pointer models.

Replaces the reference's fconv_self_att stack — SelfAttention
(/root/reference/tell/modules/attention/self_attention.py:10-73),
DownsampledMultiHeadAttention / SingleHeadAttention
(downsampled_multi_head.py:10-85, downsampled_single_head.py:12-244),
ScalarBias (scalar_bias.py:11-31) — and the score-only attention path
(multi_head.py:14-204) with batch-major jnp implementations.

Semantics preserved from the reference (all verified against the torch
code paths the pointer models actually exercise: project_input=False,
gated=True params exist but are dead, downsample=False):

* STRICT causal mask — a position never attends to itself, only to the
  past (`_mask_future_full` zeroes the diagonal too,
  downsampled_single_head.py:173-194).
* a scalar-bias column (score 0, value 0) is PREPENDED to the source
  axis after masking, so step 0 (which can see nothing) attends fully to
  the zero vector and outputs 0 (scalar_bias.py:30-31).
* the module output is LayerNorm(residual + attn) with an out-projection
  shared across heads (self_attention.py:39-65).

`copy_attention_scores` mirrors multi_head_attention_score_forward as the
pointer models call it: packed q/k in-projection, a learned bias-k column
and a zero column appended at the END of the source axis, fp32 softmax,
head-averaged probabilities returned (transformer_pointer.py:234-241).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import dropout, glu, init_layer_norm, layer_norm
from .linear import gehring_linear, init_gehring_linear


# ---------------------------------------------------------------------------
# GatedLinear (fconv_self_att): Linear->GLU->Linear->GLU->Linear
# ---------------------------------------------------------------------------

def init_gated_linear(rng: jax.Array, in_dim: int, out_dim: int,
                      bias: bool = True) -> dict:
    r1, r2, r3 = jax.random.split(rng, 3)
    return {
        "l1": init_gehring_linear(r1, in_dim, out_dim * 4, bias=bias),
        "l2": init_gehring_linear(r2, out_dim * 2, out_dim * 2, bias=bias),
        "l3": init_gehring_linear(r3, out_dim, out_dim, bias=bias),
    }


def gated_linear(params: dict, x: jax.Array) -> jax.Array:
    h = glu(gehring_linear(params["l1"], x))
    h = glu(gehring_linear(params["l2"], h))
    return gehring_linear(params["l3"], h)


# ---------------------------------------------------------------------------
# Gated strict-causal self-attention (the pointer models' entity head)
# ---------------------------------------------------------------------------

def init_self_attention(rng: jax.Array, dim: int) -> dict:
    """SelfAttention(out_channels=dim, embed_dim=dim, num_heads, gated=True,
    downsample=False). The reference also allocates gated in-projections
    inside SingleHeadAttention, but with project_input=False they are never
    applied (downsampled_single_head.py:91-99) — we do not create dead
    params."""
    rq, rk, rv, ro = jax.random.split(rng, 4)
    return {
        "in_proj_q": init_gehring_linear(rq, dim, dim),
        "in_proj_k": init_gehring_linear(rk, dim, dim),
        "in_proj_v": init_gehring_linear(rv, dim, dim),
        "out_proj": init_gehring_linear(ro, dim, dim),
        "ln": init_layer_norm(dim),
    }


def _attend_strict_causal(q: jax.Array, k: jax.Array, v: jax.Array,
                          num_heads: int,
                          q_offset: jax.Array | int,
                          kv_valid: jax.Array | None = None) -> jax.Array:
    """Multi-head attention with STRICT causality and a prepended zero
    (scalar-bias) column. q: [B,T,E] at absolute positions q_offset+t;
    k/v: [B,S,E] at absolute positions 0..S-1. kv_valid: [B,S] optional
    mask of real (non-future, non-garbage) key rows."""
    B, T, E = q.shape
    S = k.shape[1]
    H = num_heads
    hd = E // H
    qh = (q * hd ** -0.5).reshape(B, T, H, hd)
    kh = k.reshape(B, S, H, hd)
    vh = v.reshape(B, S, H, hd)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh,
                        preferred_element_type=jnp.float32)
    tpos = jnp.arange(T)[:, None] + q_offset
    spos = jnp.arange(S)[None, :]
    allowed = spos < tpos  # strictly the past: s < t
    scores = jnp.where(allowed[None, None], scores, -jnp.inf)
    if kv_valid is not None:
        scores = jnp.where(kv_valid[:, None, None, :], scores, -jnp.inf)
    # prepend the scalar-bias column (score 0, value 0)
    scores = jnp.concatenate(
        [jnp.zeros((B, H, T, 1), scores.dtype), scores], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs[..., 1:].astype(q.dtype), vh,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, E).astype(q.dtype)


def self_attention(params: dict, x: jax.Array, num_heads: int = 16,
                   q_offset: jax.Array | int = 0,
                   kv: jax.Array | None = None,
                   kv_valid: jax.Array | None = None) -> jax.Array:
    """x: [B, T, E] -> LayerNorm(x + out_proj(strict_causal_attn)).

    For incremental decode pass the full feature history as `kv` (with
    `kv_valid` marking filled rows) and the current step's features as `x`
    with its absolute `q_offset` — equivalent to the reference's grow-only
    key/value history (self_attention.py:48-56)."""
    src = x if kv is None else kv
    q = gehring_linear(params["in_proj_q"], x)
    k = gehring_linear(params["in_proj_k"], src)
    v = gehring_linear(params["in_proj_v"], src)
    attn = _attend_strict_causal(q, k, v, num_heads, q_offset, kv_valid)
    attn = gehring_linear(params["out_proj"], attn)
    return layer_norm(params["ln"], x + attn)


# ---------------------------------------------------------------------------
# Copy-attention scores (pointer models)
# ---------------------------------------------------------------------------

def init_copy_attention(rng: jax.Array, dim: int,
                        kdim: int | None = None) -> dict:
    """q/k in-projections + bias, learned bias_k column
    (transformer_pointer.py:81-88: xavier-uniform packed in_proj [2E, E],
    zero bias, xavier-normal bias_k). Stored unpacked, [in, out] row-major;
    kdim defaults to dim (the reference's article features are 1024 = E)."""
    kdim = dim if kdim is None else kdim
    r_q, r_k, r_bk = jax.random.split(rng, 3)
    bound = (6.0 / (2 * dim + dim)) ** 0.5  # xavier on the packed [2E, E]
    std = (2.0 / (1 + dim)) ** 0.5
    return {
        "q_w": jax.random.uniform(r_q, (dim, dim), jnp.float32,
                                  -bound, bound),
        "k_w": jax.random.uniform(r_k, (kdim, dim), jnp.float32,
                                  -bound, bound),
        "q_b": jnp.zeros((dim,), jnp.float32),
        "k_b": jnp.zeros((dim,), jnp.float32),
        "bias_k": jax.random.normal(r_bk, (dim,), jnp.float32) * std,
    }


def copy_attention_scores(params: dict, query: jax.Array, key: jax.Array,
                          key_padding_mask: jax.Array | None = None,
                          num_heads: int = 16,
                          drop_rate: float = 0.0,
                          rng: jax.Array | None = None,
                          deterministic: bool = True) -> jax.Array:
    """Head-averaged attention probabilities of caption positions over
    article positions. query: [B, L, E], key: [B, S, E] ->
    probs [B, L, S+2] (bias-k column at S, zero-attn column at S+1 —
    callers slice [..., :-2], transformer_pointer.py:241-243)."""
    B, L, E = query.shape
    S = key.shape[1]
    H = num_heads
    hd = E // H
    q = query @ params["q_w"].astype(query.dtype) \
        + params["q_b"].astype(query.dtype)
    k = key @ params["k_w"].astype(key.dtype) \
        + params["k_b"].astype(key.dtype)
    q = q * hd ** -0.5
    bias_k = jnp.broadcast_to(params["bias_k"].astype(k.dtype), (B, 1, E))
    zero_k = jnp.zeros((B, 1, E), k.dtype)
    k = jnp.concatenate([k, bias_k, zero_k], axis=1)  # [B, S+2, E]
    qh = q.reshape(B, L, H, hd)
    kh = k.reshape(B, S + 2, H, hd)
    scores = jnp.einsum("blhd,bshd->bhls", qh, kh,
                        preferred_element_type=jnp.float32)
    if key_padding_mask is not None:
        pad = jnp.concatenate(
            [key_padding_mask, jnp.zeros((B, 2), bool)], axis=1)
        scores = jnp.where(pad[:, None, None, :], -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    probs = dropout(probs, drop_rate, rng, deterministic)
    return jnp.mean(probs, axis=1)  # [B, L, S+2]
