"""Multi-head cross-attention over context modalities.

Replaces the reference's fairseq-style MultiHeadAttention
(/root/reference/tell/modules/attention/multi_head.py:207-552) with a
batch-major, einsum-based implementation:

* separate K/V projections sized to each modality (image 2048, article 1024,
  faces 512, objects 2048 — decoder layer wiring at
  /root/reference/tell/models/decoder_faces_objects.py:224-246),
* a learned bias column and a zero column are appended to K/V
  (`add_bias_kv` / `add_zero_attn`, both on by default in the reference), so
  the decoder can attend to "nothing",
* `precompute_kv` implements the reference's `static_kv=True` semantics
  (multi_head.py:382-403): context K/V are projected once per sequence and
  reused for every decode step — they live in the decode-state pytree,
* softmax in fp32; attention weights optionally returned averaged over heads
  (multi_head.py:478-484) for the demo's attention visualization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import dropout
from .linear import init_linear, linear


def init_cross_attention(rng: jax.Array, embed_dim: int, num_heads: int,
                         kdim: int | None = None, vdim: int | None = None,
                         bias: bool = True, add_bias_kv: bool = True,
                         add_zero_attn: bool = True) -> dict:
    kdim = embed_dim if kdim is None else kdim
    vdim = embed_dim if vdim is None else vdim
    rq, rk, rv, ro, rbk, rbv = jax.random.split(rng, 6)
    p = {
        "q_proj": init_linear(rq, embed_dim, embed_dim, bias=bias),
        "k_proj": init_linear(rk, kdim, embed_dim, bias=bias),
        "v_proj": init_linear(rv, vdim, embed_dim, bias=bias),
        "out_proj": init_linear(ro, embed_dim, embed_dim, bias=bias),
    }
    if add_bias_kv:
        std = (2.0 / (1 + embed_dim)) ** 0.5  # xavier-normal on [1,1,E]
        p["bias_k"] = jax.random.normal(rbk, (embed_dim,), jnp.float32) * std
        p["bias_v"] = jax.random.normal(rbv, (embed_dim,), jnp.float32) * std
    return p


def precompute_kv(params: dict, key: jax.Array,
                  key_padding_mask: jax.Array | None,
                  add_zero_attn: bool = True
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Project a context once; append bias and zero KV columns.

    key: [B, S, Dk]; key_padding_mask: [B, S] with True = padding.
    Returns (k, v, mask) with S' = S (+1 bias) (+1 zero) columns,
    k/v: [B, S', E], mask: [B, S'] True = masked out.
    """
    B, S, _ = key.shape
    k = linear(params["k_proj"], key)
    v = linear(params["v_proj"], key)
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((B, S), bool)
    cols = [k]
    vols = [v]
    masks = [key_padding_mask]
    if "bias_k" in params:
        cols.append(jnp.broadcast_to(params["bias_k"].astype(k.dtype),
                                     (B, 1, k.shape[-1])))
        vols.append(jnp.broadcast_to(params["bias_v"].astype(v.dtype),
                                     (B, 1, v.shape[-1])))
        masks.append(jnp.zeros((B, 1), bool))
    if add_zero_attn:
        cols.append(jnp.zeros((B, 1, k.shape[-1]), k.dtype))
        vols.append(jnp.zeros((B, 1, v.shape[-1]), v.dtype))
        masks.append(jnp.zeros((B, 1), bool))
    return (jnp.concatenate(cols, axis=1), jnp.concatenate(vols, axis=1),
            jnp.concatenate(masks, axis=1))


def cross_attention_with_kv(params: dict, query: jax.Array, k: jax.Array,
                            v: jax.Array, mask: jax.Array, *, num_heads: int,
                            attn_dropout: float = 0.0,
                            rng: jax.Array | None = None,
                            deterministic: bool = True,
                            need_weights: bool = False
                            ) -> tuple[jax.Array, jax.Array | None]:
    """Attention against precomputed K/V (the static-KV decode fast path).

    query: [B, T, E]; k, v: [B, S', E]; mask: [B, S'] True = masked.
    """
    B, T, E = query.shape
    H = num_heads
    hd = E // H
    q = linear(params["q_proj"], query) * (hd ** -0.5)
    qh = q.reshape(B, T, H, hd)
    kh = k.reshape(B, -1, H, hd)
    vh = v.reshape(B, -1, H, hd)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(mask[:, None, None, :], -jnp.inf, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    probs_d = dropout(probs, attn_dropout, rng, deterministic)
    out = jnp.einsum("bhts,bshd->bthd", probs_d.astype(query.dtype), vh,
                     preferred_element_type=jnp.float32)
    out = linear(params["out_proj"], out.reshape(B, T, E).astype(query.dtype))
    attn = jnp.mean(probs, axis=1) if need_weights else None  # [B, T, S']
    return out, attn


def cross_attention(params: dict, query: jax.Array, key: jax.Array,
                    key_padding_mask: jax.Array | None, *, num_heads: int,
                    attn_dropout: float = 0.0, rng: jax.Array | None = None,
                    deterministic: bool = True, need_weights: bool = False,
                    add_zero_attn: bool = True
                    ) -> tuple[jax.Array, jax.Array | None]:
    """Full cross-attention: project context K/V then attend."""
    k, v, mask = precompute_kv(params, key, key_padding_mask, add_zero_attn)
    return cross_attention_with_kv(
        params, query, k, v, mask, num_heads=num_heads,
        attn_dropout=attn_dropout, rng=rng, deterministic=deterministic,
        need_weights=need_weights)
