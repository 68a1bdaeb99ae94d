"""Sequence-parallel article encoding (the long-context scale-out path).

The reference CAPS articles at 512 BPE tokens (roberta_indexer.py:99-101)
because one GPU must hold the full self-attention; it has no sequence
parallelism of any kind (SURVEY.md §5). Here the RoBERTa article encoder
can shard the SEQUENCE axis across mesh devices, Ulysses-style
(arXiv:2309.14509): Q/K/V are projected on local sequence shards, one
`all_to_all` re-shards heads<->sequence so every device runs full-sequence
attention for a head subset, and a second `all_to_all` restores
sequence sharding for the (local) FFN. Memory per device scales as
S/P for activations and H/P for attention — articles far beyond 512
tokens fit by adding chips along the mesh axis.

Positions still come from RoBERTa's learned 514-entry table, so S is
capped at max_positions - 2 per pass (asserted below — silently clamped
position ids would degrade every token past 512). For longer articles use
`roberta_encode_windowed` (positions restart per window); sequence
parallelism here buys per-device MEMORY headroom (activations scale S/P,
heads H/P), not longer position coverage.

Exact-parity tested against the single-device encoder on the 8-device CPU
mesh (tests/test_sequence_parallel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.backbones.roberta import RobertaConfig, _apply_ln, _lin


def _attention_ulysses(lp: dict, x: jax.Array, neg: jax.Array,
                       cfg: RobertaConfig, axis: str) -> jax.Array:
    """One self-attention block on a sequence shard.

    x: [B, S_loc, D] (S sharded over `axis`); neg: [B, 1, 1, S_full]
    additive pad mask (replicated). Returns [B, S_loc, D]."""
    B, S_loc, D = x.shape
    H = cfg.num_heads
    hd = D // H
    q = _lin(lp["q"], x).reshape(B, S_loc, H, hd)
    k = _lin(lp["k"], x).reshape(B, S_loc, H, hd)
    v = _lin(lp["v"], x).reshape(B, S_loc, H, hd)
    # heads -> devices, sequence -> full: [B, S_full, H/P, hd]
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis,
                            split_axis=2, concat_axis=1, tiled=True)
    q, k, v = a2a(q), a2a(k), a2a(v)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5) + neg
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    # sequence -> shards, heads -> full: [B, S_loc, H, hd]
    o = jax.lax.all_to_all(o, axis, split_axis=1, concat_axis=2, tiled=True)
    return _lin(lp["attn_out"], o.reshape(B, S_loc, D))


def roberta_encode_seq_parallel(params: dict, cfg: RobertaConfig,
                                ids: jax.Array, mesh: Mesh,
                                seq_axis: str = "model",
                                return_all_hiddens: bool = True) -> jax.Array:
    """Drop-in equivalent of roberta_encode with S sharded over `seq_axis`.

    ids: [B, S], S divisible by mesh.shape[seq_axis]. Output sharding:
    [B, S, (L+1,) D] with S on `seq_axis` (batch stays on "data" when the
    caller shards it there)."""
    from jax import shard_map

    B, S = ids.shape
    P_seq = mesh.shape[seq_axis]
    assert S % P_seq == 0, f"S={S} not divisible by {P_seq}"
    assert cfg.num_heads % P_seq == 0, \
        (f"Ulysses SP needs heads ({cfg.num_heads}) divisible by the "
         f"sequence-axis size ({P_seq})")
    if S > cfg.max_positions - 2:
        raise ValueError(
            f"S={S} exceeds the position table ({cfg.max_positions - 2} "
            f"usable rows) — position ids would silently clamp and degrade "
            f"every token past the table; use roberta_encode_windowed for "
            f"long articles (SP buys per-device memory, not positions)")
    mask = ids != cfg.pad_id
    positions = jnp.where(
        mask, jnp.cumsum(mask.astype(jnp.int32), axis=1) + cfg.pad_id,
        cfg.pad_id)

    def body(params, ids_loc, pos_loc, mask_full):
        x = (jnp.take(params["word_embed"], ids_loc, axis=0)
             + jnp.take(params["pos_embed"], pos_loc, axis=0)
             + params["type_embed"][0])
        x = _apply_ln(params["embed_ln"], x, cfg.ln_eps)
        neg = jnp.where(mask_full, 0.0, -1e9)[:, None, None, :]
        hiddens = [x]
        for lp in params["layers"]:
            o = _attention_ulysses(lp, x, neg, cfg, seq_axis)
            x = _apply_ln(lp["attn_ln"], x + o, cfg.ln_eps)
            h = jax.nn.gelu(_lin(lp["fc1"], x).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
            h = _lin(lp["fc2"], h)
            x = _apply_ln(lp["ffn_ln"], x + h, cfg.ln_eps)
            hiddens.append(x)
        if return_all_hiddens:
            return jnp.stack(hiddens, axis=2)     # [B, S_loc, L+1, D]
        return x

    out_spec = (P(None, seq_axis, None, None) if return_all_hiddens
                else P(None, seq_axis, None))
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, seq_axis), P(None, seq_axis), P()),
        out_specs=out_spec,
        check_vma=False)
    return fn(params, ids, positions, mask)
