"""Ring-attention context parallelism for the article encoder.

The second long-context scale-out path, complementing Ulysses sequence
parallelism (`parallel/sequence.py`). Both shard the article's sequence
axis over mesh devices; they differ in how full-sequence attention is
recovered:

- Ulysses re-shards heads<->sequence with two `all_to_all`s, so every
  device needs `num_heads % P == 0` and the collective is global.
- Ring attention (arXiv:2310.01889) keeps queries local and ROTATES the
  K/V blocks around the ring with neighbor `ppermute`s, accumulating an
  online softmax (running max / normalizer / output) per query row —
  exactly the flash-attention recurrence, distributed. No constraint on
  the head count, and each hop is a fixed-size neighbor transfer that XLA
  can overlap with the block's matmuls, riding ICI neighbor links instead
  of an all-to-all.

Per-device memory scales as S/P for activations and K/V (only one ring
block is resident per step). The reference has no sequence/context
parallelism of any kind — it hard-caps articles at 512 BPE tokens
(/root/reference/tell/data/token_indexers/roberta_indexer.py:99-101,
SURVEY.md §5).

Exact-parity (fwd + grad) tested against the single-device encoder on the
8-device CPU mesh, including a head count NOT divisible by the mesh axis
(tests/test_ring_parallel.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.backbones.roberta import RobertaConfig, _apply_ln, _lin


def _attention_ring(lp: dict, x: jax.Array, pad_neg: jax.Array,
                    cfg: RobertaConfig, axis: str, n_shards: int
                    ) -> jax.Array:
    """One self-attention block with ring-rotated K/V.

    x: [B, S_loc, D] (S sharded over `axis`); pad_neg: [B, S_full]
    additive pad mask (0 / -1e9, replicated). Returns [B, S_loc, D].

    The loop is unrolled over the (static, small) ring size so XLA can
    software-pipeline each hop's `ppermute` against the previous block's
    matmul + softmax update.
    """
    B, S_loc, D = x.shape
    H = cfg.num_heads
    hd = D // H
    q = _lin(lp["q"], x).reshape(B, S_loc, H, hd).transpose(0, 2, 1, 3)
    k = _lin(lp["k"], x).reshape(B, S_loc, H, hd).transpose(0, 2, 1, 3)
    v = _lin(lp["v"], x).reshape(B, S_loc, H, hd).transpose(0, 2, 1, 3)
    scale = hd ** -0.5
    idx = jax.lax.axis_index(axis)
    # online-softmax carry (fp32): running max, normalizer, output accum
    m = jnp.full((B, H, S_loc), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, S_loc), jnp.float32)
    acc = jnp.zeros((B, H, S_loc, hd), jnp.float32)
    perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
    for step in range(n_shards):
        # after `step` rotations device d holds the K/V block that
        # originated on device (d - step) mod P — slice its pad-mask block
        src = (idx - step) % n_shards
        neg = jax.lax.dynamic_slice_in_dim(pad_neg, src * S_loc, S_loc,
                                           axis=1)              # [B, S_loc]
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores * scale + neg[:, None, None, :]
        m_new = jnp.maximum(m, scores.max(axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        corr = jnp.exp(m - m_new)  # exp(-inf)=0 retires the empty init
        l = l * corr + p.sum(axis=-1)
        acc = (acc * corr[..., None]
               + jnp.einsum("bhts,bhsd->bhtd", p.astype(x.dtype), v,
                            preferred_element_type=jnp.float32))
        m = m_new
        if step + 1 < n_shards:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
    o = (acc / l[..., None]).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, S_loc, D)
    return _lin(lp["attn_out"], o)


def roberta_encode_ring(params: dict, cfg: RobertaConfig, ids: jax.Array,
                        mesh: Mesh, seq_axis: str = "model",
                        return_all_hiddens: bool = True) -> jax.Array:
    """Drop-in equivalent of roberta_encode with S ring-sharded over
    `seq_axis` (context parallelism).

    ids: [B, S], S divisible by mesh.shape[seq_axis]; unlike Ulysses the
    head count need NOT divide the axis. Output sharding: [B, S, (L+1,) D]
    with S on `seq_axis` (batch stays on "data" when the caller shards it
    there)."""
    from jax import shard_map

    B, S = ids.shape
    n_shards = mesh.shape[seq_axis]
    assert S % n_shards == 0, f"S={S} not divisible by {n_shards}"
    if S > cfg.max_positions - 2:
        raise ValueError(
            f"S={S} exceeds the position table ({cfg.max_positions - 2} "
            f"usable rows) — position ids would silently clamp and degrade "
            f"every token past the table; use roberta_encode_windowed for "
            f"long articles (CP buys per-device memory, not positions)")
    mask = ids != cfg.pad_id
    positions = jnp.where(
        mask, jnp.cumsum(mask.astype(jnp.int32), axis=1) + cfg.pad_id,
        cfg.pad_id)

    def body(params, ids_loc, pos_loc, mask_full):
        x = (jnp.take(params["word_embed"], ids_loc, axis=0)
             + jnp.take(params["pos_embed"], pos_loc, axis=0)
             + params["type_embed"][0])
        x = _apply_ln(params["embed_ln"], x, cfg.ln_eps)
        pad_neg = jnp.where(mask_full, 0.0, -1e9)          # [B, S_full]
        hiddens = [x]
        for lp in params["layers"]:
            o = _attention_ring(lp, x, pad_neg, cfg, seq_axis, n_shards)
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
