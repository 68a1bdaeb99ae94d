"""Batched beam search, fully inside one jitted program.

The reference ships only top-k sampling (k=1 in every config;
transformer_faces_objects.py:399-494) — beam decode is part of this
framework's serving target (BASELINE.json: beam=5 throughput). Design:

* contexts' static KV are precomputed once per batch element and tiled over
  beams (no per-step recompute, no reorder — KV is beam-invariant),
* per-beam conv ring buffers and token paths are gathered by parent index
  each step (the only state that needs reordering),
* finished beams are kept in the beam with a forced <pad> continuation at
  log-prob 0, which makes the whole search fixed-shape: a finished
  hypothesis simply persists with a frozen score,
* step 0 starts with scores [0, -inf, ...] so identical initial beams don't
  duplicate,
* final ranking optionally applies GNMT-style length normalization.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from .captioner import build_contexts
from .decoder import decoder_step, decoder_top_k, init_decode_state


def beam_search(params: dict, cfg: CaptionerConfig, batch: dict,
                beam_size: int = 5, length_penalty: float = 0.0) -> dict:
    """Returns {"token_ids": [B, beam, gen_len+1] sorted best-first,
    "scores": [B, beam] (length-normalized when length_penalty > 0)}."""
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    K = beam_size

    state = init_decode_state(params["decoder"], dcfg, contexts, B,
                              beam=K, dtype=feat0.dtype)
    kv = state.pop("kv")  # constant during decode: closed over, not carried
    embed_table = state.pop("embed_table")

    tokens = jnp.full((B, K), dcfg.bos_id, jnp.int32)
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32),
                      (B, 1))
    finished = jnp.zeros((B, K), bool)
    lengths = jnp.ones((B, K), jnp.int32)  # emitted tokens incl. EOS
    paths0 = jnp.full((B, K, cfg.gen_len + 1), dcfg.pad_id, jnp.int32)
    paths0 = paths0.at[:, :, 0].set(dcfg.bos_id)

    def step(carry, t):
        tokens, scores, finished, lengths, paths, dyn = carry
        feats, new_state, _ = decoder_step(
            params["decoder"], dcfg, tokens.reshape(B * K),
            {**dyn, "kv": kv, "embed_table": embed_table})
        new_state = {k: v for k, v in new_state.items()
                     if k not in ("kv", "embed_table")}
        # Exact per-beam top-K candidates: the global top-K over beams x V
        # can only contain tokens in some beam's own top-K, so the [B, K*V]
        # search collapses to [B, K*K] without approximation.
        cand_lp, cand_ids = decoder_top_k(params["decoder"], dcfg, feats, K)
        cand_lp = cand_lp.reshape(B, K, K)
        cand_ids = cand_ids.reshape(B, K, K)

        # finished beams: single <pad> continuation at no cost
        fin_lp = jnp.full((K,), -jnp.inf).at[0].set(0.0)
        cand_lp = jnp.where(finished[:, :, None], fin_lp[None, None, :],
                            cand_lp)
        cand_ids = jnp.where(finished[:, :, None], dcfg.pad_id, cand_ids)

        total = scores[:, :, None] + cand_lp                # [B, K, K]
        top_scores, top_flat = jax.lax.top_k(total.reshape(B, K * K), K)
        parent = top_flat // K                              # [B, K]
        tok = jnp.take_along_axis(cand_ids.reshape(B, K * K), top_flat,
                                  axis=-1).astype(jnp.int32)

        # gather per-beam state by parent
        def g(x):  # [B, K, ...] gather on beam axis
            return jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)
        new_finished = g(finished) | (tok == dcfg.eos_id)
        was_finished = g(finished)
        new_lengths = g(lengths) + (~was_finished).astype(jnp.int32)
        new_paths = g(paths)
        new_paths = new_paths.at[:, :, t + 1].set(
            jnp.where(was_finished, dcfg.pad_id, tok))

        # conv buffers: [B*K, ...] gather via flattened indices
        flat_parent = (parent
                       + jnp.arange(B)[:, None] * K).reshape(B * K)
        new_state["conv"] = [jnp.take(buf, flat_parent, axis=0)
                             for buf in new_state["conv"]]

        tok = jnp.where(was_finished, dcfg.pad_id, tok)
        return (tok, top_scores, new_finished, new_lengths, new_paths,
                new_state), None

    carry = (tokens, scores, finished, lengths, paths0, state)
    (tokens, scores, finished, lengths, paths, _), _ = jax.lax.scan(
        step, carry, jnp.arange(cfg.gen_len))

    if length_penalty > 0:
        norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
        ranked = scores / norm
    else:
        ranked = scores
    order = jnp.argsort(-ranked, axis=1)
    return {
        "token_ids": jnp.take_along_axis(paths, order[:, :, None], axis=1),
        "scores": jnp.take_along_axis(ranked, order, axis=1),
        "finished": jnp.take_along_axis(finished, order, axis=1),
    }
