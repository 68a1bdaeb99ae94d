"""Batched beam search, fully inside one jitted program.

The reference ships only top-k sampling (k=1 in every config;
transformer_faces_objects.py:399-494) — beam decode is part of this
framework's serving target (BASELINE.json: beam=5 throughput). Design:

* contexts' static KV are precomputed once per batch element and tiled over
  beams (no per-step recompute, no reorder — KV is beam-invariant),
* per-beam decode state (conv ring buffers / self-attention caches) and
  token paths are gathered by parent index each step (the only state that
  needs reordering),
* finished beams are kept in the beam with a forced <pad> continuation at
  log-prob 0, which makes the whole search fixed-shape: a finished
  hypothesis simply persists with a frozen score,
* step 0 starts with scores [0, -inf, ...] so identical initial beams don't
  duplicate,
* final ranking optionally applies GNMT-style length normalization.

`beam_search_core` is model-agnostic (the dynamic-conv captioner and the
modern LLM decoder plug in via step/reorder callbacks); `beam_search` is
the flagship-captioner entry used by bench/serving/evaluate.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..config import CaptionerConfig
from ..ops.kernels.dispatch import env_flag
from .captioner import build_contexts
from .decoder import (decode_softmax_quant, decode_step_quant,
                      decode_vocab_table, decoder_step, decoder_top_k,
                      init_decode_state)


def _env_backtrack() -> bool:
    """Parent-pointer path bookkeeping (reconstruct token paths once after
    the loop) instead of re-gathering the [B, K, T+1] path buffer through
    the parent permutation every step. Exact — same outputs either way
    (pinned by tests); TELL_TPU_BEAM_BACKTRACK=0 restores the in-loop
    path gather."""
    return env_flag("TELL_TPU_BEAM_BACKTRACK", default=True)


def beam_search_core(step_fn: Callable, reorder_fn: Callable, state0,
                     B: int, K: int, gen_len: int,
                     bos_id: int, eos_id: int, pad_id: int,
                     length_penalty: float = 0.0,
                     early_stop: bool = True,
                     finished0: "jax.Array | None" = None,
                     fused_reorder: bool = False) -> dict:
    """Model-agnostic fixed-shape beam search.

    step_fn(tokens [B*K] int32, state) -> (cand_lp [B*K, K] fp32 per-beam
        top-K next-token log-probs, cand_ids [B*K, K] int32, new_state);
    reorder_fn(state, flat_parent [B*K] int32) -> state gathered by parent
        (only the per-row carried state: conv buffers, self-KV caches).

    fused_reorder: step_fn instead takes (tokens, state, row_gather) and
        applies the PREVIOUS step's parent permutation while READING its
        per-row state (e.g. the conv window concat), so the carried state
        is never re-gathered by a separate pass between steps. Exact;
        measured perf-neutral on v5e (the gather materializes inside
        the step instead — an identity-reorder ablation bounds the
        reorder cost at ~0.34 ms/step, not yet reclaimed).
        reorder_fn is unused in this mode.

    Returns {"token_ids": [B, K, gen_len+1] sorted best-first,
    "scores": [B, K] (length-normalized when length_penalty > 0),
    "finished": [B, K]}.

    early_stop: run the loop as a while_loop that exits once every beam of
    every row has emitted EOS. Exact: a finished beam's only candidate is
    a zero-cost <pad> continuation, so further steps permute nothing the
    final argsort does not already order. bench.py passes False (its
    contract is conservative full-length decode).

    finished0 [B] bool: rows to treat as finished from step 0 (shape-pad
    filler rows in serving) so the early exit tracks real requests only.
    """
    tokens = jnp.full((B, K), bos_id, jnp.int32)
    scores = jnp.tile(jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32),
                      (B, 1))
    finished = (jnp.zeros((B, K), bool) if finished0 is None
                else jnp.broadcast_to(finished0[:, None], (B, K)))
    lengths = jnp.zeros((B, K), jnp.int32)  # emitted tokens incl. EOS
    backtrack = _env_backtrack()
    if backtrack:
        # Parent-pointer bookkeeping: the loop records only (parent, tok)
        # [B, K] per step; full paths are reconstructed ONCE after the loop
        # by backtracking the ancestry (standard beam-search trick). The
        # alternative below re-gathers and rewrites the whole [B, K, T+1]
        # path buffer through the parent permutation every step.
        # Init: identity parents + <pad> tokens, so steps never executed
        # (early_stop exit) backtrack as a no-op pad continuation —
        # identical to the path buffer's untouched tail.
        parents_buf0 = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, None, :], (gen_len, B, K))
        toks_buf0 = jnp.full((gen_len, B, K), pad_id, jnp.int32)
        paths0 = (parents_buf0, toks_buf0)
    else:
        paths0 = jnp.full((B, K, gen_len + 1), pad_id, jnp.int32)
        paths0 = paths0.at[:, :, 0].set(bos_id)

    parent0 = jnp.arange(B * K, dtype=jnp.int32)

    def step(carry, t):
        tokens, scores, finished, lengths, paths, dyn, prev_parent = carry
        # Exact per-beam top-K candidates: the global top-K over beams x V
        # can only contain tokens in some beam's own top-K, so the [B, K*V]
        # search collapses to [B, K*K] without approximation.
        if fused_reorder:
            cand_lp, cand_ids, new_state = step_fn(tokens.reshape(B * K),
                                                   dyn, prev_parent)
        else:
            cand_lp, cand_ids, new_state = step_fn(tokens.reshape(B * K),
                                                   dyn)
        cand_lp = cand_lp.reshape(B, K, K)
        cand_ids = cand_ids.reshape(B, K, K)

        # finished beams: single <pad> continuation at no cost
        fin_lp = jnp.full((K,), -jnp.inf).at[0].set(0.0)
        cand_lp = jnp.where(finished[:, :, None], fin_lp[None, None, :],
                            cand_lp)
        cand_ids = jnp.where(finished[:, :, None], pad_id, cand_ids)

        total = scores[:, :, None] + cand_lp                # [B, K, K]
        top_scores, top_flat = jax.lax.top_k(total.reshape(B, K * K), K)
        parent = top_flat // K                              # [B, K]
        tok = jnp.take_along_axis(cand_ids.reshape(B, K * K), top_flat,
                                  axis=-1).astype(jnp.int32)

        # gather per-beam bookkeeping by parent
        def g(x):  # [B, K, ...] gather on beam axis
            return jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)
        new_finished = g(finished) | (tok == eos_id)
        was_finished = g(finished)
        new_lengths = g(lengths) + (~was_finished).astype(jnp.int32)
        tok = jnp.where(was_finished, pad_id, tok)
        if backtrack:
            parents_buf, toks_buf = paths
            new_paths = (
                jax.lax.dynamic_update_index_in_dim(parents_buf, parent,
                                                    t, 0),
                jax.lax.dynamic_update_index_in_dim(toks_buf, tok, t, 0))
        else:
            new_paths = g(paths)
            new_paths = new_paths.at[:, :, t + 1].set(tok)

        # per-row model state: [B*K, ...] gather via flattened indices
        flat_parent = (parent
                       + jnp.arange(B)[:, None] * K).reshape(B * K)
        if not fused_reorder:
            new_state = reorder_fn(new_state, flat_parent)

        return (tok, top_scores, new_finished, new_lengths, new_paths,
                new_state, flat_parent), None

    carry = (tokens, scores, finished, lengths, paths0, state0, parent0)
    if early_stop:
        def w_cond(c):
            t, carry = c
            return (t < gen_len) & ~jnp.all(carry[2])

        def w_body(c):
            t, carry = c
            carry, _ = step(carry, t)
            return (t + 1, carry)

        _, (tokens, scores, finished, lengths, paths, _, _) = \
            jax.lax.while_loop(w_cond, w_body, (0, carry))
    else:
        (tokens, scores, finished, lengths, paths, _, _), _ = jax.lax.scan(
            step, carry, jnp.arange(gen_len))

    if length_penalty > 0:
        norm = ((5.0 + lengths.astype(jnp.float32)) / 6.0) ** length_penalty
        ranked = scores / norm
    else:
        ranked = scores
    order = jnp.argsort(-ranked, axis=1).astype(jnp.int32)
    if backtrack:
        parents_buf, toks_buf = paths

        def bstep(idx, pt):
            par_t, tok_t = pt                      # [B, K] at one step
            tok = jnp.take_along_axis(tok_t, idx, axis=1)
            return jnp.take_along_axis(par_t, idx, axis=1), tok

        # reverse scan: ancestry indices flow T-1 -> 0; ys stack in
        # forward time order. Seeding idx with `order` reconstructs the
        # paths directly best-first, so no final path gather is needed.
        _, toks_fwd = jax.lax.scan(bstep, order, (parents_buf, toks_buf),
                                   reverse=True)
        token_ids = jnp.concatenate(
            [jnp.full((B, K, 1), bos_id, jnp.int32),
             jnp.moveaxis(toks_fwd, 0, 2)], axis=2)
    else:
        token_ids = jnp.take_along_axis(paths, order[:, :, None], axis=1)
    return {
        "token_ids": token_ids,
        "scores": jnp.take_along_axis(ranked, order, axis=1),
        "finished": jnp.take_along_axis(finished, order, axis=1),
    }


def beam_search(params: dict, cfg: CaptionerConfig, batch: dict,
                beam_size: int = 5, length_penalty: float = 0.0,
                early_stop: bool = True) -> dict:
    """Flagship-captioner beam decode (see beam_search_core). A `row_live`
    bool vector in the batch marks shape-pad filler rows as pre-finished."""
    dcfg = cfg.decoder
    contexts = build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    K = beam_size

    state = init_decode_state(params["decoder"], dcfg, contexts, B,
                              beam=K, dtype=feat0.dtype)
    kv = state.pop("kv")  # constant during decode: closed over, not carried
    embed_table = state.pop("embed_table")
    vocab_table = decode_vocab_table(params["decoder"], dcfg, feat0.dtype)
    quant_sm = decode_softmax_quant(params["decoder"], dcfg)
    step_quant = decode_step_quant(params["decoder"], dcfg)

    def step_fn(tokens, dyn, row_gather):
        # fused reorder: the previous step's parent permutation rides the
        # conv-window read inside decoder_step instead of a post-selection
        # gather+rewrite of the ring buffers
        feats, new_state, _ = decoder_step(
            params["decoder"], dcfg, tokens,
            {**dyn, "kv": kv, "embed_table": embed_table},
            row_gather=row_gather, quant=step_quant)
        new_state = {k: v for k, v in new_state.items()
                     if k not in ("kv", "embed_table")}
        cand_lp, cand_ids = decoder_top_k(params["decoder"], dcfg, feats, K,
                                          vocab_table=vocab_table,
                                          quant_sm=quant_sm)
        return cand_lp, cand_ids, new_state

    finished0 = ~batch["row_live"] if "row_live" in batch else None
    return beam_search_core(step_fn, None, state, B, K, cfg.gen_len,
                            dcfg.bos_id, dcfg.eos_id, dcfg.pad_id,
                            length_penalty, early_stop=early_stop,
                            finished0=finished0, fused_reorder=True)
