"""Adaptive input embeddings (Baevski & Auli 2019) and adaptive softmax
(Grave et al. 2017) with weight tying.

Replaces the reference's AdaptiveEmbedding
(/root/reference/tell/modules/token_embedders/adaptive.py:11-80) and
AdaptiveSoftmax (/root/reference/tell/modules/softmax.py:43-222).

Weight tying is trivial in the functional design: the softmax apply functions
take the *embedding params* as an argument and read the same pytree leaves —
no TiedLinear indirection. Flagship topology (config.yaml:28-76): cutoffs
[5000, 20000, 50265], factor 1 (all band dims = 1024), tie_adaptive_weights
on, tie_adaptive_proj off (each tail keeps a free input->band-dim projection).

TPU-native twist: the reference keeps the adaptive-softmax FLOP savings by
gathering only the rows whose target lands in a tail cluster
(softmax.py:184-188) — a dynamic shape. We keep the savings under static
shapes with MoE-style *capacity compaction*: each tail gets a fixed row
budget, in-cluster rows are compacted to the front with a stable argsort and
gathered; overflow rows (rare — tail tokens are by construction infrequent)
fall back to head-only loss and are counted for logging.

Reference quirks replicated:
* every band's row `padding_idx` is pinned to zero (nn.Embedding zeroes and
  excludes it from grads; adaptive.py:42). With padding_idx=0 this pins
  global ids 0, 5000 and 20000. We pin via `.at[...].set(0)` in apply, which
  also zeroes the gradient.
Deviation (documented): the reference passes ignore_index=pad to *every*
cluster's cross-entropy (criteria/adaptive_loss.py:59), which accidentally
ignores relative index `pad` inside tail clusters (global ids cutoff_i+pad).
We mask on the true pad id only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import dropout
from .linear import init_linear, linear


def fast_top_k(x: jax.Array, k: int,
               block: int = 128) -> tuple[jax.Array, jax.Array]:
    """EXACT top-k via a block-max prefilter — ~4x faster than lax.top_k
    STANDALONE on wide rows (v5e-1: 0.51 -> ~0.13 ms/step at
    [640, 30336], k=5). NOT used inside adaptive_top_k: there the plain
    sort already overlaps the next cluster's matmul and the prefilter's
    longer dependent chain measured slower end-to-end (see the note at
    the call site). Available for latency-bound single-sort contexts.

    Stage 1 takes the max of each `block`-lane tile (a pure VPU reduce at
    full HBM bandwidth) and sorts only the [R, n/block] maxima; stage 2
    gathers the winning k blocks and sorts their k*block candidates.
    Exactness: the j-th largest value (j <= k) has at most j-1 < k values
    above it, so at most k-1 OTHER blocks can have a larger max — its own
    block always survives the stage-1 top-k. Tie ORDER may differ from
    lax.top_k's lowest-index-first, which real (continuous) logits never
    exercise. Falls back to lax.top_k on narrow rows where the prefilter
    cannot win.
    """
    n = x.shape[-1]
    nb = -(-n // block)
    # need nb >= k for the stage-1 sort, and enough blocks that the
    # prefilter actually wins over one direct sort
    if nb < max(8, k) or k > block:
        return jax.lax.top_k(x, k)
    pad = nb * block - n
    if pad:
        # pad with true -inf, not finfo.min: rows may legitimately hold
        # -inf (masked logits), and a finfo.min pad would outrank them and
        # leak out-of-range ids; on ties lax.top_k prefers the LOWEST
        # index, so real columns always beat the trailing pad lanes
        x = jnp.pad(x, ((0, 0), (0, pad)),
                    constant_values=(-jnp.inf
                                     if jnp.issubdtype(x.dtype, jnp.floating)
                                     else _neg_inf_like(x)))
    blocks = x.reshape(x.shape[0], nb, block)
    _, bi = jax.lax.top_k(blocks.max(-1), k)              # [R, k]
    cand = jnp.take_along_axis(blocks, bi[:, :, None], axis=1)
    vals, ci = jax.lax.top_k(cand.reshape(x.shape[0], k * block), k)
    ids = (jnp.take_along_axis(bi, ci // block, axis=1) * block
           + ci % block)
    return vals, ids


def _neg_inf_like(x):
    return jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.iinfo(x.dtype).min


def band_ranges(cutoffs: tuple[int, ...]) -> list[tuple[int, int]]:
    """[(lo, hi)] for each band given full cutoffs ending at vocab_size."""
    out = []
    prev = 0
    for c in cutoffs:
        out.append((prev, c))
        prev = c
    return out


def init_adaptive_embedding(rng: jax.Array, cutoffs: tuple[int, ...],
                            initial_dim: int, factor: float, output_dim: int,
                            padding_idx: int = 0) -> dict:
    """cutoffs must end at vocab_size, e.g. (5000, 20000, 50265)."""
    bands = []
    for i, (lo, hi) in enumerate(band_ranges(cutoffs)):
        d = int(initial_dim // (factor ** i))
        re, rp = jax.random.split(jax.random.fold_in(rng, i))
        embed = jax.random.normal(re, (hi - lo, d), jnp.float32) * (d ** -0.5)
        if 0 <= padding_idx < hi - lo:
            embed = embed.at[padding_idx].set(0.0)
        proj = init_linear(rp, d, output_dim, bias=False)["w"]
        bands.append({"embed": embed, "proj": proj})
    return {"bands": bands}


def adaptive_embed(params: dict, ids: jax.Array, cutoffs: tuple[int, ...],
                   output_dim: int, padding_idx: int = 0,
                   scale_embeds: bool = True) -> jax.Array:
    """ids: int array of any shape -> [..., output_dim] (param dtype)."""
    out_dtype = params["bands"][0]["proj"].dtype
    result = jnp.zeros(ids.shape + (output_dim,), jnp.float32)
    for i, (lo, hi) in enumerate(band_ranges(cutoffs)):
        band = params["bands"][i]
        table = band["embed"]
        if 0 <= padding_idx < hi - lo:
            table = table.at[padding_idx].set(0.0)  # pinned row: zero grad too
        rel = jnp.clip(ids - lo, 0, hi - lo - 1)
        e = jnp.take(table, rel, axis=0)
        in_band = ((ids >= lo) & (ids < hi))[..., None]
        e = jnp.where(in_band, e, 0.0)
        result = result + jnp.dot(e, band["proj"],
                                  preferred_element_type=jnp.float32)
    if scale_embeds:
        result = result * (output_dim ** 0.5)
    return result.astype(out_dtype)


def merged_embed_table(params: dict, cutoffs: tuple[int, ...],
                       output_dim: int, padding_idx: int = 0,
                       scale_embeds: bool = True) -> jax.Array:
    """[V, output_dim] dense table equal to adaptive_embed row-by-row.

    Decode gathers one token per step: materializing the projected table
    once per generate call (a few band matmuls) replaces the per-step
    3-gather + 3-projection chain with a single row gather."""
    rows = []
    for i, (lo, hi) in enumerate(band_ranges(cutoffs)):
        band = params["bands"][i]
        table = band["embed"]
        if 0 <= padding_idx < hi - lo:
            table = table.at[padding_idx].set(0.0)
        rows.append(jnp.dot(table, band["proj"],
                            preferred_element_type=jnp.float32))
    full = jnp.concatenate(rows, axis=0)
    if scale_embeds:
        full = full * (output_dim ** 0.5)
    return full.astype(params["bands"][0]["proj"].dtype)


# ---------------------------------------------------------------------------
# Adaptive softmax
# ---------------------------------------------------------------------------

def init_adaptive_softmax(rng: jax.Array, cutoffs: tuple[int, ...],
                          input_dim: int, factor: float = 1.0,
                          tied: bool = True, tie_proj: bool = False) -> dict:
    """Owns only the untied pieces; tied tables are read from the embedding.

    Head word logits come from band-0 embeddings (TiedHeadModule,
    softmax.py:11-40); `class_proj` produces one logit per tail cluster.
    Each tail i projects input_dim -> band dim then hits band i+1's table.
    """
    n_tails = len(cutoffs) - 1
    rc = jax.random.fold_in(rng, 1000)
    p: dict = {
        "class_proj": init_linear(rc, input_dim, n_tails, bias=False),
        "tail_projs": [],
    }
    assert tied and not tie_proj, "untied adaptive softmax not needed yet"
    for i in range(n_tails):
        d = int(input_dim // (factor ** (i + 1)))
        p["tail_projs"].append(
            init_linear(jax.random.fold_in(rng, i), input_dim, d, bias=False))
    return p


def _pad_col_mask(n: int, padding_idx: int) -> jax.Array | None:
    """[n] fp32 ones with a 0 at padding_idx — multiplying the LOGITS by it
    equals zeroing the table's padding row before the matmul (0 * w = 0 for
    every x), but fuses into the matmul epilogue instead of materializing a
    full table copy per call (the old .at[padding_idx].set(0.0) cost a
    dynamic-update-slice over each [band, D] table on every decode step)."""
    if not 0 <= padding_idx < n:
        return None
    return jnp.ones((n,), jnp.float32).at[padding_idx].set(0.0)


def _head_logits(sm: dict, emb: dict, x: jax.Array,
                 padding_idx: int = 0) -> jax.Array:
    """[N, cutoff0 + n_tails]: band-0 word logits ++ tail-cluster logits."""
    table = emb["bands"][0]["embed"]
    word = jnp.dot(x, table.T, preferred_element_type=jnp.float32)
    m = _pad_col_mask(table.shape[0], padding_idx)
    if m is not None:
        word = word * m
    cls = linear(sm["class_proj"], x)
    return jnp.concatenate([word, cls.astype(word.dtype)], axis=-1)


def _tail_logits(sm: dict, emb: dict, x: jax.Array, i: int,
                 padding_idx: int = 0, drop_rate: float = 0.0,
                 rng: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
    """Tail cluster i (band i+1) logits for rows x: [N, band_size]."""
    h = linear(sm["tail_projs"][i], x)
    h = dropout(h, drop_rate, rng, deterministic)
    table = emb["bands"][i + 1]["embed"]
    out = jnp.dot(h, table.T, preferred_element_type=jnp.float32)
    m = _pad_col_mask(table.shape[0], padding_idx)
    return out if m is None else out * m


def _xent(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-row cross entropy, fp32."""
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    return lse - picked.astype(jnp.float32)


def adaptive_softmax_loss(sm: dict, emb: dict, x: jax.Array,
                          targets: jax.Array, cutoffs: tuple[int, ...],
                          pad_id: int = 1, padding_idx: int = 0,
                          tail_capacity: tuple[int, ...] | None = None,
                          drop_rate: float = 0.0,
                          rng: jax.Array | None = None,
                          deterministic: bool = True
                          ) -> tuple[jax.Array, jax.Array, dict]:
    """Summed CE loss over clusters, as in criteria/adaptive_loss.py:30-75.

    x: [N, D] decoder outputs, targets: [N] token ids.
    Returns (loss_sum, sample_size = non-pad token count, aux dict).
    """
    ranges = band_ranges(cutoffs)
    c0 = ranges[0][1]
    not_pad = targets != pad_id

    # independent dropout masks per site: the input drop and each tail's
    # hidden drop get folded keys (one shared key would correlate masks)
    tail_rng = (lambda i: jax.random.fold_in(rng, i + 1)) if rng is not None \
        else (lambda i: None)
    x = dropout(x, drop_rate,
                jax.random.fold_in(rng, 0) if rng is not None else None,
                deterministic)

    # Head: targets in tail band i are remapped to class slot c0 + i
    # (adapt_target, softmax.py:144-167).
    head_t = targets
    for i, (lo, hi) in enumerate(ranges[1:]):
        head_t = jnp.where((targets >= lo) & (targets < hi), c0 + i, head_t)
    head_lp = _xent(_head_logits(sm, emb, x, padding_idx), head_t)
    loss = jnp.sum(head_lp * not_pad)

    n_dropped = jnp.zeros((), jnp.int32)
    for i, (lo, hi) in enumerate(ranges[1:]):
        in_band = (targets >= lo) & (targets < hi) & not_pad
        if tail_capacity is None:
            tl = _tail_logits(sm, emb, x, i, padding_idx, drop_rate,
                              tail_rng(i), deterministic)
            ce = _xent(tl, jnp.clip(targets - lo, 0, hi - lo - 1))
            loss = loss + jnp.sum(ce * in_band)
        else:
            cap = tail_capacity[i]
            # Stable argsort compacts in-band rows to the front.
            order = jnp.argsort(~in_band, stable=True)
            idx = order[:cap]
            valid = jnp.take(in_band, idx)
            xg = jnp.take(x, idx, axis=0)
            tg = jnp.clip(jnp.take(targets, idx) - lo, 0, hi - lo - 1)
            tl = _tail_logits(sm, emb, xg, i, padding_idx, drop_rate,
                              tail_rng(i), deterministic)
            ce = _xent(tl, tg)
            loss = loss + jnp.sum(ce * valid)
            n_dropped = n_dropped + jnp.maximum(
                jnp.sum(in_band.astype(jnp.int32)) - cap, 0)

    sample_size = jnp.sum(not_pad.astype(jnp.int32))
    return loss, sample_size, {"tail_dropped": n_dropped}


def merged_decode_table(sm: dict, emb: dict, cutoffs: tuple[int, ...],
                        padding_idx: int = 0, dtype=None) -> jax.Array:
    """One [D, c0 + n_tails + sum(tail bands)] matmul table for decode-time
    top-k. Column layout = _head_logits (band-0 words ++ class logits) ++
    each tail band's logits.

    The head-word block is band-0's (tied) table, the class block is
    class_proj, and tail i's projection chain (x @ P_i) @ T_i^T collapses
    to x @ (P_i @ T_i^T) — exact up to float reassociation (no biases
    anywhere in the chain). Padding columns are zeroed exactly as
    _pad_col_mask does per block. Precomputed ONCE per decode call (the
    collapse costs ~2 decode steps of tail FLOPs) so each step's top-k is
    a single fused matmul instead of the 5-dispatch head/tail chain — the
    per-step HBM bytes are identical (same total table + logits traffic)
    but the op-chain overhead on the 640-row decode problem is not; see
    adaptive_top_k(vocab_table=)."""
    ranges = band_ranges(cutoffs)
    c0 = ranges[0][1]
    blocks = [emb["bands"][0]["embed"].T.astype(jnp.float32),
              sm["class_proj"]["w"].astype(jnp.float32)]
    for i in range(len(ranges) - 1):
        blocks.append(jnp.dot(sm["tail_projs"][i]["w"],
                              emb["bands"][i + 1]["embed"].T,
                              preferred_element_type=jnp.float32))
    w = jnp.concatenate(blocks, axis=1)
    cols = []                       # per-block padding columns to zero
    if 0 <= padding_idx < c0:
        cols.append(padding_idx)
    off = c0 + len(ranges) - 1
    for lo, hi in ranges[1:]:
        if 0 <= padding_idx < hi - lo:
            cols.append(off + padding_idx)
        off += hi - lo
    if cols:
        w = w.at[:, jnp.asarray(cols)].set(0.0)
    return w if dtype is None else w.astype(dtype)


def dec8_sm_enabled() -> bool:
    """int8 decode softmax tables — OPT-IN (TELL_TPU_DEC8_SM=1).
    Measured round 5 (tools/dec8_ab.py, v5e-1, flagship beam shape):
    THROUGHPUT-NEUTRAL — 335.1 vs 334.7 captions/s — because the cluster
    matmuls already hide under the VPU top-k sorts (the same mechanism
    that keeps the fused top-k kernel and the merged vocab table opt-in).
    Kept as a MEMORY lever: it halves the resident softmax tables
    (103 -> 52 MB) and their per-step reads, which matters when HBM is
    tight (many-slot engines, long contexts) — the int4 K/V precedent.
    NOT bit-exact (int8 rounding perturbs logits ~1e-2 relative, which
    can flip near-tie top-k candidates), so any use is gated like the
    int8 K/V cache: teacher-forced agreement, quality loop before a
    default flip."""
    from .kernels.dispatch import env_flag
    return env_flag("TELL_TPU_DEC8_SM")


def quantize_softmax_tables(sm: dict, emb: dict, cutoffs: tuple[int, ...],
                            padding_idx: int = 0) -> dict:
    """Precompute int8 decode softmax tables, ONCE per decode call (the
    closure pattern of decode_vocab_table / merged_embed_table).

    Layout mirrors the default split chain so the sort-overlap pipelining
    that made the merged monolith lose stays intact:
      head:  band-0 table^T [D, c0] int8 + per-col scales
      tails: each tail's COLLAPSED projection chain P_i @ T_i^T
             [D, band_i] int8 + per-col scales (exact up to float
             reassociation, same collapse as merged_decode_table)
      class: fp32 class_proj (tiny [D, n_tails] — not worth quantizing)
    Padding columns are baked to zero exactly as _pad_col_mask does."""
    ranges = band_ranges(cutoffs)
    c0 = ranges[0][1]
    from .quant import quantize_weight_int8

    def q(table_t, pad_ok):
        w = quantize_weight_int8(table_t)
        if pad_ok and 0 <= padding_idx < table_t.shape[1]:
            # zero the padding COLUMN via its scale (0 * anything = 0)
            w["scale"] = w["scale"].at[padding_idx].set(0.0)
        return w

    head = q(emb["bands"][0]["embed"].T.astype(jnp.float32), True)
    tails = []
    for i in range(len(ranges) - 1):
        t = jnp.dot(sm["tail_projs"][i]["w"],
                    emb["bands"][i + 1]["embed"].T,
                    preferred_element_type=jnp.float32)
        tails.append(q(t, True))
    return {"head": head, "tails": tails,
            "class_w": sm["class_proj"]["w"].astype(jnp.float32)}


def _approx_topk_enabled() -> bool:
    """Approximate per-cluster decode top-k — DEFAULT ON on TPU (disable
    with TELL_TPU_APPROX_TOPK=0): swaps each cluster's exact sort for the
    TPU's PartialReduce approx_max_k (recall_target=0.99), measured
    +10% end-to-end beam-5 throughput on v5e-1 (304.7 -> 336.5
    captions/s, tools/topk_variants.py). NOT bit-exact: a near-tie beam
    candidate can be missed ~1%/cluster at RANDOM-weight logit margins;
    at TRAINED margins caption-level agreement with the exact path is
    machine-checked by the offline quality loop (QUALITY_r03.json
    ab_approx_topk) and per-deployment by bench.py's A/B gate and
    `tnt serve --numerics-ab`. Off-TPU (CPU tests) the exact path stays
    the default so parity tests are exact; jax.lax.approx_max_k is exact
    on CPU anyway (the PartialReduce lowering is TPU-only)."""
    from .kernels.dispatch import env_flag, on_tpu
    return env_flag("TELL_TPU_APPROX_TOPK", default=on_tpu())


def topk_mode() -> str:
    """The active decode top-k algorithm: "approx" (TPU PartialReduce
    per-cluster candidate search) or "exact". Surfaced in eval/bench/
    serving status output so reported scores and throughputs are
    attributable (mirrors kv_cache_mode for the int8 K/V default)."""
    return "approx" if _approx_topk_enabled() else "exact"


def adaptive_top_k(sm: dict, emb: dict, x: jax.Array,
                   cutoffs: tuple[int, ...], k: int,
                   padding_idx: int = 0,
                   vocab_table: jax.Array | None = None,
                   quant_sm: dict | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """Top-k of the full factored distribution WITHOUT materializing
    [N, V] log-probs — the decode-loop hot path.

    Per-cluster top-k + prior shift, then top-k over the (n_clusters * k)
    candidates. Exact when the per-cluster search is exact, because adding
    a cluster's scalar prior preserves within-cluster order. On TPU the
    per-cluster search defaults to approx_max_k (see _approx_topk_enabled;
    TELL_TPU_APPROX_TOPK=0 restores the exact sort); the candidate merge
    is always exact. Returns (log_probs [N, k], token_ids [N, k]).

    vocab_table: optional precomputed merged_decode_table — all cluster
    logits then come from ONE [N, D] x [D, V+n_tails] matmul and the
    head/tail blocks are slices of it (same math, ~5 fewer dispatches per
    decode step). The table bakes in its build-time padding_idx (zeroed
    columns); when it is supplied this function's padding_idx argument is
    unused, so the table MUST have been built with the same padding_idx
    the caller would otherwise pass — they diverge silently otherwise.
    The table is consumed at its own (fp32) precision rather than being
    downcast to x.dtype, matching the default chain's param-dtype matmul
    with fp32 accumulation.
    """
    ranges = band_ranges(cutoffs)
    c0 = ranges[0][1]
    n_tails = len(ranges) - 1
    # The Pallas top-k kernel (ops/kernels/topk_logits.py) avoids the
    # [N, V] logits round-trip but measured ~5% SLOWER end-to-end on v5e
    # (XLA's sort overlaps the matmul better than the in-kernel k-pass
    # extraction), so it is opt-in: TELL_TPU_TOPK=1.
    from .kernels.dispatch import env_flag
    if (vocab_table is None and quant_sm is None
            and env_flag("TELL_TPU_TOPK") and k <= 8
            and x.shape[0] * 2048 * 4 < 8 * 2**20):
        return _adaptive_top_k_fused(sm, emb, x, ranges, k, padding_idx)
    # top_k on RAW logits (order-preserving), log-softmax applied only to
    # the k winners via a separate logsumexp — avoids materializing a
    # second full-vocab fp32 array between the matmul and the sort.
    # (A bf16-logits variant — halving the [N, V] stream the sort reads —
    # measured SLOWER end-to-end: 258.7 vs 266.9 captions/s; see the
    # findings log in tools/topk_variants.py.)
    xq = sx = None
    if quant_sm is not None and vocab_table is None:
        # int8 cluster matmuls (quantize_softmax_tables): ONE activation
        # quant serves the head and every tail's matmul; the class
        # logits stay fp (tiny). Split-chain structure preserved.
        from .quant import quantize_act_int8
        xq, sx = quantize_act_int8(x)
        word = (jnp.dot(xq, quant_sm["head"]["q8"],
                        preferred_element_type=jnp.int32)
                .astype(jnp.float32) * sx * quant_sm["head"]["scale"])
        cls = jnp.dot(x.astype(jnp.float32), quant_sm["class_w"],
                      preferred_element_type=jnp.float32)
        head_logits = jnp.concatenate([word, cls], axis=-1)
    elif vocab_table is not None:
        logits_all = jnp.dot(x, vocab_table,
                             preferred_element_type=jnp.float32)
        head_logits = logits_all[:, :c0 + n_tails]
        tail_off = c0 + n_tails
    else:
        head_logits = _head_logits(sm, emb, x, padding_idx
                                   ).astype(jnp.float32)
    head_lse = jax.scipy.special.logsumexp(head_logits, axis=-1)
    # NOTE: fast_top_k (block-max prefilter) measured FASTER standalone
    # (0.51 -> 0.13 ms at [640, 30336]) but SLOWER end-to-end here
    # (305.7 -> 297.3 captions/s): XLA already overlaps each cluster's
    # sort with the next cluster's matmul, so the sort is off the
    # critical path and the prefilter's longer dependent op chain
    # (reduce -> gather -> sort) only adds serial latency.
    if _approx_topk_enabled():
        # TPU PartialReduce approximate top-k (recall ~0.99 per element)
        # for the PER-CLUSTER candidate sorts only — the final merge over
        # the <= k*n_clusters survivors (line ~408) stays an exact top_k.
        def _tk(a, kk):
            return jax.lax.approx_max_k(a, kk, recall_target=0.99)
    else:
        _tk = jax.lax.top_k
    vals, ids = _tk(head_logits[:, :c0], k)
    all_vals = [vals - head_lse[:, None]]
    all_ids = [ids]
    for i, (lo, hi) in enumerate(ranges[1:]):
        if xq is not None:
            t8 = quant_sm["tails"][i]
            tl = (jnp.dot(xq, t8["q8"], preferred_element_type=jnp.int32)
                  .astype(jnp.float32) * sx * t8["scale"])
        elif vocab_table is not None:
            tl = logits_all[:, tail_off:tail_off + (hi - lo)]
            tail_off += hi - lo
        else:
            tl = _tail_logits(sm, emb, x, i, padding_idx
                              ).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(tl, axis=-1)
        tv, ti = _tk(tl, min(k, hi - lo))
        prior = head_logits[:, c0 + i] - head_lse
        all_vals.append(tv - lse[:, None] + prior[:, None])
        all_ids.append(ti + lo)
    cat_vals = jnp.concatenate(all_vals, axis=-1)
    cat_ids = jnp.concatenate(all_ids, axis=-1)
    final_vals, pos = jax.lax.top_k(cat_vals, k)
    final_ids = jnp.take_along_axis(cat_ids, pos, axis=-1)
    return final_vals, final_ids


def _adaptive_top_k_fused(sm: dict, emb: dict, x: jax.Array,
                          ranges, k: int, padding_idx: int
                          ) -> tuple[jax.Array, jax.Array]:
    """Pallas fast path: per-cluster fused logits+top-k+lse kernels
    (ops/kernels/topk_logits.py); full logits never hit HBM. The head's
    tail-cluster logits ride XLA (an [N, n_tails] matmul) and fold into
    the head normalizer with one logaddexp."""
    from .kernels.topk_logits import topk_logits
    c0 = ranges[0][1]
    table0 = emb["bands"][0]["embed"]
    if 0 <= padding_idx < table0.shape[0]:
        table0 = table0.at[padding_idx].set(0.0)
    wv, wi, lse_w = topk_logits(x, table0.astype(x.dtype), k)
    cls = linear(sm["class_proj"], x).astype(jnp.float32)  # [N, n_tails]
    head_lse = jnp.logaddexp(lse_w,
                             jax.scipy.special.logsumexp(cls, axis=-1))
    all_vals = [wv - head_lse[:, None]]
    all_ids = [wi]
    for i, (lo, hi) in enumerate(ranges[1:]):
        h = linear(sm["tail_projs"][i], x)
        table = emb["bands"][i + 1]["embed"]
        if 0 <= padding_idx < table.shape[0]:
            table = table.at[padding_idx].set(0.0)
        tv, ti, lse_t = topk_logits(h, table.astype(h.dtype),
                                    min(k, hi - lo))
        prior = cls[:, i] - head_lse
        all_vals.append(tv - lse_t[:, None] + prior[:, None])
        all_ids.append(ti + lo)
    cat_vals = jnp.concatenate(all_vals, axis=-1)
    cat_ids = jnp.concatenate(all_ids, axis=-1)
    final_vals, pos = jax.lax.top_k(cat_vals, k)
    final_ids = jnp.take_along_axis(cat_ids, pos, axis=-1)
    return final_vals, final_ids


def adaptive_log_probs(sm: dict, emb: dict, x: jax.Array,
                       cutoffs: tuple[int, ...],
                       padding_idx: int = 0) -> jax.Array:
    """Full-vocab log-probs [N, V] (get_log_prob, softmax.py:193-222).

    log p(w) = head_lsm[w]                     for w in band 0
             = head_lsm[c0+i] + tail_lsm_i[w]  for w in tail i.
    """
    ranges = band_ranges(cutoffs)
    c0 = ranges[0][1]
    head = jax.nn.log_softmax(
        _head_logits(sm, emb, x, padding_idx).astype(jnp.float32), axis=-1)
    parts = [head[:, :c0]]
    for i in range(len(ranges) - 1):
        tl = jax.nn.log_softmax(
            _tail_logits(sm, emb, x, i, padding_idx).astype(jnp.float32),
            axis=-1)
        parts.append(tl + head[:, c0 + i, None])
    return jnp.concatenate(parts, axis=-1)
