"""Fused multi-context decode attention Pallas kernel.

The decode step's dominant HBM cost beyond the unavoidable K/V stream is
the score/probability round-trip: XLA materializes [B, H, M*G, S] fp32
scores, reads them for the masked softmax, writes bf16 probabilities, and
reads those again for the value contraction — ~4x the K/V bytes per layer
at production shapes. This kernel runs the whole chain per (batch, head)
grid cell in VMEM: q.K^T on the MXU, segment mask + fp32 softmax on the
VPU, probs.V on the MXU, never touching HBM with intermediates. K/V are
stored HEAD-MAJOR ([B, H, S, hd]) in the decode state so each grid cell
reads a contiguous [S, hd] tile — no in-kernel relayout (Mosaic cannot
shape-cast a lane-dim split).

Semantics (must match cross_attention_with_kv / _attn_group exactly):
query row x = m * G + g attends rows where seg[s] == m and the padding
mask is off; softmax in fp32 over the masked row; fully-masked rows
(impossible here: every segment has a bias column) would yield zeros.

Reference baseline being replaced: four fairseq MultiHeadAttention calls
per layer per step (/root/reference/tell/modules/attention/multi_head.py:
288-486, decoder layer at decoder_faces_objects.py:271-352).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, H: int, BB: int):
    """Grid cell: q [BB, H, MG, hd], k/v TRANSPOSED [BB, H, hd, S], bias
    [BB, MG, S]. BB batch rows and all heads per cell keep the grid coarse
    (few, large DMA transactions) while the bias tile is read once per
    row; the [hd, S] K/V layout keeps every matmul operand fully
    lane-aligned (hd=64 as the minor dim would waste half of each VMEM
    tile and DMA at ~60% efficiency — measured).

    Both contractions are HEAD-BATCHED dot_generals and the softmax runs
    once over the stacked [H, MG, S] scores: a per-(b,h) loop of
    [MG, hd] x [hd, S] matmuls measured 0.35 ms/call at production shapes
    (B=64, S=640) against 0.19 ms for this form — 91% of the pure K/V DMA
    bound — because 2x16 serial tiny matmul+softmax chains leave both MXU
    and VPU idle between ops (tools/kernel_variants.py)."""
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        kt = k_ref[b]                                 # [H, hd, S]
        vt = v_ref[b]                                 # [H, hd, S]
        scores = jax.lax.dot_general(
            q, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, S]
        scores = scores + bias_ref[b][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, hd]
        o_ref[b] = out.astype(o_ref.dtype)


def segment_bias(seg: jax.Array, pad: jax.Array, M: int, G: int
                 ) -> jax.Array:
    """Additive mask [B, MG, S]: 0 where query row m*G+g may attend source
    row s (seg[s]==m and not padded), -inf elsewhere. Computed outside the
    kernel (scalar/int vectors cannot ride unaligned VMEM blocks)."""
    seg_ok = seg[None, :] == jnp.arange(M)[:, None]                 # [M,S]
    allowed = seg_ok[None] & ~pad[:, None, :]                       # [B,M,S]
    allowed = jnp.repeat(allowed, G, axis=1)                        # [B,MG,S]
    return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)


# ~16 MB VMEM/core; the production shape (BB=2, S=640) measures 13.8 MB
# (10.4 double-buffered K/V + 3.4 fp32 scores/bias), so the budget sits
# just above it — only genuinely long contexts demote BB or fall back.
_VMEM_BUDGET = 15 * 2**20


def _pick_bb(B: int, H: int, hd: int, S: int, MG: int,
             itemsize: int, quant: bool = False) -> int | None:
    """Largest BB in (2, 1) whose per-cell working set (K+V tiles, double-
    buffered by Mosaic, + fp32 scores/bias, + the fp32 per-source-row
    k/v scale tiles when quant) fits VMEM; None = fall back to the tiled
    kernel (very long contexts — S in the thousands)."""
    for bb in (2, 1):
        if B % bb:
            continue
        kv = 2 * bb * H * hd * S * itemsize * 2      # x2 double buffering
        if quant:
            kv += 2 * bb * H * S * 4 * 2             # k/v scales [H,1,S]
        scores = bb * H * MG * S * 4 + bb * MG * S * 4
        if kv + scores <= _VMEM_BUDGET:
            return bb
    return None


def _pick_tile(B: int, H: int, hd: int, S: int, MG: int,
               itemsize: int, quant: bool = False) -> tuple[int, int] | None:
    """(BB, TS) for the S-tiled kernel: largest batch block then largest
    S tile whose working set (double-buffered K/V tiles + fp32 scores/bias
    tile + persistent fp32 accumulator + q + fp32 scale tiles when quant)
    fits VMEM. None = even a (1, 128) cell does not fit (enormous H*MG —
    not a real config)."""
    persist = 4 * H * MG * (hd + 2)                  # acc + m + l, per row
    for bb in (2, 1):
        if B % bb:
            continue
        for ts in (1024, 512, 256, 128):
            if ts >= 2 * S:                           # pointless tiling
                continue
            kv = 2 * bb * H * hd * ts * itemsize * 2  # x2 double buffering
            if quant:
                kv += 2 * bb * H * ts * 4 * 2        # k/v scale tiles
            scores = bb * H * MG * ts * 4 + bb * MG * ts * 4
            q = bb * H * MG * hd * itemsize
            if kv + scores + q + bb * persist <= _VMEM_BUDGET:
                return bb, ts
    return None


def _kernel_tiled(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  acc_ref, m_ref, l_ref, *,
                  H: int, BB: int, S: int, TS: int):
    """Online-softmax (flash-decode) variant for long contexts: the S axis
    rides an inner 'arbitrary' grid dimension; running max / normalizer /
    output accumulator live in VMEM scratch across tiles. The final tile
    may be ragged — out-of-bounds columns are masked to -inf before the
    max (OOB block contents are unspecified) and V's OOB columns zeroed
    (the weights there are exactly 0.0, but 0 * garbage-NaN would still
    poison the value contraction)."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, TS), 2)
             + s_idx * TS) < S                        # [1, 1, TS]
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        kt = k_ref[b]                                 # [H, hd, TS]
        vt = jnp.where(valid, v_ref[b], 0)            # [H, hd, TS]
        scores = jax.lax.dot_general(
            q, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, TS]
        scores = jnp.where(valid, scores + bias_ref[b][None], -jnp.inf)
        m_prev = m_ref[b]                             # [H, MG, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)                   # 0.0 at masked cols
        l_ref[b] = l_ref[b] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            e.astype(vt.dtype), vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, hd]
        acc_ref[b] = acc_ref[b] * alpha + pv
        m_ref[b] = m_new

    @pl.when(s_idx == n_s - 1)
    def _finish():
        for b in range(BB):
            o_ref[b] = (acc_ref[b] / l_ref[b]).astype(o_ref.dtype)


def _tiled_decode_attention(q, k, v, bias, BB: int, TS: int) -> jax.Array:
    B, H, MG, hd = q.shape
    S = k.shape[3]
    n_s = -(-S // TS)
    kv_spec = pl.BlockSpec((BB, H, hd, TS), lambda b, s: (b, 0, 0, s),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_tiled, H=H, BB=BB, S=S, TS=TS),
        out_shape=jax.ShapeDtypeStruct((B, H, MG, hd), q.dtype),
        grid=(B // BB, n_s),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
            pl.BlockSpec((BB, MG, TS), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BB, H, MG, hd), jnp.float32),
            pltpu.VMEM((BB, H, MG, 1), jnp.float32),
            pltpu.VMEM((BB, H, MG, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(q, k, v, bias)


def fused_decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           bias: jax.Array) -> jax.Array:
    """q: [B, H, MG, hd]; k, v: [B, H, hd, S] (head-major, TRANSPOSED);
    bias: [B, MG, S] additive mask. Returns [B, H, MG, hd].

    Long contexts whose whole K/V stripe does not fit a VMEM cell ride the
    S-tiled online-softmax kernel instead; jnp twin only as a last resort."""
    B, H, MG, hd = q.shape
    S = k.shape[3]
    BB = _pick_bb(B, H, hd, S, MG, k.dtype.itemsize)
    if BB is None:
        tile = _pick_tile(B, H, hd, S, MG, k.dtype.itemsize)
        if tile is None:
            return reference_decode_attention(q, k, v, bias)
        return _tiled_decode_attention(q, k, v, bias, *tile)
    return pl.pallas_call(
        functools.partial(_kernel, H=H, BB=BB),
        out_shape=jax.ShapeDtypeStruct((B, H, MG, hd), q.dtype),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H, hd, S), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H, hd, S), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, MG, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret_mode(),
    )(q, k, v, bias)


def unpack_int4(x8: jax.Array, dtype=jnp.int8) -> jax.Array:
    """Packed int4 [..., hd/2, S] -> `dtype` [..., hd, S].

    Byte d holds the nibble pair (d, d + hd/2): the low nibble is row d,
    the high nibble row d + hd/2, both two's-complement in [-7, 7], so a
    concat along the row axis restores the original hd order. int32 shifts
    sign-extend portably (int8 shift semantics differ between numpy and
    Mosaic)."""
    xi = x8.astype(jnp.int32)
    lo = (xi << 28) >> 28
    hi = (xi << 24) >> 28
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def _dequant(x_ref_b: jax.Array, dtype, pack4: bool) -> jax.Array:
    """In-kernel K/V dequantization to the query dtype. int8 in [-127,127]
    (and int4 in [-7,7]) is exactly representable in bf16, so this loses
    nothing; for pack4 the nibble unpack runs on the VPU in int32."""
    if pack4:
        return unpack_int4(x_ref_b, dtype)
    return x_ref_b.astype(dtype)


def _kernel_q8(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref, *,
               H: int, BB: int, pack4: bool = False):
    """int8-K/V variant: K/V arrive as int8 [BB, H, hd, S] with per-source-
    row fp32 scales [BB, H, 1, S]. The scales factor out of both
    contractions (scores *= k_scale per column; p *= v_scale before the
    value matmul), so the only approximation is the int8 rounding of K/V
    themselves — and the kernel's HBM stream halves, which is the point:
    the K/V DMA is the decode loop's dominant cost (ARCHITECTURE.md).
    With pack4, K/V arrive nibble-packed [BB, H, hd/2, S] (see
    unpack_int4) and the stream halves again."""
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        kt = _dequant(k_ref[b], q_ref.dtype, pack4)   # [H, hd, S]
        vt = _dequant(v_ref[b], q_ref.dtype, pack4)
        scores = jax.lax.dot_general(
            q, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, S]
        scores = scores * ks_ref[b] + bias_ref[b][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p = p * vs_ref[b]
        out = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, hd]
        o_ref[b] = out.astype(o_ref.dtype)


def _kernel_q8_tiled(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
                     acc_ref, m_ref, l_ref, *,
                     H: int, BB: int, S: int, TS: int, pack4: bool = False):
    """Online-softmax int8-K/V variant. As in the single-shot q8 kernel the
    per-source-row scales factor out of both contractions: scores *= ks per
    column; the unnormalized weights are multiplied by vs before the value
    matmul while the normalizer l accumulates the raw e. vs is zeroed at
    ragged-tile OOB columns (fp32 garbage there could be NaN and 0 * NaN
    would poison the accumulator; int8 K/V garbage is always finite)."""
    s_idx = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)

    valid = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, TS), 2)
             + s_idx * TS) < S                        # [1, 1, TS]
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        kt = _dequant(k_ref[b], q_ref.dtype, pack4)   # [H, hd, TS]
        vt = _dequant(v_ref[b], q_ref.dtype, pack4)
        vs = jnp.where(valid, vs_ref[b], 0.0)         # [H, 1, TS]
        scores = jax.lax.dot_general(
            q, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, TS]
        scores = jnp.where(valid, scores * ks_ref[b] + bias_ref[b][None],
                           -jnp.inf)
        m_prev = m_ref[b]                             # [H, MG, 1]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(scores - m_new)                   # 0.0 at masked cols
        l_ref[b] = l_ref[b] * alpha + jnp.sum(e, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            (e * vs).astype(vt.dtype), vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, hd]
        acc_ref[b] = acc_ref[b] * alpha + pv
        m_ref[b] = m_new

    @pl.when(s_idx == n_s - 1)
    def _finish():
        for b in range(BB):
            o_ref[b] = (acc_ref[b] / l_ref[b]).astype(o_ref.dtype)


def _tiled_decode_attention_q8(q, k8, k_scale, v8, v_scale, bias,
                               BB: int, TS: int,
                               pack4: bool = False) -> jax.Array:
    B, H, MG, hd = q.shape
    hd_store = k8.shape[2]                 # hd, or hd/2 nibble-packed
    S = k8.shape[3]
    n_s = -(-S // TS)
    kv_spec = pl.BlockSpec((BB, H, hd_store, TS), lambda b, s: (b, 0, 0, s),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((BB, H, 1, TS), lambda b, s: (b, 0, 0, s),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_q8_tiled, H=H, BB=BB, S=S, TS=TS,
                          pack4=pack4),
        out_shape=jax.ShapeDtypeStruct((B, H, MG, hd), q.dtype),
        grid=(B // BB, n_s),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b, s: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((BB, MG, TS), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b, s: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BB, H, MG, hd), jnp.float32),
            pltpu.VMEM((BB, H, MG, 1), jnp.float32),
            pltpu.VMEM((BB, H, MG, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret_mode(),
    )(q, k8, k_scale, v8, v_scale, bias)


def fused_decode_attention_q8(q: jax.Array, k8: jax.Array, k_scale: jax.Array,
                              v8: jax.Array, v_scale: jax.Array,
                              bias: jax.Array) -> jax.Array:
    """q: [B, H, MG, hd]; k8/v8: int8 [B, H, hd, S] — or nibble-packed
    int4 [B, H, hd/2, S] (see unpack_int4); k_scale/v_scale: fp32
    [B, H, 1, S]; bias: [B, MG, S]. Returns [B, H, MG, hd]."""
    B, H, MG, hd = q.shape
    hd_store = k8.shape[2]
    pack4 = hd_store != hd
    S = k8.shape[3]
    # Size the VMEM model on the FULL head dim even when pack4 streams
    # hd/2 bytes: _dequant materializes full-hd bf16 kt/vt tiles in VMEM,
    # which dominate the footprint — modeling hd/2 would admit
    # long-context shapes into the single-shot kernel that only the tiled
    # kernel can actually hold (conservative by the halved input stream).
    BB = _pick_bb(B, H, hd, S, MG, 1, quant=True)
    if BB is None:
        tile = _pick_tile(B, H, hd, S, MG, 1, quant=True)
        if tile is not None:
            return _tiled_decode_attention_q8(
                q, k8, k_scale, v8, v_scale, bias, *tile, pack4=pack4)
        return reference_decode_attention_q8(q, k8, k_scale, v8, v_scale,
                                             bias)
    kv_spec = pl.BlockSpec((BB, H, hd_store, S), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((BB, H, 1, S), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_q8, H=H, BB=BB, pack4=pack4),
        out_shape=jax.ShapeDtypeStruct((B, H, MG, hd), q.dtype),
        grid=(B // BB,),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((BB, MG, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret_mode(),
    )(q, k8, k_scale, v8, v_scale, bias)


def reference_decode_attention_q8(q, k8, k_scale, v8, v_scale, bias):
    """jnp math twin of the int8-K/V kernels (parity tests + the
    last-resort fallback for shapes where even a (1, 128) tile cell would
    not fit VMEM). Same int8 math as decoder.stacked_attention_core's
    quant branch: scales factor out of both contractions. Accepts
    nibble-packed int4 K/V ([B, H, hd/2, S]) and unpacks it first."""
    if k8.shape[2] != q.shape[3]:
        k8, v8 = unpack_int4(k8), unpack_int4(v8)
    scores = jnp.einsum("bhxd,bhds->bhxs", q, k8.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_scale + bias[:, None]
    p = jax.nn.softmax(scores, axis=-1) * v_scale
    return jnp.einsum("bhxs,bhds->bhxd", p.astype(q.dtype),
                      v8.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def reference_decode_attention(q, k, v, bias):
    """jnp math twin (parity tests). k/v transposed [B, H, hd, S]."""
    scores = jnp.einsum("bhxd,bhds->bhxs", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias[:, None]
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhxs,bhds->bhxd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
