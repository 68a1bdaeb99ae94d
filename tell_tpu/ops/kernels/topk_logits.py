"""Fused logits + top-k + logsumexp Pallas kernel.

The beam-search inner loop scores every vocabulary entry each step
(adaptive-softmax tails: [N, 1024] x [1024, 30k]) and then sorts. XLA
materializes the full [N, V] fp32 logits between the matmul and the
top-k sort; this kernel streams the vocabulary in VMEM-sized tiles and
keeps only running top-k candidates and an online logsumexp per row —
full logits never touch HBM.

Reference baseline: AdaptiveSoftmax.get_log_prob materializes the whole
[N, V] distribution every decode step
(/root/reference/tell/modules/softmax.py:193-222).

Algorithm per grid step (one vocab tile):
  logits = x @ table_tile^T (MXU, fp32 accum)
  online-lse: m' = max(m, rowmax(logits)); s' = s*exp(m-m') + sum(exp(l-m'))
  k iterations of (rowmax, argmax-mask) extract the tile's top-k
  merge with the running top-k (again k iterations over 2k candidates)
Scratch: vals [N, k] fp32, ids [N, k] int32, m/s [N, 1] fp32 (VMEM).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

TILE_V = 2048


def _row_top1(l: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(max value [N,1], argmax index [N,1] int32) of each row."""
    v = jnp.max(l, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1)
    big = l.shape[1] + 1
    idx = jnp.min(jnp.where(l == v, cols, big), axis=1, keepdims=True)
    return v, idx


def _kernel(x_ref, t_ref, vals_ref, ids_ref, lse_ref,
            sv_ref, si_ref, m_ref, s_ref, *, k: int, V: int):
    i = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        sv_ref[:] = jnp.full_like(sv_ref, -jnp.inf)
        si_ref[:] = jnp.zeros_like(si_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        s_ref[:] = jnp.zeros_like(s_ref)

    x = x_ref[:]                                       # [N, D]
    t = t_ref[:]                                       # [TILE_V, D]
    l = jax.lax.dot_general(x, t, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [N, TILE_V]
    # mask the padded vocab rows of the final tile
    base = i * l.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, l.shape, 1) + base
    l = jnp.where(cols < V, l, -jnp.inf)

    # online logsumexp
    m_old = m_ref[:]
    tile_max = jnp.max(l, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, tile_max)
    scale = jnp.where(jnp.isfinite(m_old), jnp.exp(m_old - m_new), 0.0)
    s_ref[:] = s_ref[:] * scale + jnp.sum(jnp.exp(l - m_new), axis=1,
                                          keepdims=True)
    m_ref[:] = m_new

    # tile top-k then merge with the running top-k
    lw = l
    for j in range(k):
        v, idx = _row_top1(lw)
        gidx = (idx + base).astype(jnp.int32)
        # replace the running minimum if this candidate beats it
        run_min = jnp.min(sv_ref[:], axis=1, keepdims=True)
        take = v > run_min
        is_min_col = sv_ref[:] == run_min
        # only the FIRST minimum column swaps (break ties by column index)
        colz = jax.lax.broadcasted_iota(jnp.int32, sv_ref.shape, 1)
        first_min = colz == jnp.min(
            jnp.where(is_min_col, colz, sv_ref.shape[1] + 1), axis=1,
            keepdims=True)
        do = take & first_min
        sv_ref[:] = jnp.where(do, v, sv_ref[:])
        si_ref[:] = jnp.where(do, gidx, si_ref[:])
        # mask the extracted entry and continue
        cols2 = jax.lax.broadcasted_iota(jnp.int32, lw.shape, 1)
        lw = jnp.where(cols2 == idx, -jnp.inf, lw)

    @pl.when(i == nt - 1)
    def _():
        # emit sorted top-k (descending) + final lse
        vals = sv_ref[:]
        ids = si_ref[:]
        out_v = []
        out_i = []
        work = vals
        for _ in range(k):
            v, idx = _row_top1(work)
            colz = jax.lax.broadcasted_iota(jnp.int32, work.shape, 1)
            sel = colz == idx
            out_v.append(v)
            out_i.append(jnp.sum(jnp.where(sel, ids, 0), axis=1,
                                 keepdims=True))
            work = jnp.where(sel, -jnp.inf, work)
        vals_ref[:] = jnp.concatenate(out_v, axis=1)
        ids_ref[:] = jnp.concatenate(out_i, axis=1)
        lse_ref[:] = m_ref[:] + jnp.log(s_ref[:])


def topk_logits(x: jax.Array, table: jax.Array, k: int
                ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x: [N, D], table: [V, D] -> (top-k logits [N, k] desc, indices
    [N, k], logsumexp [N]). Exact; logits are streamed, never stored."""
    N, D = x.shape
    V = table.shape[0]
    Vp = -(-V // TILE_V) * TILE_V
    if Vp != V:
        table = jnp.pad(table, ((0, Vp - V), (0, 0)))
    nt = Vp // TILE_V
    vals, ids, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, V=V),
        out_shape=(jax.ShapeDtypeStruct((N, k), jnp.float32),
                   jax.ShapeDtypeStruct((N, k), jnp.int32),
                   jax.ShapeDtypeStruct((N, 1), jnp.float32)),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((N, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_V, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((N, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, k), jnp.float32),
            pltpu.VMEM((N, k), jnp.int32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
        ],
        interpret=interpret_mode(),
    )(x, table)
    return vals, ids, lse[:, 0]


def reference_topk_logits(x, table, k):
    """jnp math twin (parity tests)."""
    l = jnp.dot(x, table.T, preferred_element_type=jnp.float32)
    lse = jax.scipy.special.logsumexp(l, axis=-1)
    v, i = jax.lax.top_k(l, k)
    return v, i, lse
