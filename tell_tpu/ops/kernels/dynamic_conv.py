"""Fused dynamic-convolution Pallas kernel.

The decoder's conv block (reference: DynamicConv1dTBC,
/root/reference/tell/modules/convolutions/dynamic.py:25-361) does three HBM
round-trips in a naive implementation: (1) predict per-position tap logits
with a [C, H*K] matmul, (2) softmax-normalize them, (3) apply K shifted
multiply-accumulates over the input. This kernel fuses all three: each
[TILE_T, C] tile of x is read into VMEM once, tap logits are computed on the
MXU against the VMEM-resident predictor weight, the softmax runs across the
K unrolled tap tiles on the VPU, and the banded FMA reads its look-back
window from the tile pair (current + previous) already in VMEM. One read of
x (plus a halo tile), one write of the output — HBM traffic is 2·B·T·C
elements instead of ~(K+2)·B·T·C.

Backward pass: `jax.custom_vjp` whose bwd re-derives gradients through the
jnp reference implementation (identical math), so training uses the fused
forward and a recompute-based backward (rematerialization trades FLOPs for
HBM, the standard TPU trade).

Weight layout: the predictor weight arrives k-major, [C, K*H] with column
k*H + h = tap k of head h, so each tap's [C, H] slab is one static slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dispatch import interpret_mode

TILE_T = 128


def _kernel(xc_ref, xp_ref, w_ref, o_ref, *, K: int, H: int,
            weight_softmax: bool):
    i = pl.program_id(1)
    xc = xc_ref[0]                                   # [TILE_T, C]
    xp = jnp.where(i > 0, xp_ref[0], jnp.zeros_like(xp_ref[0]))
    f32 = jnp.float32
    logits = jnp.dot(xc, w_ref[:], preferred_element_type=f32)  # [T, K*H]
    taps = [logits[:, k * H:(k + 1) * H] for k in range(K)]
    if weight_softmax:
        m = functools.reduce(jnp.maximum, taps)
        exps = [jnp.exp(t - m) for t in taps]
        denom = functools.reduce(jnp.add, exps)
        inv = 1.0 / denom
        probs = [e * inv for e in exps]
    else:
        probs = taps
    window = jnp.concatenate([xp, xc], axis=0).astype(f32)  # [2*TILE_T, C]
    T, C = xc.shape
    R = C // H
    # Head -> channel expansion as a 0/1 matmul (a [T,H]x[H,C] MXU op):
    # Mosaic cannot shape-cast [T,H,R] -> [T,C], and lane-interleaved repeat
    # is not a native VPU op, but the systolic array does this for free.
    head_of = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1) // R
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, C), 0)
    expand = (head_of == rows).astype(f32)            # [H, C]
    acc = jnp.zeros((T, C), f32)
    for k in range(K):
        shift = K - 1 - k
        xs = window[T - shift: 2 * T - shift]
        pk = jnp.dot(probs[k], expand, preferred_element_type=f32)
        acc = acc + pk * xs
    o_ref[0] = acc.astype(o_ref.dtype)


def _pallas_forward(x: jax.Array, w_km: jax.Array, kernel_size: int,
                    num_heads: int, weight_softmax: bool) -> jax.Array:
    B, T, C = x.shape
    K, H = kernel_size, num_heads
    # the kernel's window slice needs tile >= K (a short caption bucket,
    # e.g. T=15 under the flagship's K=31 layer, would otherwise produce a
    # negative-start empty slice); trailing pad rows are sliced off below
    tile = min(TILE_T, max(T, K, 8))
    Tp = -(-T // tile) * tile
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    grid = (B, Tp // tile)
    out = pl.pallas_call(
        functools.partial(_kernel, K=K, H=H, weight_softmax=weight_softmax),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, C), lambda b, i: (b, jnp.maximum(i - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K * H), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x, x, w_km)
    return out[:, :T]


def _reference(x: jax.Array, w_km: jax.Array, kernel_size: int,
               num_heads: int, weight_softmax: bool) -> jax.Array:
    """jnp math twin of the kernel (used for the backward pass and parity)."""
    B, T, C = x.shape
    K, H = kernel_size, num_heads
    R = C // H
    logits = jnp.einsum("btc,cf->btf", x, w_km,
                        preferred_element_type=jnp.float32)
    w = logits.reshape(B, T, K, H)
    if weight_softmax:
        w = jax.nn.softmax(w, axis=2)
    xh = x.astype(jnp.float32).reshape(B, T, H, R)
    out = jnp.zeros((B, T, H, R), jnp.float32)
    for k in range(K):
        shift = K - 1 - k
        if shift == 0:
            xs = xh
        elif shift >= T:
            continue
        else:
            xs = jnp.pad(xh[:, : T - shift],
                         ((0, 0), (shift, 0), (0, 0), (0, 0)))
        out = out + w[:, :, k, :, None] * xs
    return out.reshape(B, T, C).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_dynamic_conv(x: jax.Array, w_km: jax.Array, kernel_size: int,
                       num_heads: int, weight_softmax: bool = True
                       ) -> jax.Array:
    """Fused causal dynamic conv. x: [B, T, C]; w_km: [C, K*H] (k-major)."""
    return _pallas_forward(x, w_km, kernel_size, num_heads, weight_softmax)


def _fwd(x, w_km, kernel_size, num_heads, weight_softmax):
    out = _pallas_forward(x, w_km, kernel_size, num_heads, weight_softmax)
    return out, (x, w_km)


def _bwd(kernel_size, num_heads, weight_softmax, res, g):
    x, w_km = res
    _, vjp = jax.vjp(
        lambda xx, ww: _reference(xx, ww, kernel_size, num_heads,
                                  weight_softmax), x, w_km)
    return vjp(g)


fused_dynamic_conv.defvjp(_fwd, _bwd)
