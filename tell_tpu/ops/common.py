"""Shared functional building blocks.

Params are plain pytrees (nested dicts of jnp arrays). Every op is an
``init_*`` / apply pair. Dropout takes an explicit rng and a ``deterministic``
flag; there is no global training mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(x: jax.Array, rate: float, rng: jax.Array | None,
            deterministic: bool) -> jax.Array:
    """Inverted dropout. No-op when deterministic or rate == 0."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def init_layer_norm(dim: int) -> dict:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
    }


def layer_norm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in fp32 for stability."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"] + params["bias"]
    return y.astype(dtype)


def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    """Gated linear unit: split in half, gate second half with sigmoid."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)

def exact_top_k(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis via block-max selection — one cheap
    max-reduce over [N, V], a small top-k over the V/128 block maxima, a
    gather of only the k winning 128-wide blocks, and a re-top-k over
    k*128 candidates. Exact: a block containing the j-th ranked value has
    block max >= v_j and at most j-1 blocks have a larger max (each must
    hold one of ranks 1..j-1), so the top-k-by-max blocks cover all top-k
    values. Replaces lax.top_k's full-width variadic sort on the decode
    hot path (lax.top_k over the 30265-wide adaptive-softmax tail measured
    132 us at N=640 on v5e; see tools/topk_variants.py).

    Tie behavior: values always match lax.top_k; ids may pick a different
    equal-valued element (same caveat as lax.top_k itself vs argsort).
    """
    n, v = x.shape
    bs = 128
    nb = -(-v // bs)
    if nb <= k:                               # narrow rows: direct sort
        return jax.lax.top_k(x, k)
    pad = nb * bs - v
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    blocks = xp.reshape(n, nb, bs)
    bm = jnp.max(blocks, axis=-1)                      # [n, nb]
    _, bsel = jax.lax.top_k(bm, k)                     # [n, k] block ids
    cand = jnp.take_along_axis(blocks, bsel[:, :, None], axis=1)
    fv, fp = jax.lax.top_k(cand.reshape(n, k * bs), k)
    fi = jnp.take_along_axis(bsel, fp // bs, axis=-1) * bs + fp % bs
    return fv, fi
