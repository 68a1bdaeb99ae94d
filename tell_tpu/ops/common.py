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
