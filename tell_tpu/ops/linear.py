"""Linear layers with the initializations the captioning model depends on.

``gehring_linear`` replicates the reference's GehringLinear
(/root/reference/tell/modules/linear.py:8-33): fan-in-scaled normal init plus
weight normalization (Salimans & Kingma 2016). We keep the weight-norm
reparameterization (direction ``v`` + per-row gain ``g``) because it changes
training dynamics; XLA fuses the row-norm into the matmul epilogue so it is
effectively free on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(rng: jax.Array, in_dim: int, out_dim: int,
                bias: bool = True, init: str = "xavier") -> dict:
    """Plain linear layer. Weight stored [in_dim, out_dim] (row-major matmul)."""
    if init == "xavier":
        bound = (6.0 / (in_dim + out_dim)) ** 0.5
        w = jax.random.uniform(rng, (in_dim, out_dim), jnp.float32,
                               -bound, bound)
    elif init == "normal_embed":
        w = jax.random.normal(rng, (in_dim, out_dim), jnp.float32) \
            * (out_dim ** -0.5)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(params: dict, x: jax.Array,
           compute_dtype: jnp.dtype | None = None) -> jax.Array:
    """Returns the CALLER's input dtype (matching gehring_linear's
    contract) even when compute_dtype downcasts the matmul internally."""
    out_dtype = x.dtype
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(out_dtype)


def init_gehring_linear(rng: jax.Array, in_dim: int, out_dim: int,
                        dropout: float = 0.0, bias: bool = True,
                        weight_norm: bool = True) -> dict:
    """Gehring init: w ~ N(0, sqrt((1-dropout)/in_dim)); weight-norm split.

    Weight-norm follows torch's default dim=0 semantics: the norm is taken
    per *output* row. We store v as [in_dim, out_dim] so the norm is over
    axis 0, and g has shape [out_dim].
    """
    std = ((1.0 - dropout) / in_dim) ** 0.5
    v = jax.random.normal(rng, (in_dim, out_dim), jnp.float32) * std
    p: dict = {}
    if weight_norm:
        g = jnp.linalg.norm(v, axis=0)  # torch init: g = ||v|| so w == v
        p["v"] = v
        p["g"] = g
    else:
        p["w"] = v
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def gehring_weight(params: dict) -> jax.Array:
    """Materialize the effective weight of a (possibly weight-normed) layer."""
    if "w" in params:
        return params["w"]
    v = params["v"]
    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
    return params["g"] * v / jnp.maximum(norm, 1e-12)


def gehring_linear(params: dict, x: jax.Array,
                   compute_dtype: jnp.dtype | None = None) -> jax.Array:
    w = gehring_weight(params)
    if compute_dtype is not None:
        x_c = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    else:
        x_c = x
    y = jnp.dot(x_c, w, preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(x.dtype)
