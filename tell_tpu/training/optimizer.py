"""BertAdam-equivalent optimizer as an optax GradientTransformation.

The reference trains with AllenNLP's registered `bert_adam`
(/root/reference/tell/training/optimizers.py + flagship hyperparameters at
expt/nytimes/9_transformer_objects/config.yaml:126-149): lr 1e-4, 5% linear
warmup of t_total=437600 then linear decay, betas (0.9, 0.98), eps 1e-6,
decoupled weight decay 1e-5, per-parameter grad-norm clip 0.1, and — the part
that differs from vanilla Adam — NO bias correction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_linear(step: jax.Array, t_total: int, warmup: float) -> jax.Array:
    """lr multiplier: 0 -> 1 over warmup*t_total steps, then linear to 0."""
    t = jnp.asarray(step, jnp.float32)
    w = warmup * t_total
    warm = t / jnp.maximum(w, 1.0)
    decay = (t_total - t) / jnp.maximum(t_total - w, 1.0)
    return jnp.clip(jnp.where(t < w, warm, decay), 0.0, 1.0)


class BertAdamState(NamedTuple):
    step: jax.Array
    m: optax.Updates
    v: optax.Updates


def bert_adam(lr: float = 1e-4, b1: float = 0.9, b2: float = 0.98,
              eps: float = 1e-6, weight_decay: float = 1e-5,
              max_grad_norm: float = 0.1, t_total: int = 437600,
              warmup: float = 0.05) -> optax.GradientTransformation:
    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(jnp.zeros((), jnp.int32), zeros,
                             jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        assert params is not None, "bert_adam needs params for weight decay"

        def clip(g):
            if max_grad_norm <= 0:
                return g
            norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(norm, 1e-12))
            return g * scale.astype(g.dtype)

        grads = jax.tree.map(clip, grads)
        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g,
                         state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * jnp.square(g),
                         state.v, grads)
        mult = lr * warmup_linear(state.step, t_total, warmup)

        def upd(mm, vv, p):
            u = mm / (jnp.sqrt(vv) + eps)
            if weight_decay > 0:
                u = u + weight_decay * p
            return -mult * u

        updates = jax.tree.map(upd, m, v, params)
        return updates, BertAdamState(state.step + 1, m, v)

    return optax.GradientTransformation(init, update)
