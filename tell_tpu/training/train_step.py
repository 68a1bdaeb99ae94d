"""Jittable training step.

Replaces CallbackApexTrainer's batch_loss/backward/step
(/root/reference/tell/training/callback_apex_trainer.py:179-247):
value_and_grad over the captioner loss, BertAdam update, and the reference's
NaN-batch skip (:225-227) expressed as a lax-level where — a NaN/Inf loss
leaves params and optimizer state untouched instead of host-side control
flow. Mixed precision is bf16 compute with fp32 params and fp32 loss
(replacing apex AMP O2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import CaptionerConfig
from ..models.captioner import captioner_loss, captioner_loss_e2e


def init_train_state(rng: jax.Array, cfg: CaptionerConfig,
                     optimizer: optax.GradientTransformation):
    from ..models import init_captioner
    params = init_captioner(rng, cfg)
    opt_state = optimizer.init(params)
    return params, opt_state


def make_train_step(cfg: CaptionerConfig,
                    optimizer: optax.GradientTransformation,
                    frozen: dict | None = None,
                    donate: bool = True):
    """Returns step(params, opt_state, batch, rng) -> (params', opt', metrics).

    `frozen` carries the frozen-tower params (RoBERTa/ResNet); when given,
    the step encodes raw context_ids/images on-device before the loss.
    """

    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            if frozen is not None:
                loss, aux = captioner_loss_e2e(p, frozen, cfg, batch,
                                               rng=rng, deterministic=False)
            else:
                loss, aux = captioner_loss(p, cfg, batch, rng=rng,
                                           deterministic=False)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)

        updates, new_opt = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        # NaN-loss batches are skipped (reference :225-227). Keep old state.
        ok = jnp.isfinite(loss)
        new_params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_params, params)
        new_opt = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt, opt_state)

        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "skipped": (~ok).astype(jnp.int32),
                   "sample_size": aux["sample_size"],
                   "tail_dropped": aux.get("tail_dropped", 0)}
        return new_params, new_opt, metrics

    return step
