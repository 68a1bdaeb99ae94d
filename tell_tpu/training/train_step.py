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
                    donate: bool = True,
                    loss: "Callable" = None,
                    loss_e2e: "Callable" = None):
    """Returns step(params, opt_state, batch, rng) -> (params', opt', metrics).

    `frozen` carries the frozen-tower params (RoBERTa/ResNet); when given,
    the step encodes raw context_ids/images on-device before the loss.
    `loss`/`loss_e2e` override the captioner objective (model registry).
    """
    loss_f = loss or captioner_loss
    loss_e2e_f = loss_e2e or captioner_loss_e2e
    compute_dtype = getattr(getattr(cfg, "captioner", cfg), "compute_dtype",
                            "float32")

    def _cast(tree):
        if compute_dtype != "bfloat16":
            return tree
        # int8-quantized frozen-tower leaves (TELL_TPU_ENC8) keep their
        # fp32 scales through the blanket bf16 cast
        from ..ops.quant import map_tree_preserving_quant
        return map_tree_preserving_quant(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)

    # NOTE: a make-time `frozen` is kept for convenience on small towers,
    # but jit treats closure arrays as compile-time CONSTANTS — a frozen
    # RoBERTa-large baked into the HLO bloats the executable (and overflows
    # remote-compile transports). Pass the towers at CALL time instead:
    # step(params, opt, batch, rng, frozen=towers) — they ride as runtime
    # buffers like params do.
    frozen_c = _cast(frozen) if frozen is not None else None

    def step(params, opt_state, batch, rng, frozen=None):
        batch_c = _cast(batch)
        fz = frozen if frozen is not None else frozen_c

        def loss_fn(p):
            # bf16 compute / fp32 master params (apex O2 analogue,
            # callback_apex_trainer.py:121-129): the cast is inside the
            # grad so gradients flow back to the fp32 leaves
            p = _cast(p)
            if fz is not None:
                l, aux = loss_e2e_f(p, _cast(fz), cfg, batch_c,
                                    rng=rng, deterministic=False)
            else:
                l, aux = loss_f(p, cfg, batch_c, rng=rng,
                                deterministic=False)
            return l.astype(jnp.float32), aux

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
                   "sample_size": aux.get("sample_size", 0),
                   "tail_dropped": aux.get("tail_dropped", 0)}
        return new_params, new_opt, metrics

    return step
