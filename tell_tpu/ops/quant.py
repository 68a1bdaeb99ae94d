"""Dynamic int8 (w8a8) matmul quantization for frozen towers.

The frozen RoBERTa-large article encode is both the serving e2e tax and
roughly half of the train step (ARCHITECTURE.md: 46.4 ms of the 73.4 ms
reference-shape batch), and at production batch it is MXU-COMPUTE-bound,
not HBM-bound — so weight-only int8 would not speed it up. This module
quantizes BOTH sides of the big dense matmuls:

* weights: per-output-channel symmetric int8, quantized ONCE offline
  (`quantize_roberta`) — the tower is frozen, so there is no requant cost
  per step and no gradient path to preserve;
* activations: per-row (per-token) dynamic symmetric int8, computed
  inside the jitted encode (an elementwise amax/scale chain XLA fuses
  into the surrounding ops);
* the contraction runs int8 x int8 -> int32 on the MXU (v5e executes
  int8 matmuls at ~2x its bf16 FLOP rate), then the two scale vectors
  factor back out in fp32: y = (xq @ wq) * sx[:,None] * sw[None,:] + b.

The only approximation is the int8 rounding of x and w themselves
(~1e-2 relative per matmul). Like the int8 K/V cache and the approximate
top-k, the lever is machine-gated: bench.py measures teacher-forced
per-step argmax agreement of a decode over int8-encoded article features
vs bf16-encoded ones (enc8_token_agreement), and falls back below the
floor.

Reference: the frozen tower this accelerates is torch.hub
roberta.large, /root/reference/tell/models/transformer_faces_objects.py:49-59.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight_int8(w: jax.Array) -> dict:
    """w: [din, dout] -> {"q8": int8 [din, dout], "scale": f32 [dout]}.

    Per-output-channel symmetric scales: each column j is scaled by
    amax_j / 127, so the scale factors out of the contraction over din.
    """
    w32 = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=0)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale}


def quantize_act_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x: [..., din] -> (int8 values, f32 scales [..., 1]).

    Per-row (per-token) dynamic symmetric quantization — recomputed every
    call, which is what makes the scheme calibration-free for arbitrary
    inputs (the "dynamic" in w8a8 dynamic quant)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    """Dense layer with an int8-quantized weight dict ({"q8", "scale",
    "b"}): dynamic per-row activation quant, int8 MXU contraction, fp32
    rescale + bias. Returns x.dtype."""
    xq, sx = quantize_act_int8(x)
    y = jnp.dot(xq, p["q8"], preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * sx * p["scale"]
    if "b" in p:
        out = out + p["b"]
    return out.astype(x.dtype)


def is_quantized_dense(p: dict) -> bool:
    return isinstance(p, dict) and "q8" in p


def quantize_dense(p: dict) -> dict:
    """{"w", "b"} -> {"q8", "scale", "b"} (idempotent)."""
    if is_quantized_dense(p):
        return p
    out = quantize_weight_int8(p["w"])
    if "b" in p:
        out["b"] = jnp.asarray(p["b"], jnp.float32)
    return out


def quantize_roberta(params: dict) -> dict:
    """Quantize every per-layer dense matmul of a RoBERTa param pytree
    (q/k/v/attn_out/fc1/fc2) to int8; embeddings and LayerNorms stay fp.
    Idempotent. The encode path (`backbones/roberta.py::_lin`) dispatches
    on the leaf structure, so the quantized tower is a drop-in frozen
    tower everywhere one is accepted (train step, serving, bench)."""
    out = dict(params)
    out["layers"] = [
        {k: (quantize_dense(v) if k in ("q", "k", "v", "attn_out",
                                        "fc1", "fc2") else v)
         for k, v in layer.items()}
        for layer in params["layers"]]
    return out


def map_tree_preserving_quant(fn, tree):
    """jax.tree.map(fn, tree) that leaves int8-quantized dense sub-dicts
    ({"q8", "scale", ...}) UNTOUCHED — blanket f32->bf16 compute-dtype
    casts must not downcast the fp32 quant scales (a bf16 scale adds
    ~0.4% relative error on top of the int8 rounding for nothing)."""
    if isinstance(tree, dict):
        if "q8" in tree:
            return tree
        return {k: map_tree_preserving_quant(fn, v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        out = [map_tree_preserving_quant(fn, v) for v in tree]
        return type(tree)(out)
    return fn(tree)


def enc8_enabled() -> bool:
    """TELL_TPU_ENC8=1 turns on the int8 frozen-encoder path in bench /
    serving / training tower builds. OPT-IN, and measured round 5 to be
    a THROUGHPUT LOSS at the production encode shapes (v5e-1, B=128
    x 512): 3.89 vs 3.54 ms/article bf16, train step 74.7 vs 74.1
    ms/batch — the per-row dynamic activation-quant chain (~0.35 ms per
    [65536, 1024] pass, tools/dec8_probe) costs more than the int8 MXU
    saves at K=1024 (bf16 already runs those matmuls at ~200 TF/s; int8
    only wins on the 1024x4096 leg). The accuracy gate PASSES (forced
    agreement 0.9785, BENCH_r05), so the lever remains available as a
    memory lever (halves the resident tower, 710 -> ~360 MB) for
    HBM-tight deployments; it is not a speed lever on this hardware."""
    from .kernels.dispatch import env_flag
    return env_flag("TELL_TPU_ENC8")


def maybe_quantize_frozen(frozen: dict) -> dict:
    """Apply the TELL_TPU_ENC8 lever to a frozen-towers dict: returns the
    dict with frozen["roberta"] int8-quantized when the lever is on.
    Call once at tower-load time (quantizing inside a jitted step would
    re-round 355M params per call)."""
    if not enc8_enabled() or "roberta" not in frozen:
        return frozen
    out = dict(frozen)
    out["roberta"] = quantize_roberta(frozen["roberta"])
    return out
