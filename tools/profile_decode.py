"""Ablation profiling of the decode step on the real chip."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp, jax.random as jr
from tell_tpu.config import CaptionerConfig
from tell_tpu.models import init_captioner
from tell_tpu.models.captioner import build_contexts
from tell_tpu.models.decoder import (init_decode_state, decoder_step,
                                     decoder_top_k)

B = int(os.environ.get("B", "320"))  # batch (captions)
K = int(os.environ.get("K", "1"))    # beam width (rows = B * K)
S = int(os.environ.get("S", "512"))
STEPS = 100
dtype = jnp.bfloat16

cfg = CaptionerConfig()
dcfg = cfg.decoder
params = init_captioner(jr.PRNGKey(0), cfg)
params = jax.tree.map(lambda x: x.astype(dtype)
                      if x.dtype == jnp.float32 else x, params)
ks = jr.split(jr.PRNGKey(1), 8)
batch = {
    "image_grid": jr.normal(ks[0], (B, 49, 2048), dtype),
    "article": jr.normal(ks[1], (B, S, 1024), dtype),
    "article_mask": jnp.zeros((B, S), bool),
    "face_embeds": jr.normal(ks[2], (B, 4, 512), dtype),
    "obj_embeds": jr.normal(ks[3], (B, 64, 2048), dtype),
}
contexts = build_contexts(params, cfg, batch)
state = init_decode_state(params["decoder"], dcfg, contexts, B, beam=K,
                          dtype=dtype)
R = B * K  # decode rows


def timeit(name, fn, *args):
    """Slope timing (see bench.py): on tunneled devices block_until_ready
    can return early and device_get carries a large fixed transfer cost, so
    we difference k=5 vs k=1 executions CHAINED through a scalar (each call
    consumes the previous result, forcing serialization) with one scalar
    fetch at the end."""
    def run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            out = fn(*args, acc)
            acc = jnp.asarray(out).astype(jnp.float32).sum()
        return float(acc)
    run_k(1)
    lo = min((lambda t0=time.perf_counter(): (run_k(1), time.perf_counter()-t0)[1])() for _ in range(2))
    hi = min((lambda t0=time.perf_counter(): (run_k(5), time.perf_counter()-t0)[1])() for _ in range(2))
    per = (hi - lo) / 4
    print(f"{name:40s} {per*1000:9.1f} ms  ({per*1000/STEPS:6.2f} ms/step)")


@jax.jit
def scan_step_only(params, state, bump):
    kv = state.pop("kv")
    et = state.pop("embed_table")
    def step(carry, _):
        toks, st = carry
        feats, st, _ = decoder_step(params["decoder"], dcfg, toks,
                                    {**st, "kv": kv, "embed_table": et})
        st = {k: v for k, v in st.items()
              if k not in ("kv", "embed_table")}
        return (toks, st), feats[:, 0]
    seed = jnp.zeros((R,), jnp.int32) + bump.astype(jnp.int32)
    (_, st), outs = jax.lax.scan(step, (seed, state), None, length=STEPS)
    return outs


@jax.jit
def scan_step_topk(params, state, bump):
    kv = state.pop("kv")
    et = state.pop("embed_table")
    def step(carry, _):
        toks, st = carry
        feats, st, _ = decoder_step(params["decoder"], dcfg, toks,
                                    {**st, "kv": kv, "embed_table": et})
        st = {k: v for k, v in st.items()
              if k not in ("kv", "embed_table")}
        lp, ids = decoder_top_k(params["decoder"], dcfg, feats, 5)
        return (ids[:, 0].astype(jnp.int32), st), lp[:, 0]
    seed = jnp.zeros((R,), jnp.int32) + bump.astype(jnp.int32)
    (_, st), outs = jax.lax.scan(step, (seed, state), None, length=STEPS)
    return outs


@jax.jit
def scan_topk_only(params, feats, bump):
    def step(carry, _):
        lp, ids = decoder_top_k(params["decoder"], dcfg, carry, 5)
        return carry + lp[:, :1].astype(carry.dtype), lp[:, 0]
    _, outs = jax.lax.scan(step, feats + bump.astype(feats.dtype), None,
                           length=STEPS)
    return outs


@jax.jit
def scan_conv_chain_only(params, state, bump):
    """decoder_step minus the attention/context block: isolates the
    conv+projection+FFN per-row chain (attention replaced by identity)."""
    from tell_tpu.ops.common import glu, layer_norm
    from tell_tpu.ops.dynamic_conv import dynamic_conv_step
    from tell_tpu.ops.linear import gehring_linear
    et = state.pop("embed_table")
    state.pop("kv")

    def step(carry, _):
        toks, st = carry
        x = jnp.take(et, toks, axis=0)
        new_conv = []
        for i, (lp, k) in enumerate(zip(params["decoder"]["layers"],
                                        dcfg.kernel_sizes)):
            residual = x
            h = gehring_linear(lp["linear1"], x)
            h = glu(h)
            h, buf = dynamic_conv_step(lp["conv"], h, st["conv"][i],
                                       kernel_size=k,
                                       num_heads=dcfg.num_heads,
                                       weight_softmax=dcfg.weight_softmax)
            new_conv.append(buf)
            h = gehring_linear(lp["linear2"], h)
            h = layer_norm(lp["conv_ln"], residual + h)
            # context_fc on tiled h stands in for the concat of branches
            h = gehring_linear(lp["context_fc"],
                               jnp.tile(h, (1, len(dcfg.contexts))))
            residual = h
            h = jax.nn.relu(gehring_linear(lp["fc1"], h))
            h = gehring_linear(lp["fc2"], h)
            x = layer_norm(lp["final_ln"], residual + h)
        st = {"conv": new_conv, "step": st["step"] + 1}
        return (toks, st), x[:, 0]

    seed = jnp.zeros((R,), jnp.int32) + bump.astype(jnp.int32)
    (_, st), outs = jax.lax.scan(
        step, (seed, {"conv": state["conv"], "step": state["step"]}), None,
        length=STEPS)
    return outs


feats0 = jr.normal(ks[4], (R, 1024), dtype)
print(f"B={B} K={K} S={S} rows={R}")
timeit("decoder_step only x100", scan_step_only, params, state)
timeit("decoder_step + top_k x100", scan_step_topk, params, state)
timeit("adaptive top_k only x100", scan_topk_only, params, feats0)
timeit("conv/proj/FFN chain only x100", scan_conv_chain_only, params, state)
