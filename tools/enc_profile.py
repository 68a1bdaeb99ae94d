"""Stage-level profile of the frozen RoBERTa-large article encode.

The full windowed encode at B=128/S=512 runs at ~87 effective TF/s while
its isolated matmuls run at 140-200 TF/s (tools/dec8_probe findings) —
this script attributes the ~2x gap: per-component slope timings of one
layer at the production token count, plus full-encode ablations
(all-hiddens stack on/off, flash on/off, exact vs tanh gelu).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BENCH_COMPILE_CACHE",
                                 "/tmp/tell_tpu_bench_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tell_tpu.models.backbones.roberta import (RobertaConfig, init_roberta,
                                               roberta_encode_windowed)

B = int(os.environ.get("B", "128"))
S = int(os.environ.get("S", "512"))
dtype = jnp.bfloat16
rcfg = RobertaConfig.large()
params = jax.tree.map(lambda x: x.astype(dtype)
                      if x.dtype == jnp.float32 else x,
                      init_roberta(jr.PRNGKey(0), rcfg))
ids = jr.randint(jr.PRNGKey(1), (B, S), 4, rcfg.vocab_size)
M = B * S


def chain(fn, a0, reps):
    c, _ = jax.lax.scan(lambda c, _: (fn(c), None), a0, None, length=reps)
    return c


def slope(name, fn, x, reps=8):
    hi_f = jax.jit(lambda a: chain(fn, a, reps))
    lo_f = jax.jit(lambda a: chain(fn, a, 1))
    float(jnp.sum(hi_f(x).astype(jnp.float32)))
    float(jnp.sum(lo_f(x).astype(jnp.float32)))

    def t(f):
        t0 = time.perf_counter()
        float(jnp.sum(f(x).astype(jnp.float32)))
        return time.perf_counter() - t0

    per = min((t(hi_f) - t(lo_f)) / (reps - 1) for _ in range(3))
    print(f"{name:44s} {per*1e3:9.3f} ms", flush=True)
    return per


# ---- full-encode ablations (per 128-article batch) ----
def time_full(name, all_hiddens):
    """Python-level chaining (bench_e2e methodology): each call's int ids
    are bumped by the previous call's scalar so dispatches serialize;
    scan-chaining would let XLA hoist the loop-invariant encode."""
    @jax.jit
    def f(p, ids_, bump):   # params as ARGS: closures bake into the HLO
        out = roberta_encode_windowed(
            p, rcfg, ids_ + bump, return_all_hiddens=all_hiddens)
        if all_hiddens:
            out = out.mean(axis=2)
        # value-dependent tiny int (can't be constant-folded; rounds to 0)
        return (out.astype(jnp.float32).ravel()[0] * 1e-9).astype(jnp.int32)

    def run_k(k):
        acc = jnp.zeros((), jnp.int32)
        for _ in range(k):
            acc = f(params, ids, acc)
        return int(acc)

    run_k(1)

    def t(k):
        t0 = time.perf_counter()
        run_k(k)
        return time.perf_counter() - t0

    per = min((t(4) - t(1)) / 3 for _ in range(3))
    print(f"{name:44s} {per*1e3:9.3f} ms", flush=True)


time_full("full windowed encode (all_hiddens)", True)
time_full("full windowed encode (final only)", False)

# ---- one layer's pieces at production token count ----
lp = params["layers"][0]
x = jr.normal(jr.PRNGKey(2), (M, 1024), dtype)
x4 = jr.normal(jr.PRNGKey(3), (M, 4096), dtype)
from tell_tpu.models.backbones.roberta import _apply_ln, _lin

slope("qkv (3 x 1024x1024)", lambda a: (
    _lin(lp["q"], a) + _lin(lp["k"], a) + _lin(lp["v"], a)), x)
slope("attn_out (1024x1024)", lambda a: _lin(lp["attn_out"], a), x)
slope("fc1 (1024x4096) [:, :1024]", lambda a: _lin(lp["fc1"], a)[:, :1024],
      x)
slope("fc2 (4096x1024) pad back", lambda a: jnp.pad(
    _lin(lp["fc2"], a), ((0, 0), (0, 3072))), x4)
slope("LN", lambda a: _apply_ln(lp["attn_ln"], a, rcfg.ln_eps), x,
      reps=32)
slope("gelu exact (4096 wide)", lambda a: jax.nn.gelu(
    a.astype(jnp.float32), approximate=False).astype(dtype), x4, reps=16)
slope("gelu tanh (4096 wide)", lambda a: jax.nn.gelu(
    a.astype(jnp.float32), approximate=True).astype(dtype), x4, reps=16)

# flash attention leg at the window shape
Bw, H, hd = B, rcfg.num_heads, 64
q = jr.normal(jr.PRNGKey(4), (Bw, H, S, hd), dtype)
from jax.experimental.pallas.ops.tpu.flash_attention import (SegmentIds,
                                                             flash_attention)
from tell_tpu.models.backbones.roberta import _flash_block_sizes
seg = jnp.ones((Bw, S), jnp.int32)


def fl(qq):
    return flash_attention(qq, q, q, segment_ids=SegmentIds(q=seg, kv=seg),
                           sm_scale=0.125,
                           block_sizes=_flash_block_sizes(S))


slope("flash attention (one layer)", fl, q)
