"""A/B the frozen-encoder perf levers at the e2e bench shape (B=128).

Arms via ARMS env (comma list): base, tanh (TELL_TPU_FAST_GELU),
fb256/fb128 (TELL_TPU_FLASH_BLOCK), enc8, and + combos, e.g.
ARMS="base,tanh,fb256,tanh+fb256".
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

SET = {
    "tanh": ("TELL_TPU_FAST_GELU", "tanh"),
    "fb256": ("TELL_TPU_FLASH_BLOCK", "256"),
    "fb128": ("TELL_TPU_FLASH_BLOCK", "128"),
    "noflash": ("TELL_TPU_FUSED", "0"),
    "fbb4": ("TELL_TPU_FLASH_BLOCK_B", "4"),
    "fbb8": ("TELL_TPU_FLASH_BLOCK_B", "8"),
    "enc8": ("TELL_TPU_ENC8", "1"),
}
ALL_VARS = sorted({v for v, _ in SET.values()})


def measure(p):
    def f(pp, ids_, bump):
        out = roberta_encode_windowed(pp, rcfg, ids_ + bump,
                                      return_all_hiddens=True)
        # FULL reduction: a single-element dependency lets XLA dead-code
        # the 24 transformer layers (the stack's first slice is the
        # embedding output)
        return (jnp.sum(out.astype(jnp.float32)) * 1e-12
                ).astype(jnp.int32)

    jf = jax.jit(f)

    def run_k(k):
        acc = jnp.zeros((), jnp.int32)
        for _ in range(k):
            acc = jf(p, ids, acc)
        return int(acc)

    t0 = time.perf_counter()
    run_k(1)
    comp = time.perf_counter() - t0

    def t(k):
        t0 = time.perf_counter()
        run_k(k)
        return time.perf_counter() - t0

    per = min((t(4) - t(1)) / 3 for _ in range(3))
    return per, comp


for combo in os.environ.get("ARMS", "base,tanh,fb256").split(","):
    parts = [p for p in combo.strip().split("+") if p and p != "base"]
    for v in ALL_VARS:
        os.environ.pop(v, None)
    p = params
    for part in parts:
        var, val = SET[part]
        os.environ[var] = val
    if "enc8" in parts:
        from tell_tpu.ops.quant import quantize_roberta
        p = quantize_roberta(params)
    per, comp = measure(p)
    print(f"ARM {combo.strip():16s} {per*1e3:8.1f} ms/batch "
          f"({per/B*1e3:6.3f} ms/article, compile {comp:.0f}s)",
          flush=True)
