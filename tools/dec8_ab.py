"""A/B the decode-perf levers at the flagship bench shape, one process.

Each combo re-traces (env levers are read at trace time), so every arm
pays its own compile (persistent cache makes reruns free). Slope-timed
exactly like bench.py. COMBOS env var picks arms, e.g.
COMBOS="base,sm,dec8,sm+dec8".
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

from tell_tpu.config import CaptionerConfig
from tell_tpu.models import init_captioner

B = int(os.environ.get("B", "128"))
BEAM = int(os.environ.get("BEAM", "5"))
GEN_LEN = int(os.environ.get("GEN_LEN", "100"))
S = int(os.environ.get("S", "512"))

LEVERS = {"sm": "TELL_TPU_DEC8_SM", "dec8": "TELL_TPU_DEC8"}
# ("og" one-hot gather arm removed with the lever: measured 272.6 vs 334.7
#  captions/s and deleted — models/decoder.py round-5 note)

import dataclasses
cfg = dataclasses.replace(CaptionerConfig(), gen_len=GEN_LEN)
dtype = jnp.bfloat16
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


def measure() -> float:
    from tell_tpu.models.beam import beam_search

    gen = jax.jit(lambda p, b, bump: beam_search(
        p, cfg, {**b, "article": b["article"] + bump.astype(dtype)},
        beam_size=BEAM, early_stop=False)["scores"].sum())

    def run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for i in range(k):
            acc = acc + gen(params, batch, acc * 0 + i)
        return float(acc)

    t0 = time.perf_counter()
    run_k(1)
    compile_s = time.perf_counter() - t0

    def t(k):
        t0 = time.perf_counter()
        run_k(k)
        return time.perf_counter() - t0

    lo = min(t(1) for _ in range(2))
    hi = min(t(4) for _ in range(2))
    dt = (hi - lo) / 3
    return B / dt, compile_s


combos = os.environ.get("COMBOS", "base,og,sm,sm+og").split(",")
for combo in combos:
    parts = [p for p in combo.strip().split("+") if p and p != "base"]
    for v in LEVERS.values():
        os.environ.pop(v, None)
    for p in parts:
        os.environ[LEVERS[p]] = "1"
    cps, comp = measure()
    print(f"ARM {combo.strip():16s} {cps:8.1f} captions/s  "
          f"(compile {comp:.0f}s)", flush=True)
