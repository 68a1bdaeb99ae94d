"""Serving latency: wall-clock for one beam-5 decode micro-batch.

The north-star metric string (BASELINE.json) names p50 caption latency
alongside throughput. Real captions average ~15 tokens (docs/serving.md),
so a serving micro-batch's latency is ~GEN_LEN decode steps; this measures
the full jitted beam-search program at a fixed GEN_LEN (early-exit
disabled — the number is the deterministic upper bound for captions of
that length, and the p50 for a batch whose longest caption has that
length).

Slope timing as in bench.py: the tunneled chip's block_until_ready can
return early and device_get carries a fixed transfer cost, so we chain
REPS_HI vs REPS_LO calls through a scalar and difference.

Usage: env -u XLA_FLAGS python tools/latency_bench.py
       B=8 GEN_LEN=16 BEAM=5 python tools/latency_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

from tell_tpu.config import CaptionerConfig
from tell_tpu.models import init_captioner
from tell_tpu.models.beam import beam_search
from tell_tpu.models.captioner import build_contexts  # noqa: F401 (import check)

B = int(os.environ.get("B", "8"))
GEN_LEN = int(os.environ.get("GEN_LEN", "16"))
BEAM = int(os.environ.get("BEAM", "5"))
S = int(os.environ.get("S", "512"))
REPS_HI, REPS_LO = 6, 1


def main():
    import dataclasses
    cfg = dataclasses.replace(CaptionerConfig(), gen_len=GEN_LEN)
    dtype = jnp.bfloat16
    params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    ks = jr.split(jr.PRNGKey(1), 8)
    batch = {
        "image_grid": jr.normal(ks[0], (B, 49, 2048), dtype),
        "article": jr.normal(ks[1], (B, S, 1024), dtype),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jr.normal(ks[2], (B, 4, 512), dtype),
        "obj_embeds": jr.normal(ks[3], (B, 64, 2048), dtype),
    }

    def one(params, batch, bump):
        b = dict(batch)
        b["article"] = b["article"] + bump.astype(b["article"].dtype)
        out = beam_search(params, cfg, b, beam_size=BEAM, early_stop=False)
        return out["scores"].sum()

    def chain(params, batch, n_scalar, reps):
        def body(c, _):
            return one(params, batch, c * 1e-9), None
        c, _ = jax.lax.scan(body, n_scalar, None, length=reps)
        return c

    # separate jits per rep count (static scan length)
    hi = jax.jit(lambda p, b, s: chain(p, b, s, REPS_HI))
    lo = jax.jit(lambda p, b, s: chain(p, b, s, REPS_LO))
    s0 = jnp.zeros((), jnp.float32)
    float(hi(params, batch, s0))  # compile + warm
    float(lo(params, batch, s0))

    def t(fn):
        t0 = time.perf_counter()
        float(fn(params, batch, s0))
        return time.perf_counter() - t0

    best = min((t(hi) - t(lo)) / (REPS_HI - REPS_LO) for _ in range(3))
    ms = best * 1e3
    print(f"B={B} beam={BEAM} gen_len={GEN_LEN} S={S}: "
          f"{ms:.1f} ms per micro-batch "
          f"({ms / GEN_LEN:.2f} ms/step, {B / best:.1f} captions/s)")


if __name__ == "__main__":
    main()
