"""Benchmark: flagship-captioner generation throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference generates the NYTimes800k test set at ~2.8
captions/sec on a Titan V (greedy, batch 16; README.md:168-169, see
BASELINE.md). We measure the same work: full-length greedy decode
(gen_len=100 steps — no early exit, conservative) of the 4-context
transformer_faces_objects-sized decoder, context features precomputed
(the reference also encodes contexts once per article before its decode
loop).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import jax.random as jr

from tell_tpu.config import CaptionerConfig
from tell_tpu.models import init_captioner
from tell_tpu.models.captioner import generate

# Default batch 128: measured best beam-5 throughput on v5e-1 (64: 234.5,
# 128: 258.6, 256: 206.9 captions/s — per-row KV streaming overtakes batch
# amortization past ~128).
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
GEN_LEN = int(os.environ.get("BENCH_GEN_LEN", "100"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
BEAM = int(os.environ.get("BENCH_BEAM", "5"))
BASELINE_CAPTIONS_PER_SEC = 2.8


def _bumped(batch, bump):
    b = dict(batch)
    b["article"] = b["article"] + bump.astype(b["article"].dtype)
    return b


def _t(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return time.perf_counter() - t0


def _device_watchdog(timeout_s: float) -> "threading.Event":
    """Fail loud instead of hanging forever if the TPU tunnel is wedged.

    The axon PJRT client-create blocks indefinitely when the pool grant is
    stuck (observed after killed-mid-claim clients); a bench that never
    prints is worse than one that reports the outage. A daemon thread
    os._exit(1)s with a diagnostic on stderr once `timeout_s` passes
    without the backend coming up; disarmed as soon as jax.devices()
    returns."""
    import threading
    armed = threading.Event()
    if timeout_s <= 0:       # conventional "disable the watchdog"
        return armed

    def bail():
        if not armed.wait(timeout_s):
            print(f"bench: no TPU backend within {timeout_s:.0f}s "
                  "(tunnel wedged?) — aborting", file=sys.stderr,
                  flush=True)
            os._exit(1)

    threading.Thread(target=bail, daemon=True).start()
    return armed


def bench_train():
    """BENCH_TRAIN=1: slope-time the FULL jitted train step — frozen
    RoBERTa-large article encode + 4-context decoder fwd/bwd + BertAdam —
    at the reference batch shape (16 instances x 512 context tokens,
    config.yaml:106-110). Baseline: ~590 ms/batch on a Titan V (43 min /
    4376 batches, expt/nytimes/9_transformer_objects/config.yaml:130).

    Single-chip measurement; multi-chip projections assume linear DP
    scaling over the "data" mesh axis (unmeasured here — one real chip),
    stated explicitly in the "note" field.
    """
    import dataclasses

    from tell_tpu.models.backbones.roberta import RobertaConfig, init_roberta
    from tell_tpu.training import bert_adam, make_train_step

    B, S, T = 16, 512, 32
    BASELINE_MS = 590.0
    cfg = CaptionerConfig()
    cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    dcfg = cfg.decoder

    rcfg = RobertaConfig.large()
    frozen = {"roberta": init_roberta(jr.PRNGKey(0), rcfg),
              "roberta_cfg": rcfg}
    params = init_captioner(jr.PRNGKey(1), cfg)
    optimizer = bert_adam(t_total=437600)
    opt_state = optimizer.init(params)

    ks = jr.split(jr.PRNGKey(2), 8)
    caption = jr.randint(ks[4], (B, T), 4, dcfg.vocab_size)
    caption = caption.at[:, 0].set(dcfg.bos_id)
    caption = caption.at[:, -1].set(dcfg.eos_id)
    batch = {
        # raw BPE ids: the step runs the frozen RoBERTa encode on-device
        "context_ids": jr.randint(ks[0], (B, S), 4, rcfg.vocab_size),
        "image_grid": jr.normal(ks[1], (B, 49, 2048)),
        "face_embeds": jr.normal(ks[2], (B, 4, 512)),
        "obj_embeds": jr.normal(ks[3], (B, 64, 2048)),
        "caption_ids": caption,
    }

    step = jax.jit(make_train_step(cfg, optimizer))

    def run_k(k):
        p, o = params, opt_state
        m = None
        for i in range(k):
            p, o, m = step(p, o, batch, jr.fold_in(jr.PRNGKey(3), i),
                           frozen)
        return float(m["loss"])  # one scalar device_get forces completion

    run_k(1)  # compile warmup
    k_lo, k_hi = 1, 1 + max(REPS, 2)
    lo = min(_t(run_k, k_lo) for _ in range(2))
    hi = min(_t(run_k, k_hi) for _ in range(2))
    ms = 1000.0 * (hi - lo) / (k_hi - k_lo)
    tokens = B * (S + T)
    print(json.dumps({
        "metric": "train_ms_per_batch_b%d_s%d" % (B, S),
        "value": round(ms, 2),
        "unit": "ms/batch (frozen RoBERTa fwd + decoder fwd/bwd + BertAdam)",
        "vs_baseline": round(BASELINE_MS / ms, 2),
        "tokens_per_sec": round(tokens / (ms / 1000.0), 1),
        "note": "single chip; multi-chip throughput assumes linear DP "
                "scaling over the data mesh axis (unmeasured: 1 real chip)",
    }))


def main():
    import dataclasses
    armed = _device_watchdog(float(os.environ.get("BENCH_DEVICE_TIMEOUT",
                                                  "900")))
    jax.devices()      # blocks here if the tunnel is wedged
    armed.set()
    if os.environ.get("BENCH_TRAIN") == "1":
        bench_train()
        return
    cfg = CaptionerConfig()
    cfg = dataclasses.replace(cfg, gen_len=GEN_LEN)
    dtype = jnp.bfloat16

    params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    B = BATCH
    ks = jr.split(jr.PRNGKey(1), 8)
    S = 512
    # The 25-layer weighted sum happens once at encode time (it is part of
    # the article encoder); the decode loop consumes the mixed features.
    batch = {
        "image_grid": jr.normal(ks[0], (B, 49, 2048), dtype),
        "article": jr.normal(ks[1], (B, S, 1024), dtype),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jr.normal(ks[2], (B, 4, 512), dtype),
        "obj_embeds": jr.normal(ks[3], (B, 64, 2048), dtype),
    }

    # Timing methodology: on this setup block_until_ready can return before
    # remote execution finishes and a device_get carries a large fixed
    # host-transfer cost, so we SLOPE-time: run the decode k_hi vs k_lo
    # times chained through a scalar (each call consumes the previous
    # call's result, forcing serialization), fetch one scalar at the end,
    # and divide the time difference by (k_hi - k_lo). The fixed transfer
    # and dispatch overheads cancel exactly.
    # early_stop=False: the bench contract is conservative full-length
    # decode (gen_len steps of work regardless of EOS)
    if BEAM <= 1:
        gen = jax.jit(lambda p, b, bump: generate(
            p, cfg, _bumped(b, bump), early_stop=False)["log_probs"].sum())
    else:
        from tell_tpu.models.beam import beam_search
        gen = jax.jit(lambda p, b, bump: beam_search(
            p, cfg, _bumped(b, bump), beam_size=BEAM,
            early_stop=False)["scores"].sum())

    def run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for i in range(k):
            acc = acc + gen(params, batch, acc * 0 + i)
        return float(acc)  # one tiny device_get forces completion

    run_k(1)  # compile + transfer-shape warmup
    k_lo, k_hi = 1, 1 + max(REPS, 2)
    lo = min(_t(run_k, k_lo) for _ in range(2))
    hi = min(_t(run_k, k_hi) for _ in range(2))
    dt = (hi - lo) / (k_hi - k_lo)
    cps = B / dt

    mode = "beam%d" % BEAM if BEAM > 1 else "greedy"
    print(json.dumps({
        "metric": "captions_per_sec_%s_b%d_len%d" % (mode, B, GEN_LEN),
        "value": round(cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(cps / BASELINE_CAPTIONS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
