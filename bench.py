"""Benchmark: flagship-captioner generation throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The HEADLINE metric is encode-INCLUSIVE end-to-end throughput: tokenized
BPE ids -> frozen windowed RoBERTa-large article encode (25-layer
weighted sum) -> full-length beam decode, two XLA programs dispatched
back-to-back. That is the like-for-like number against the reference's
2.8 captions/sec, whose wall-clock includes its article encode
(README.md:168-169, the eval loop encodes inside
tell/models/transformer_faces_objects.py:311-397). The same line carries:
  decode_only_captions_per_sec  the context-features-precomputed decode
                             rate (rounds 1-3's headline; the serving
                             engine sees this when articles are encoded
                             once and reused across requests)
  train_ms_per_batch_*       slope-timed full train step at the reference
                             batch shape, captured per-round in a
                             subprocess (device memory isolation);
                             BENCH_TRAIN_BUDGET_S caps its wall-clock
  p50_caption_latency_ms_*   slope-timed beam micro-batch latency
                             (BASELINE.json names p50 latency alongside
                             throughput)
  engine_latency_probe_*     continuous-batching engine under a steady
                             arrival stream: per-request p50/p95 latency
                             (submit -> result) at the stated offered
                             load — throughput is ARRIVAL-capped here
                             (engine_offered_load_* says by how much)
  engine_max_*               saturated engine capacity (all requests
                             queued upfront) at gen_len=100 — the
                             reference's caption cap
  kv_cache_mode / topk_mode  machine-checked A/Bs of the TPU-default
  + *_token_agreement        numerics levers (int8 K/V cache, approximate
                             per-cluster top-k) vs the exact fp path at
                             serving shapes, MIN over 3 batch seeds;
                             below BENCH_KV8_MIN / BENCH_TOPK_MIN the
                             bench FALLS BACK to the exact path for the
                             measurement and says so
Disable companions with BENCH_EXTRAS=0 (throughput-only line).

Baseline: the reference generates the NYTimes800k test set at ~2.8
captions/sec on a Titan V (greedy, batch 16; README.md:168-169, see
BASELINE.md) — tower-inclusive wall-clock. Decode work is conservative:
full-length decode (gen_len=100 steps, no early exit) of the 4-context
transformer_faces_objects-sized decoder.
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
    from tell_tpu.ops.quant import maybe_quantize_frozen
    frozen = maybe_quantize_frozen(
        {"roberta": jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x,
            init_roberta(jr.PRNGKey(0), rcfg)),
         "roberta_cfg": rcfg})
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


def _make_batch(B: int, S: int, dtype, key=1) -> dict:
    ks = jr.split(jr.PRNGKey(key), 8)
    # The 25-layer weighted sum happens once at encode time (it is part of
    # the article encoder); the decode loop consumes the mixed features.
    return {
        "image_grid": jr.normal(ks[0], (B, 49, 2048), dtype),
        "article": jr.normal(ks[1], (B, S, 1024), dtype),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jr.normal(ks[2], (B, 4, 512), dtype),
        "obj_embeds": jr.normal(ks[3], (B, 64, 2048), dtype),
    }


def numerics_agreement_gate(params, cfg, dtype) -> dict:
    """Machine-checked guard for the TPU-default decode-numerics levers —
    the int8 K/V cache and the approximate per-cluster top-k — measured as
    TEACHER-FORCED per-step token agreement: decode once greedy with both
    levers forced off (the exact fp path), then replay those exact tokens
    through each lever's decode path (models/captioner.py::predict_forced)
    and score each step's argmax against the exact path's choice.

    Free-running greedy agreement is the WRONG gate metric at the bench's
    random weights: logits are near-tie everywhere, so a single benign
    ~1%/step rounding flip rewrites the entire suffix — measured
    whole-sequence agreement swings 0.69-0.79 with the batch seed
    (ARCHITECTURE.md), indistinguishable from a half-broken kernel.
    Forced per-step agreement has no cascade: a healthy quantized path
    scores ~0.99 even at random margins, a broken one ~1/sqrt(V), so the
    floors (BENCH_KV8_MIN / BENCH_TOPK_MIN, default 0.95) can sit tight.
    Below a floor the bench FALLS BACK to the exact path for the measured
    run and says so. Caption-level agreement at TRAINED margins — the
    number deployments care about — is measured by the offline quality
    loop (QUALITY_r03.json ab_* entries, 1.00 at the overfit checkpoint)
    and per-deployment by `tnt serve --numerics-ab` with the shipped
    weights. Runs at serving shapes (B=16, len 32, production dims).

    Seed hardening: the measured margin over the 0.95 floor is thin at
    random weights (0.9785 in round 3), so the gate takes the MIN forced
    agreement over BENCH_GATE_SEEDS independent batches (keys 5/6/7...) —
    a borderline regression can't slip under the floor on one lucky batch.
    One ref-decode compile + one forced-decode compile per lever serve all
    seeds (same shapes), so the extra seeds cost only execution time."""
    import dataclasses

    from tell_tpu.models.captioner import generate, predict_forced
    import numpy as np

    B = min(16, BATCH)
    L = min(32, GEN_LEN)
    # Default seed base widened 3 -> 5 in round 5 (VERDICT r4 weak #3):
    # the kv8 min-seed margin over the 0.95 floor is structurally thin at
    # RANDOM weights (near-tie logits everywhere — the worst case the
    # bench can construct), and per-channel/asymmetric K quantization
    # cannot widen it there (random-weight K rows are symmetric and
    # channel-uniform, so finer scale axes gain ~nothing). The wider base
    # plus the published per-seed list makes a floor-trip interpretable:
    # margin history — r3 0.9785 (1 seed), r4 0.9688 (min of 3),
    # r5 carries min of 5 in kv8_agreement_per_seed. The number that
    # matters for deployments stays the TRAINED-margin A/B (1.00 caption
    # agreement, QUALITY_r04) and `tnt serve --numerics-ab`.
    n_seeds = int(os.environ.get("BENCH_GATE_SEEDS", "5"))
    gcfg = dataclasses.replace(cfg, gen_len=L)
    batches = [_make_batch(B, 512, dtype, key=5 + i) for i in range(n_seeds)]
    from tell_tpu.models.decoder import kv_cache_mode
    from tell_tpu.ops.adaptive import topk_mode

    levers = ("TELL_TPU_KV8", "TELL_TPU_APPROX_TOPK")
    prev = {v: os.environ.get(v) for v in levers}
    try:
        for v in levers:                  # exact fp reference decode
            os.environ[v] = "0"
        # one jitted program per phase: the env levers are read at trace
        # time, so the ref fn must be created (and first called) with both
        # levers off, and each forced fn with exactly its lever on
        ref_fn = jax.jit(lambda p, b: generate(
            p, gcfg, b, early_stop=False)["token_ids"])
        refs = [np.asarray(ref_fn(params, b)) for b in batches]
        lives = []
        for ref in refs:
            live = ref[:, 1:] != gcfg.decoder.pad_id  # finished rows: <pad>
            if not live.any():           # degenerate: all rows EOS at t=0
                live = np.ones_like(live)
            lives.append(live)

        def forced_agreement(var):
            os.environ[var] = "1"
            try:
                fn = jax.jit(lambda p, b, t: predict_forced(p, gcfg, b, t))
                per_seed = [
                    float((np.asarray(fn(params, b, ref)) == ref[:, 1:])
                          [live].mean())
                    for b, ref, live in zip(batches, refs, lives)]
            finally:
                os.environ[var] = "0"
            return per_seed

        agree = {var: forced_agreement(var) for var in levers}
    finally:
        for v in levers:
            if prev[v] is None:
                os.environ.pop(v, None)
            else:
                os.environ[v] = prev[v]

    res = {"gate_note": "token agreements are the MIN over %d batch seeds"
                        % n_seeds,
           "kv8_margin_history": "r3 0.9785 (1 seed), r4 0.9688 (min of "
                                 "3), r5+ min of 5 — random-weight worst "
                                 "case; trained-margin A/B is 1.00 "
                                 "(QUALITY_r04 ab_int8_kv)"}
    kv8_agree = min(agree["TELL_TPU_KV8"])
    res["kv8_agreement_per_seed"] = [round(a, 4)
                                     for a in agree["TELL_TPU_KV8"]]
    kv8_min = float(os.environ.get("BENCH_KV8_MIN", "0.95"))
    mode, fell_back = kv_cache_mode(), False
    if mode == "int8" and kv8_agree < kv8_min:
        os.environ["TELL_TPU_KV8"] = "0"   # fp for the measured run
        mode, fell_back = "fp", True
    res.update({"kv8_token_agreement": round(kv8_agree, 4),
                "kv8_gate_min": kv8_min,
                "kv_cache_mode": mode,
                "kv8_auto_fallback": fell_back})

    tk_agree = min(agree["TELL_TPU_APPROX_TOPK"])
    res["topk_agreement_per_seed"] = [round(a, 4)
                                      for a in agree["TELL_TPU_APPROX_TOPK"]]
    tk_min = float(os.environ.get("BENCH_TOPK_MIN", "0.95"))
    tmode, t_fell_back = topk_mode(), False
    if tmode == "approx" and tk_agree < tk_min:
        os.environ["TELL_TPU_APPROX_TOPK"] = "0"  # exact for the bench
        tmode, t_fell_back = "exact", True
    res.update({"approx_topk_token_agreement": round(tk_agree, 4),
                "topk_gate_min": tk_min,
                "topk_mode": tmode,
                "topk_auto_fallback": t_fell_back})
    return res


def bench_latency(params, cfg, dtype) -> dict:
    """p50 caption latency: wall-clock of ONE serving micro-batch (beam
    decode, fixed gen_len, early-exit disabled) — the deterministic upper
    bound for captions of that length and the p50 for a batch whose
    longest caption has it. Slope-timed (tools/latency_bench.py
    methodology): REPS_HI vs REPS_LO scan-chained executions through a
    scalar, one fetch, difference."""
    import dataclasses

    from tell_tpu.models.beam import beam_search
    from tell_tpu.models.captioner import generate

    B = int(os.environ.get("BENCH_LAT_B", str(min(8, BATCH))))
    L = int(os.environ.get("BENCH_LAT_LEN", str(min(16, GEN_LEN))))
    beam = BEAM
    lcfg = dataclasses.replace(cfg, gen_len=L)
    batch = _make_batch(B, 512, dtype, key=6)

    def one(p, b, bump):
        bb = dict(b)
        bb["article"] = bb["article"] + bump.astype(bb["article"].dtype)
        if beam > 1:
            return beam_search(p, lcfg, bb, beam_size=beam,
                               early_stop=False)["scores"].sum()
        return generate(p, lcfg, bb, early_stop=False)["log_probs"].sum()

    def chain(p, b, s, reps):
        c, _ = jax.lax.scan(lambda c, _: (one(p, b, c * 1e-9), None),
                            s, None, length=reps)
        return c

    reps_hi, reps_lo = 6, 1
    hi = jax.jit(lambda p, b, s: chain(p, b, s, reps_hi))
    lo = jax.jit(lambda p, b, s: chain(p, b, s, reps_lo))
    s0 = jnp.zeros((), jnp.float32)
    float(hi(params, batch, s0))   # compile + warm
    float(lo(params, batch, s0))

    def t(fn):
        t0 = time.perf_counter()
        float(fn(params, batch, s0))
        return time.perf_counter() - t0

    best = min((t(hi) - t(lo)) / (reps_hi - reps_lo) for _ in range(3))
    key = "p50_caption_latency_ms_beam%d_b%d_len%d" % (beam, B, L)
    return {key: round(best * 1e3, 2)}


def bench_engine(params, cfg, dtype) -> dict:
    """Sustained-load serving latency through the continuous-batching
    engine: a steady arrival stream (one request per BENCH_ENGINE_ARRIVAL
    ms) into a resident slot state; reports sustained captions/s and
    per-request p50 latency (submit -> future resolution, host wall-clock
    — the engine's report fetch IS a host transfer, so wall-clock is
    honest here, unlike device timing)."""
    import dataclasses

    import numpy as np
    from tell_tpu.serving.engine import DecodeEngine

    slots = int(os.environ.get("BENCH_ENGINE_SLOTS", "16"))
    L = int(os.environ.get("BENCH_ENGINE_LEN", str(min(16, GEN_LEN))))
    arrival = float(os.environ.get("BENCH_ENGINE_ARRIVAL", "15")) / 1e3
    n = int(os.environ.get("BENCH_ENGINE_N", str(4 * slots)))
    ecfg = dataclasses.replace(cfg, gen_len=L)
    eng = DecodeEngine(params, ecfg, slots=slots, beam=max(BEAM, 2),
                       chunk_steps=4, dtype=dtype)
    base = _make_batch(4, 512, dtype, key=7)
    reqs = [{k: v[i % 4:i % 4 + 1] for k, v in base.items()}
            for i in range(n)]
    eng.warm(reqs[0])           # AOT: every admit rung + chunk
    f = eng.submit(reqs[0])     # execution warm
    eng.run_until_drained()
    f.result(timeout=600)

    lat, t_sub = [], {}
    futs = []
    t0 = time.perf_counter()
    next_arrival, i = t0, 0
    while i < len(reqs) or any(not f.done() for f in futs):
        now = time.perf_counter()
        while i < len(reqs) and now >= next_arrival:
            fut = eng.submit(reqs[i])
            t_sub[id(fut)] = time.perf_counter()
            fut.add_done_callback(
                lambda f, ts=t_sub: lat.append(
                    time.perf_counter() - ts[id(f)]))
            futs.append(fut)
            next_arrival += arrival
            i += 1
        if not eng.tick() and i < len(reqs):
            time.sleep(max(0.0, next_arrival - time.perf_counter()))
    wall = time.perf_counter() - t0
    return {
        # LATENCY PROBE, not capacity: throughput here is capped by the
        # offered load (one arrival per `arrival` seconds), so the
        # captions/s it reports is ~1/arrival by construction whenever the
        # engine keeps up. The capacity number is engine_max_* below.
        "engine_latency_probe_captions_per_sec": round(n / wall, 1),
        "engine_offered_load_captions_per_sec": round(1.0 / arrival, 1),
        "engine_p50_latency_ms": round(
            float(np.percentile(np.asarray(lat), 50)) * 1e3, 1),
        "engine_p95_latency_ms": round(
            float(np.percentile(np.asarray(lat), 95)) * 1e3, 1),
        "engine_config": "slots%d_beam%d_len%d_arrival%.0fms" % (
            slots, max(BEAM, 2), L, arrival * 1e3),
    }


def bench_engine_saturated(params, cfg, dtype) -> dict:
    """Saturated engine capacity at the reference's caption cap
    (gen_len=100, transformer_faces_objects.py:407): ALL requests queued
    upfront so the measurement is compute-capped, not arrival-capped —
    this is the engine's max sustained captions/s. The steady-arrival
    numbers above measure latency under a specific offered load; this one
    answers "how much load can one chip absorb". Full curve (arrival
    sweep, slot sweep, overload behavior): tools/engine_capacity.py,
    docs/serving.md."""
    import dataclasses

    from tell_tpu.serving.engine import DecodeEngine

    # 128 slots x beam 5 = 640 rows, the micro-batch optimum shape; the
    # round-5 batched-admission + two-tier-harvest fixes made capacity
    # rise monotonically to there (31 -> 217.5 captions/s at 128 slots,
    # docs/serving.md)
    slots = int(os.environ.get("BENCH_ENGINE_CAP_SLOTS", "128"))
    L = int(os.environ.get("BENCH_ENGINE_CAP_LEN", "100"))
    n = int(os.environ.get("BENCH_ENGINE_CAP_N", str(4 * slots)))
    ecfg = dataclasses.replace(cfg, gen_len=L)
    eng = DecodeEngine(params, ecfg, slots=slots, beam=max(BEAM, 2),
                       chunk_steps=8, dtype=dtype)
    base = _make_batch(4, 512, dtype, key=9)
    reqs = [{k: v[i % 4:i % 4 + 1] for k, v in base.items()}
            for i in range(n)]
    eng.warm(reqs[0])           # AOT: every admit rung + chunk
    f = eng.submit(reqs[0])     # execution warm
    eng.run_until_drained()
    f.result(timeout=600)

    t0 = time.perf_counter()
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for f in futs:
        f.result(timeout=600)
    wall = time.perf_counter() - t0
    return {
        "engine_max_captions_per_sec_len%d" % L: round(n / wall, 2),
        "engine_max_config": "slots%d_beam%d_len%d_n%d_saturated" % (
            slots, max(BEAM, 2), L, n),
    }


def bench_engine_e2e(params, cfg, dtype, use_enc8: bool) -> dict:
    """ENCODE-INCLUSIVE engine capacity: N raw-token-id requests flow
    through the batched article encode (serving/encode_batcher.py, the
    serving path's encode coalescing) into the saturated continuous-
    batching engine, wall-clocked end to end. This is the number the
    serving deployment actually sustains per chip when every request pays
    its own RoBERTa-large encode — the honest counterpart of
    engine_max_* (which assumes pre-encoded features). The encode batches
    overlap the engine's decode chunks at the device queue (one chip:
    programs interleave; a disaggregated encode/decode mesh runs them on
    separate submeshes — __graft_entry__.dryrun_multichip's split-role
    leg). Reference: the worker's inline per-request encode,
    /root/reference/tell/tasks/captioner.py:146-176."""
    import dataclasses
    import threading

    from tell_tpu.models.backbones.roberta import (RobertaConfig,
                                                   init_roberta,
                                                   roberta_encode_windowed)
    from tell_tpu.models.captioner import weighted_layer_sum
    from tell_tpu.serving.encode_batcher import EncodeBatcher
    from tell_tpu.serving.engine import DecodeEngine

    slots = int(os.environ.get("BENCH_ENGINE_E2E_SLOTS",
                               os.environ.get("BENCH_ENGINE_CAP_SLOTS",
                                              "128")))
    L = int(os.environ.get("BENCH_ENGINE_E2E_LEN", "100"))
    n = int(os.environ.get("BENCH_ENGINE_E2E_N", str(4 * slots)))
    # encode batch 32 at saturation: all requests are queued upfront, so
    # deep coalescing is the deployment-accurate shape (serving default
    # --encode-batch 8 trades some of this for latency under light load;
    # B=8 encodes measured ~60 captions/s e2e vs engine_max 148 — small
    # encode batches underutilize the tower MXU)
    enc_b = int(os.environ.get("BENCH_ENGINE_E2E_ENCODE_BATCH", "32"))
    S = 512
    rcfg = RobertaConfig.large()
    roberta = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        init_roberta(jr.PRNGKey(30), rcfg))
    if use_enc8:
        from tell_tpu.ops.quant import quantize_roberta
        roberta = quantize_roberta(roberta)

    ecfg = dataclasses.replace(cfg, gen_len=L)
    eng = DecodeEngine(params, ecfg, slots=slots, beam=max(BEAM, 2),
                       chunk_steps=8, dtype=dtype)

    def encode_many(fr, p, batch):
        hid = roberta_encode_windowed(fr, rcfg, batch["context_ids"],
                                      return_all_hiddens=cfg.weigh_bert)
        art = weighted_layer_sum(p, hid) if cfg.weigh_bert else hid
        return {"article": art,
                "article_mask": batch["context_ids"] == rcfg.pad_id,
                **{k: v for k, v in batch.items() if k != "context_ids"}}

    encode_j = jax.jit(encode_many)
    batcher = EncodeBatcher(
        lambda b: encode_j(roberta, params, b), eng.submit,
        max_batch=enc_b, max_wait_ms=2.0)

    import numpy as np
    base = _make_batch(4, S, dtype, key=31)
    rest_np = {k: np.asarray(v) for k, v in base.items()
               if k not in ("article", "article_mask")}
    ids = np.asarray(jr.randint(jr.PRNGKey(32), (4, S), 4,
                                rcfg.vocab_size), np.int32)
    reqs = [{"context_ids": ids[i % 4:i % 4 + 1],
             **{k: v[i % 4:i % 4 + 1] for k, v in rest_np.items()}}
            for i in range(n)]

    stop = threading.Event()

    def tick_loop():
        while not stop.is_set():
            if not eng.tick():
                time.sleep(0.001)

    t = threading.Thread(target=tick_loop, daemon=True)
    t.start()
    try:
        # warm every compiled program: all encode-ladder rungs + all
        # admit rungs + chunk (one ladder burst through the batcher,
        # then AOT-compile the engine's remaining rungs)
        warm = [batcher.submit(reqs[i]) for i in range(min(enc_b, n))]
        enc1 = None
        for wf in warm:
            ef, enc1 = wf.result(timeout=900)
            ef.result(timeout=900)
        if enc1 is not None:
            eng.warm(enc1)

        t0 = time.perf_counter()
        outer = [batcher.submit(r) for r in reqs]
        eng_futs = [of.result(timeout=900)[0] for of in outer]
        for f in eng_futs:
            f.result(timeout=900)
        wall = time.perf_counter() - t0
    finally:
        stop.set()
        t.join(timeout=10)
        batcher.shutdown()
    return {
        "engine_e2e_captions_per_sec_len%d" % L: round(n / wall, 2),
        "engine_e2e_config": "slots%d_beam%d_len%d_n%d_encb%d_saturated"
                             % (slots, max(BEAM, 2), L, n, enc_b),
        "engine_e2e_note": "encode-INCLUSIVE: every request pays its "
                           "RoBERTa-large article encode through the "
                           "serving encode batcher",
    }


def bench_e2e(params, cfg, dtype) -> dict:
    """Encode-INCLUSIVE throughput: tokenized BPE ids -> frozen windowed
    RoBERTa-large encode -> beam decode, the pipeline a fresh request
    actually pays (models/captioner.py::encode_contexts runs the article
    encode on-device; serving/server.py feeds it per request). Two XLA
    programs, exactly like `tnt evaluate`'s split (commands/evaluate.py):
    the 25-layer weighted sum folds into the encode program so only the
    mixed [B,S,1024] features cross between them, and encode of batch n+1
    is dispatched before decode of batch n is fetched (async dispatch —
    no host gap; on one chip the programs serialize on-device).
    Slope-timed like the decode-only path. Towers are random-init
    (pretrained weights unreachable offline); weight values don't change
    the compute cost."""
    from tell_tpu.models.backbones.roberta import (RobertaConfig,
                                                   init_roberta,
                                                   roberta_encode_windowed)
    from tell_tpu.models.captioner import weighted_layer_sum

    B = int(os.environ.get("BENCH_E2E_BATCH", str(BATCH)))
    S = 512
    rcfg = RobertaConfig.large()
    roberta = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        init_roberta(jr.PRNGKey(9), rcfg))
    ids = jr.randint(jr.PRNGKey(10), (B, S), 4, rcfg.vocab_size)
    rest = {k: v for k, v in _make_batch(B, S, dtype, key=11).items()
            if k not in ("article", "article_mask")}

    def encode(fr, p, ids_, bump):
        hid = roberta_encode_windowed(fr, rcfg, ids_,
                                      return_all_hiddens=cfg.weigh_bert)
        art = weighted_layer_sum(p, hid) if cfg.weigh_bert else hid
        return (art + bump.astype(art.dtype),
                ids_ == rcfg.pad_id)

    encode_j = jax.jit(encode)

    # Encoder levers, gated exactly like the decode levers — teacher-
    # forced per-step argmax agreement of a decode over lever-encoded
    # article features vs the exact-encode path (decode numerics held
    # fixed, so the number isolates the encoder) — with auto-fallback.
    enc8_extras: dict = {}
    from tell_tpu.models.backbones.roberta import fast_gelu_mode
    from tell_tpu.ops.quant import enc8_enabled, quantize_roberta
    if fast_gelu_mode() == "tanh":     # TPU default since round 5
        agree = _encode_lever_agreement(
            params, cfg, roberta, roberta, encode, dtype,
            env_var="TELL_TPU_FAST_GELU", ref_val="erf", test_val="tanh")
        g_min = float(os.environ.get("BENCH_GELU_MIN", "0.95"))
        ok = agree >= g_min
        if not ok:                      # measured run falls back to erf
            os.environ["TELL_TPU_FAST_GELU"] = "erf"
        enc8_extras.update({
            "fast_gelu_token_agreement": round(agree, 4),
            "fast_gelu_gate_min": g_min,
            "fast_gelu_auto_fallback": not ok})
    enc8_extras["gelu_mode"] = fast_gelu_mode()
    if enc8_enabled():
        agree = _encode_lever_agreement(params, cfg, roberta,
                                        quantize_roberta(roberta), encode,
                                        dtype)
        enc8_min = float(os.environ.get("BENCH_ENC8_MIN", "0.95"))
        use_int8 = agree >= enc8_min
        enc8_extras.update({"enc8_token_agreement": round(agree, 4),
                            "enc8_gate_min": enc8_min,
                            "encoder_mode": "int8" if use_int8 else "bf16",
                            "enc8_auto_fallback": not use_int8})
        if use_int8:
            roberta = quantize_roberta(roberta)
    else:
        enc8_extras["encoder_mode"] = "bf16"
    if BEAM <= 1:
        decode_j = jax.jit(lambda p, b: generate(
            p, cfg, b, early_stop=False)["log_probs"].sum())
    else:
        from tell_tpu.models.beam import beam_search
        decode_j = jax.jit(lambda p, b: beam_search(
            p, cfg, b, beam_size=BEAM,
            early_stop=False)["scores"].sum())

    def run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            # decode output chains into the next encode's bump: forced
            # serialization, fixed dispatch overheads cancel in the slope
            art, mask = encode_j(roberta, params, ids, acc * 1e-9)
            acc = acc + decode_j(params, {**rest, "article": art,
                                          "article_mask": mask})
        return float(acc)

    run_k(1)  # compile + warm
    k_lo, k_hi = 1, 1 + max(REPS, 2)
    lo = min(_t(run_k, k_lo) for _ in range(2))
    hi = min(_t(run_k, k_hi) for _ in range(2))
    dt = (hi - lo) / (k_hi - k_lo)

    # encode-only ms/article (the tax the e2e line adds over decode-only;
    # with TELL_TPU_ENC8 this is the number the int8 encoder moves)
    def enc_k(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            art, _ = encode_j(roberta, params, ids, acc * 1e-9)
            acc = art.astype(jnp.float32).ravel()[0]
        return float(acc)

    enc_k(1)
    e_lo = min(_t(enc_k, k_lo) for _ in range(2))
    e_hi = min(_t(enc_k, k_hi) for _ in range(2))
    enc_dt = (e_hi - e_lo) / (k_hi - k_lo)
    return {"e2e_captions_per_sec": B / dt, "e2e_batch": B,
            "encode_ms_per_article": round(enc_dt / B * 1e3, 3),
            **enc8_extras}


def _encode_lever_agreement(params, cfg, ref_tower, test_tower, encode,
                            dtype, env_var: str | None = None,
                            ref_val: str = "", test_val: str = "") -> float:
    """Teacher-forced per-step argmax agreement of greedy decode over
    lever-encoded article features vs the reference-encode path (e.g.
    int8 tower vs bf16 tower, or tanh vs erf GELU via env_var). Decode
    numerics (K/V cache, top-k) are whatever is active for the measured
    run — both decodes share them, isolating the encoder lever. Same
    forced-agreement methodology as numerics_agreement_gate (a
    free-running comparison would cascade one near-tie flip into the
    whole suffix). Env levers are read at TRACE time, so each arm gets a
    fresh jit of the encode."""
    import dataclasses

    import numpy as np
    from tell_tpu.models.captioner import generate, predict_forced

    B, L, S = 16, 32, 512
    gcfg = dataclasses.replace(cfg, gen_len=L)
    from tell_tpu.models.backbones.roberta import RobertaConfig
    ids = jr.randint(jr.PRNGKey(21), (B, S), 4,
                     RobertaConfig.large().vocab_size)
    rest = {k: v for k, v in _make_batch(B, S, dtype, key=22).items()
            if k not in ("article", "article_mask")}
    zero = jnp.zeros((), jnp.float32)
    prev = os.environ.get(env_var) if env_var else None
    try:
        if env_var:
            os.environ[env_var] = ref_val
        art, mask = jax.jit(encode)(ref_tower, params, ids, zero)
        batch_fp = {**rest, "article": art, "article_mask": mask}
        ref = np.asarray(jax.jit(lambda p, b: generate(
            p, gcfg, b, early_stop=False)["token_ids"])(params, batch_fp))

        if env_var:
            os.environ[env_var] = test_val
        art_q, _ = jax.jit(encode)(test_tower, params, ids, zero)
        batch_q = {**rest, "article": art_q, "article_mask": mask}
        preds = np.asarray(jax.jit(lambda p, b, t: predict_forced(
            p, gcfg, b, t))(params, batch_q, ref))
    finally:
        if env_var:
            if prev is None:
                os.environ.pop(env_var, None)
            else:
                os.environ[env_var] = prev
    live = ref[:, 1:] != gcfg.decoder.pad_id
    if not live.any():
        live = np.ones_like(live)
    return float((preds == ref[:, 1:])[live].mean())


def bench_train_subprocess() -> dict:
    """Per-round train-step capture: run BENCH_TRAIN=1 in a subprocess
    (its params + optimizer state + fwd/bwd programs never share device
    memory with the decode benches) and merge its numbers into the main
    line. Runs BEFORE this process creates its own TPU client: the axon
    tunnel is nominally single-session, so the child must be the sole
    claimer while it lives. The child's own device watchdog (default
    900 s) is kept below BENCH_TRAIN_BUDGET_S (default 1200) so a wedged
    tunnel makes the child exit itself rather than be killed mid-claim
    (which can wedge the chip grant). On timeout/error the line records
    that instead of silently omitting the number (VERDICT r3 weak #4:
    opt-in train benches regress silently)."""
    import subprocess

    # 1800 s: the child measured 180-240 s typical, but one round-5 run
    # hit a slow tunnel period and blew the old 1200 s budget (recorded
    # as "timeout" while a standalone rerun measured 62.6 ms/batch fine)
    budget = float(os.environ.get("BENCH_TRAIN_BUDGET_S", "1800"))
    env = {**os.environ, "BENCH_TRAIN": "1"}
    env.setdefault("BENCH_DEVICE_TIMEOUT", "900")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=budget)
    except subprocess.TimeoutExpired:
        return {"train_bench": "timeout after %.0fs" % budget}
    if proc.returncode != 0:
        return {"train_bench": "failed rc=%d: %s" % (
            proc.returncode, proc.stderr.strip()[-300:])}
    try:
        line = proc.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        return {d["metric"]: d["value"],
                "train_tokens_per_sec": d.get("tokens_per_sec"),
                "train_vs_baseline": d.get("vs_baseline")}
    except (IndexError, KeyError, ValueError):
        # rc=0 but no parseable metric line: record it, don't abort the
        # whole bench (the docstring's contract)
        return {"train_bench": "unparseable child stdout: %r"
                               % proc.stdout.strip()[-200:]}


def bench_vision():
    """BENCH_VISION=1: the full serve-time vision path on-chip, per stage
    and end-to-end — raw JPEG -> host decode + letterbox/center-crop ->
    ResNet-152 grid + MTCNN/FaceNet faces + YOLOv3 objects + pooled-ResNet
    crop embeds -> beam-5 caption. Towers are random-init (pretrained
    weights unreachable offline); weight VALUES don't change the compute
    cost, so throughput is representative. Device stages are slope-timed
    (chained through an input bump); host stages are plain wall-clock
    (pure host work). Comparison points: the reference's serve path runs
    all of this per request in torch on GPU (tell/tasks/captioner.py:
    146-444, ~1 req/s anecdotally) and its offline YOLO pass took ~19 h
    per dataset (docs/getting_data.md:26-35)."""
    import dataclasses
    import io

    import numpy as np
    from PIL import Image

    from tell_tpu.models.backbones.facenet import (FaceNetConfig,
                                                   facenet_forward,
                                                   init_facenet)
    from tell_tpu.models.backbones.mtcnn import (MTCNNConfig, detect_faces,
                                                 extract_faces, init_mtcnn)
    from tell_tpu.models.backbones.resnet import (ResNetConfig, init_resnet,
                                                  preprocess_image,
                                                  resnet_forward)
    from tell_tpu.models.backbones.yolov3 import (crop_and_resize,
                                                  init_yolov3, nms_fixed,
                                                  yolov3_forward,
                                                  yolov3_spp_module_defs)
    from tell_tpu.models.beam import beam_search
    from tell_tpu.serving.vision import DET_CANVAS, center_crop_224, letterbox

    dtype = jnp.bfloat16
    # BENCH_VISION_TINY=1: resnet50 towers for CPU wiring smoke runs — the
    # full 152-layer compile takes tens of minutes on CPU XLA (TPU is fine)
    tiny = os.environ.get("BENCH_VISION_TINY") == "1"

    def log(msg):
        print(f"bench_vision: {msg}", file=sys.stderr, flush=True)

    def bf16(tree):
        return jax.tree.map(
            lambda x: x.astype(dtype) if getattr(x, "dtype", None)
            == jnp.float32 else x, tree)

    rcfg = ResNetConfig.resnet50() if tiny else ResNetConfig.resnet152()
    resnet = bf16(init_resnet(jr.PRNGKey(0), rcfg))
    # MTCNN/FaceNet stay fp32: the cascade's box math runs in fp32 and the
    # crops it emits are fp32 (conv args must share one dtype)
    mtcnn = init_mtcnn(jr.PRNGKey(1))
    facenet = init_facenet(jr.PRNGKey(2))
    defs = yolov3_spp_module_defs()
    yolo = bf16(init_yolov3(jr.PRNGKey(3), defs))

    # a realistic raw request: a 1024x683 JPEG (NYT images are ~2048 wide;
    # the reference's pipeline resizes to <=500 before storage)
    rng = np.random.default_rng(0)
    img_arr = (rng.random((683, 1024, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img_arr).save(buf, format="JPEG", quality=90)
    raw = buf.getvalue()

    # --- host stage: JPEG decode + letterbox + center-crop ---
    def host_stage():
        im = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"),
                        np.float32)
        return center_crop_224(im), letterbox(im, DET_CANVAS)[0]

    host_stage()
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        img224, canvas = host_stage()
    host_ms = (time.perf_counter() - t0) / reps * 1e3

    # --- device stages, each jitted at its serve shape ---
    def grid_fn(img):
        x = preprocess_image(img[None].astype(dtype) / 255.0)
        return resnet_forward(resnet, rcfg, x, pool=False)[0]

    def faces_fn(canvas):
        boxes, probs, valid = detect_faces(
            mtcnn, canvas, MTCNNConfig(max_faces=4))
        crops = extract_faces(canvas, boxes)
        emb = facenet_forward(facenet, FaceNetConfig(), crops)
        return jnp.where(valid[:, None], emb, jnp.nan)

    def objects_fn(canvas):
        dets = yolov3_forward(yolo, defs, canvas[None].astype(dtype)
                              / 255.0)[0]
        boxes, scores, valid = nms_fixed(dets, 0.3, 0.6, max_det=64)
        crops = crop_and_resize(canvas, boxes, 224)
        x = preprocess_image(crops.astype(dtype) / 255.0)
        emb = resnet_forward(resnet, rcfg, x, pool=True)
        return jnp.where(valid[:, None], emb, jnp.nan)

    def slope_time(fn, arg, reps_hi=6):
        """One compiled program per stage, chained at the Python level
        through an input bump (each dispatch consumes the previous
        scalar, forcing serialization); fetch one scalar at the end;
        difference hi vs lo rep counts — fixed transfer/dispatch
        overheads cancel, same methodology as the throughput bench."""
        jfn = jax.jit(lambda a, s: jnp.sum(
            fn(a + s * 1e-9).astype(jnp.float32)) * 1e-12)
        a = jnp.asarray(arg)

        def run_k(k):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                acc = jfn(a, acc)
            return float(acc)

        def timed(k):
            t0 = time.perf_counter()
            run_k(k)
            return time.perf_counter() - t0

        run_k(1)   # compile + warm
        return min((timed(reps_hi) - timed(1)) / (reps_hi - 1)
                   for _ in range(3)) * 1e3

    log(f"host stage {host_ms:.1f} ms; timing grid...")
    grid_ms = slope_time(grid_fn, img224)
    log(f"grid {grid_ms:.1f} ms; timing faces...")
    faces_ms = slope_time(faces_fn, canvas)
    log(f"faces {faces_ms:.1f} ms; timing objects...")
    objects_ms = slope_time(objects_fn, canvas)
    log(f"objects {objects_ms:.1f} ms; timing caption...")

    # --- caption stage: beam-5 decode at the serve micro-shape (B=1) ---
    cfg = dataclasses.replace(CaptionerConfig(),
                              gen_len=int(os.environ.get("BENCH_VISION_LEN",
                                                         "16")))
    params = init_captioner(jr.PRNGKey(4), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    batch = _make_batch(1, 512, dtype, key=8)

    # params and batch must be jit ARGUMENTS, not closures: closed-over
    # arrays bake into the HLO as constants and overflow the remote-compile
    # transport (HTTP 413) at captioner dims
    jcap = jax.jit(lambda p, b, grid1, s: jnp.sum(beam_search(
        p, cfg, {**b, "image_grid": (grid1 + s * 1e-9)[None].astype(dtype)},
        beam_size=5, early_stop=False)["scores"].astype(jnp.float32))
        * 1e-12)
    grid0 = jnp.zeros((49, 2048), jnp.float32)

    def cap_run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            acc = jcap(params, batch, grid0, acc)
        return float(acc)

    def cap_timed(k):
        t0 = time.perf_counter()
        cap_run_k(k)
        return time.perf_counter() - t0

    cap_run_k(1)   # compile + warm
    caption_ms = min((cap_timed(6) - cap_timed(1)) / 5
                     for _ in range(3)) * 1e3

    # --- batched + overlapped pipeline (VERDICT-r4 weak #5): host JPEG
    # decode on a thread pool OVERLAPS the vmapped device stages; device
    # legs run at batch Bv. Wall-clocked end to end (async dispatch, one
    # final fetch per batch output) — the number a bulk ingest or a
    # loaded server actually sustains, vs the B=1 serial worst case.
    batched = {}
    for Bv in [int(b) for b in os.environ.get("BENCH_VISION_BATCH",
                                              "8,32").split(",") if b]:
        import concurrent.futures as _cf

        n_img = int(os.environ.get("BENCH_VISION_N", str(4 * Bv)))

        # towers ride as jit ARGS — the vmapped three-tower program with
        # closure params overflows the remote-compile transport (HTTP 413)
        towers = {"resnet": resnet, "mtcnn": mtcnn, "facenet": facenet,
                  "yolo": yolo}

        def device_batch(tw, canvases, imgs224, s):
            def g1(img):
                x = preprocess_image(img[None].astype(dtype) / 255.0)
                return resnet_forward(tw["resnet"], rcfg, x, pool=False)[0]

            def f1(canvas):
                boxes, probs, valid = detect_faces(
                    tw["mtcnn"], canvas, MTCNNConfig(max_faces=4))
                crops = extract_faces(canvas, boxes)
                emb = facenet_forward(tw["facenet"], FaceNetConfig(), crops)
                return jnp.where(valid[:, None], emb, jnp.nan)

            def o1(canvas):
                dets = yolov3_forward(tw["yolo"], defs,
                                      canvas[None].astype(dtype) / 255.0)[0]
                boxes, scores, valid = nms_fixed(dets, 0.3, 0.6, max_det=64)
                crops = crop_and_resize(canvas, boxes, 224)
                x = preprocess_image(crops.astype(dtype) / 255.0)
                emb = resnet_forward(tw["resnet"], rcfg, x, pool=True)
                return jnp.where(valid[:, None], emb, jnp.nan)

            # uint8 on the wire (4x less host->device traffic than f32 —
            # the batched pipeline's dominant cost on a tunneled device),
            # cast on-device where the stage fns expect float
            canvases = canvases.astype(jnp.float32)
            imgs224 = imgs224.astype(jnp.float32)
            g = jax.vmap(g1)(imgs224 + s * 1e-9)
            f = jax.vmap(f1)(canvases)
            o = jax.vmap(o1)(canvases)
            return (jnp.sum(g.astype(jnp.float32)) * 1e-12
                    + jnp.sum(jnp.nan_to_num(f.astype(jnp.float32)))
                    * 1e-12
                    + jnp.sum(jnp.nan_to_num(o.astype(jnp.float32)))
                    * 1e-12)

        jbatch = jax.jit(device_batch)

        def run_pipeline():
            acc = jnp.zeros(())
            outs = []
            with _cf.ThreadPoolExecutor(max_workers=4) as pool:
                host_futs = [pool.submit(host_stage)
                             for _ in range(n_img)]
                buf224, bufcan = [], []
                for hf in host_futs:
                    i224, can = hf.result()
                    buf224.append(i224)
                    bufcan.append(can)
                    if len(buf224) == Bv:
                        outs.append(jbatch(
                            towers,
                            jnp.asarray(np.stack(bufcan).astype(np.uint8)),
                            jnp.asarray(np.stack(buf224).astype(np.uint8)),
                            acc))
                        acc = outs[-1]
                        buf224, bufcan = [], []
            return [float(o) for o in outs]  # force all batches

        run_pipeline()          # compile + warm
        t0 = time.perf_counter()
        run_pipeline()
        wall = time.perf_counter() - t0
        done = (n_img // Bv) * Bv
        batched[f"images_per_sec_batched_b{Bv}"] = round(done / wall, 2)
    # batched caption throughput rides the main bench's beam-5 numbers;
    # here we report the feature-extraction pipeline (the 19h-offline-
    # YOLO-pass analogue, docs/getting_data.md:26-35)

    total_ms = host_ms + grid_ms + faces_ms + objects_ms + caption_ms
    print(json.dumps({
        "metric": "vision_e2e_ms_per_image",
        "value": round(total_ms, 1),
        "unit": "ms raw-JPEG -> features -> beam5 caption (B=1, serial)",
        "vs_baseline": round(1000.0 / total_ms / 1.0, 2),
        "host_decode_letterbox_ms": round(host_ms, 1),
        "resnet_grid_ms": round(grid_ms, 1),
        "mtcnn_facenet_ms": round(faces_ms, 1),
        "yolo_objects_ms": round(objects_ms, 1),
        "caption_beam5_ms": round(caption_ms, 1),
        "images_per_sec_serial": round(1000.0 / total_ms, 2),
        **batched,
        "batched_note": "images_per_sec_batched_b*: host JPEG decode "
                        "thread pool overlapping vmapped grid+faces+"
                        "objects device stages at that batch",
        "note": "baseline ~1 req/s reference serve path "
                "(tell/tasks/captioner.py:146-444); serial stages are "
                "B=1 worst case — the batched lines are the pipelined "
                "rate",
    }))


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache for every bench process (the flagship
    beam-decode program alone is ~20 min of remote compile cold; cached
    reruns start in seconds). BENCH_COMPILE_CACHE overrides the location;
    set it empty to disable."""
    path = os.environ.get("BENCH_COMPILE_CACHE", "/tmp/tell_tpu_bench_cache")
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    import dataclasses
    _enable_compile_cache()
    extras = {}
    if (os.environ.get("BENCH_TRAIN") != "1"
            and os.environ.get("BENCH_VISION") != "1"
            and os.environ.get("BENCH_EXTRAS", "1") != "0"):
        # capture the train-step number FIRST, in a subprocess, while no
        # TPU client exists in this process (single-session tunnel).
        # BENCH_TRAIN_EXTRA=0 skips it (tiny-shape contract runs) but
        # records the skip so the omission is visible in the line.
        if os.environ.get("BENCH_TRAIN_EXTRA", "1") != "0":
            extras.update(bench_train_subprocess())
        else:
            extras["train_bench"] = "skipped (BENCH_TRAIN_EXTRA=0)"
    armed = _device_watchdog(float(os.environ.get("BENCH_DEVICE_TIMEOUT",
                                                  "900")))
    jax.devices()      # blocks here if the tunnel is wedged
    armed.set()
    if os.environ.get("BENCH_TRAIN") == "1":
        bench_train()
        return
    if os.environ.get("BENCH_VISION") == "1":
        bench_vision()
        return
    cfg = CaptionerConfig()
    cfg = dataclasses.replace(cfg, gen_len=GEN_LEN)
    dtype = jnp.bfloat16

    params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)

    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        extras.update(numerics_agreement_gate(params, cfg, dtype))

    B = BATCH
    S = 512
    batch = _make_batch(B, S, dtype, key=1)

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

    # encode-inclusive end-to-end: the apples-to-apples headline (the
    # reference's 2.8/s wall-clock includes its article encode).
    # BENCH_E2E=0 skips the encode stage (decode-only A/Bs of
    # encode-independent levers, e.g. the conv-state layout) and the
    # headline falls back to the decode-only number, labeled as such.
    if os.environ.get("BENCH_E2E", "1") != "0":
        e2e = bench_e2e(params, cfg, dtype)
        e2e_cps = e2e.pop("e2e_captions_per_sec")
        # companion keys (encode ms/article, enc8 gate) ride the line
        extras.update({k: v for k, v in e2e.items() if k != "e2e_batch"})
    else:
        e2e = None

    if os.environ.get("BENCH_EXTRAS", "1") != "0":
        extras.update(bench_latency(params, cfg, dtype))
        extras.update(bench_engine(params, cfg, dtype))
        extras.update(bench_engine_saturated(params, cfg, dtype))
        if e2e is not None:   # needs the tower; skipped under BENCH_E2E=0
            extras.update(bench_engine_e2e(
                params, cfg, dtype,
                use_enc8=extras.get("encoder_mode") == "int8"))

    mode = "beam%d" % BEAM if BEAM > 1 else "greedy"
    if e2e is None:
        head = {
            "metric": "captions_per_sec_%s_b%d_len%d" % (mode, B, GEN_LEN),
            "value": round(cps, 2),
            "unit": "captions/sec/chip (decode only — BENCH_E2E=0)",
            "vs_baseline": round(cps / BASELINE_CAPTIONS_PER_SEC, 2),
        }
    else:
        head = {
            "metric": "captions_per_sec_e2e_%s_b%d_len%d" % (
                mode, e2e["e2e_batch"], GEN_LEN),
            "value": round(e2e_cps, 2),
            "unit": "captions/sec/chip (RoBERTa-large article encode + %s "
                    "decode, both on-chip)" % mode,
            "vs_baseline": round(e2e_cps / BASELINE_CAPTIONS_PER_SEC, 2),
            "decode_only_captions_per_sec": round(cps, 2),
            "decode_only_config": "%s_b%d_len%d (context features "
                                  "precomputed)" % (mode, B, GEN_LEN),
            "decode_only_vs_baseline": round(
                cps / BASELINE_CAPTIONS_PER_SEC, 2),
        }
    print(json.dumps({**head, **extras}))


if __name__ == "__main__":
    main()
