"""Streaming-serving A/B: continuous-batching engine vs micro-batch decode.

The micro-batcher (`serving/batcher.py`) decodes each micro-batch to
completion, so under streaming traffic a request arriving just after a
batch launches waits a full decode before its batch even starts, and every
request in a batch waits for the slowest. The continuous engine
(`serving/engine.py`) admits requests into a resident beam state at chunk
boundaries instead. This tool replays the same Poisson-ish arrival stream
through both paths at production shapes and reports sustained throughput
plus per-request latency (submit -> result wall-clock).

The reference has no analogue to compare against — its ZeroMQ ventilator
hands whole jobs to worker processes (tell/server/base.py:30-191).

Usage: env -u XLA_FLAGS python tools/engine_bench.py
       SLOTS=16 BEAM=5 GEN_LEN=32 N=64 ARRIVAL_MS=15 python tools/engine_bench.py
       MODEL=modern ... python tools/engine_bench.py   # transformer_modern
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

MODEL = os.environ.get("MODEL", "captioner")
SLOTS = int(os.environ.get("SLOTS", "16"))
BEAM = int(os.environ.get("BEAM", "5"))
GEN_LEN = int(os.environ.get("GEN_LEN", "32"))
S = int(os.environ.get("S", "512"))
N = int(os.environ.get("N", "64"))
ARRIVAL_MS = float(os.environ.get("ARRIVAL_MS", "15"))
CHUNK = int(os.environ.get("CHUNK", "8"))


def make_requests(n, dtype):
    ks = jr.split(jr.PRNGKey(1), 4)
    reqs = []
    for i in range(n):
        # vary one tensor per request so XLA can't constant-fold across them
        reqs.append({
            "image_grid": jr.normal(ks[0], (1, 49, 2048), dtype) + i * 1e-4,
            "article": jr.normal(ks[1], (1, S, 1024), dtype),
            "article_mask": jnp.zeros((1, S), bool),
            "face_embeds": jr.normal(ks[2], (1, 4, 512), dtype),
            "obj_embeds": jr.normal(ks[3], (1, 64, 2048), dtype),
        })
    return reqs


def make_requests_mixed(n, dtype):
    """ENGINE_BUCKETS A/B traffic: article widths cycle S/4, S/2, S (a
    production-ish mix). Each request carries BOTH its natural-width
    features (for the bucketed arm) and a full-width padded copy (for the
    single-engine arm) — identical information, masked identically."""
    widths = sorted({max(16, S // 4), max(16, S // 2), S})
    ks = jr.split(jr.PRNGKey(1), 4)
    reqs = []
    for i in range(n):
        w = widths[i % len(widths)]
        art = jr.normal(ks[1], (1, w, 1024), dtype) + i * 1e-4
        base = {
            "image_grid": jr.normal(ks[0], (1, 49, 2048), dtype) + i * 1e-4,
            "face_embeds": jr.normal(ks[2], (1, 4, 512), dtype),
            "obj_embeds": jr.normal(ks[3], (1, 64, 2048), dtype),
        }
        narrow = {**base, "article": art,
                  "article_mask": jnp.zeros((1, w), bool)}
        full = {**base,
                "article": jnp.pad(art, ((0, 0), (0, S - w), (0, 0))),
                "article_mask": jnp.arange(S)[None] >= w}
        reqs.append({"width": w, "narrow": narrow, "full": full})
    return reqs


def run_engine_bucketed(params, cfg, reqs):
    """One resident engine per article width (serve --engine-buckets);
    requests route to their natural width."""
    import dataclasses
    from tell_tpu.serving.engine import DecodeEngine
    widths = sorted({r["width"] for r in reqs})

    def cfg_at(w):
        dec = cfg.decoder
        ctx = tuple(dataclasses.replace(c, max_len=w)
                    if c.name == "article" else c for c in dec.contexts)
        return dataclasses.replace(cfg,
                                   decoder=dataclasses.replace(
                                       dec, contexts=ctx))

    engines = {w: DecodeEngine(params, cfg_at(w), slots=SLOTS, beam=BEAM,
                               chunk_steps=CHUNK, dtype=jnp.bfloat16)
               for w in widths}
    for w, eng in engines.items():  # warm every engine
        r0 = next(r for r in reqs if r["width"] == w)
        f = eng.submit(r0["narrow"])
        eng.run_until_drained()
        f.result(timeout=600)

    lat, t_sub = [], {}
    t0 = time.perf_counter()
    futs = []
    next_arrival = t0
    i = 0
    engs = list(engines.values())
    while i < len(reqs) or any(not f.done() for f in futs):
        now = time.perf_counter()
        while i < len(reqs) and now >= next_arrival:
            fut = engines[reqs[i]["width"]].submit(reqs[i]["narrow"])
            t_sub[id(fut)] = time.perf_counter()
            fut.add_done_callback(
                lambda f, ts=t_sub: lat.append(
                    time.perf_counter() - ts[id(f)]))
            futs.append(fut)
            next_arrival += ARRIVAL_MS / 1e3
            i += 1
        if not any([e.tick() for e in engs]) and i < len(reqs):
            time.sleep(max(0.0, next_arrival - time.perf_counter()))
    wall = time.perf_counter() - t0
    return wall, lat


def make_requests_modern(cfg, n, dtype):
    """Modern-family request features straight from cfg.contexts (the
    article is the tower's FINAL hidden state, not stacked layers)."""
    ks = jr.split(jr.PRNGKey(1), 4)
    reqs = []
    for i in range(n):
        req = {}
        for j, spec in enumerate(cfg.contexts):
            key = {"image": "image_grid", "article": "article",
                   "faces": "face_embeds", "obj": "obj_embeds"}[spec.name]
            req[key] = jr.normal(ks[j % 4], (1, spec.max_len, spec.kv_dim),
                                 dtype)
            if spec.name == "article":
                req[key] = req[key] + i * 1e-4   # defeat constant folding
                req["article_mask"] = jnp.zeros((1, spec.max_len), bool)
        reqs.append(req)
    return reqs


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def run_engine(params, cfg, reqs):
    from tell_tpu.serving.engine import DecodeEngine, LLMDecodeEngine
    eng_cls = LLMDecodeEngine if MODEL == "modern" else DecodeEngine
    eng = eng_cls(params, cfg, slots=SLOTS, beam=BEAM,
                  chunk_steps=CHUNK, dtype=jnp.bfloat16)
    # warm every compiled program (encode/admit/chunk) before timing
    f = eng.submit(reqs[0])
    eng.run_until_drained()
    f.result(timeout=600)

    lat, t_sub = [], {}
    t0 = time.perf_counter()
    futs = []
    next_arrival = t0
    i = 0
    while i < len(reqs) or any(not f.done() for f in futs):
        now = time.perf_counter()
        while i < len(reqs) and now >= next_arrival:
            fut = eng.submit(reqs[i])
            t_sub[id(fut)] = time.perf_counter()
            fut.add_done_callback(
                lambda f, ts=t_sub: lat.append(time.perf_counter() - ts[id(f)]))
            futs.append(fut)
            next_arrival += ARRIVAL_MS / 1e3
            i += 1
        if not eng.tick() and i < len(reqs):
            time.sleep(max(0.0, next_arrival - time.perf_counter()))
    wall = time.perf_counter() - t0
    return wall, lat


def run_microbatch(params, cfg, reqs):
    """Micro-batch baseline: decode queued arrivals to completion in groups
    of up to SLOTS (the batcher's behavior with max_batch=SLOTS), padding
    to the fixed compiled shape with dead rows."""
    if MODEL == "modern":
        from tell_tpu.models.llm_decoder import llm_beam_search as beam_search
    else:
        from tell_tpu.models.beam import beam_search

    def pack(group):
        batch = {}
        for k in group[0]:
            rows = jnp.concatenate([g[k] for g in group], axis=0)
            pad = SLOTS - len(group)
            if pad:
                rows = jnp.concatenate(
                    [rows, jnp.zeros((pad,) + rows.shape[1:], rows.dtype)],
                    axis=0)
            batch[k] = rows
        batch["row_live"] = jnp.arange(SLOTS) < len(group)
        return batch

    decode = jax.jit(lambda p, b: beam_search(p, cfg, b, beam_size=BEAM,
                                              early_stop=True))
    out = decode(params, pack(reqs[:1]))  # warm
    np.asarray(out["token_ids"])

    lat = []
    t0 = time.perf_counter()
    next_arrival = t0
    queued = 0  # arrivals are deterministic: request i arrives at t0+i*dt
    done = 0
    sub_time = [t0 + i * ARRIVAL_MS / 1e3 for i in range(len(reqs))]
    while done < len(reqs):
        now = time.perf_counter()
        queued = min(len(reqs), int((now - t0) / (ARRIVAL_MS / 1e3)) + 1)
        if queued <= done:
            time.sleep(sub_time[done] - now)
            continue
        group = reqs[done:min(queued, done + SLOTS)]
        out = decode(params, pack(group))
        # serving must deliver token ids to the host — fetch them for real
        # (block_until_ready can return before remote execution finishes on
        # tunneled devices and never pays the transfer; np.asarray does)
        np.asarray(out["token_ids"])
        t_done = time.perf_counter()
        for j in range(len(group)):
            lat.append(t_done - sub_time[done + j])
        done += len(group)
    wall = time.perf_counter() - t0
    return wall, lat


def main():
    import dataclasses
    dtype = jnp.bfloat16
    if MODEL == "modern":
        # expt 10_vit_modern shapes (ViT-L tokens + 8-layer modern LM)
        from tell_tpu.config import ContextSpec
        from tell_tpu.models.llm_decoder import LLMConfig, init_llm_decoder
        tiny = os.environ.get("TINY") == "1"   # CPU smoke-run shapes
        cfg = LLMConfig(
            vocab_size=512 if tiny else 50265,
            dim=64 if tiny else 1024,
            num_layers=2 if tiny else 8,
            num_heads=4 if tiny else 16,
            ffn_dim=128 if tiny else 2816,
            dropout=0.0, attention_dropout=0.0,
            max_target_positions=512, gen_len=GEN_LEN,
            contexts=(ContextSpec("image", 64 if tiny else 1024,
                                  9 if tiny else 197),
                      ContextSpec("article", 64 if tiny else 1024, S),
                      ContextSpec("faces", 32 if tiny else 512, 4),
                      ContextSpec("obj", 64 if tiny else 2048,
                                  8 if tiny else 64)))
        params = init_llm_decoder(jr.PRNGKey(0), cfg)
    else:
        from tell_tpu.config import CaptionerConfig
        from tell_tpu.models import init_captioner
        cfg = dataclasses.replace(CaptionerConfig(), gen_len=GEN_LEN)
        # align the article context with the S env (requests are built at
        # width S; params are width-independent)
        dec = cfg.decoder
        ctx = tuple(dataclasses.replace(c, max_len=S)
                    if c.name == "article" else c for c in dec.contexts)
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(dec, contexts=ctx))
        params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)
    if os.environ.get("ENGINE_BUCKETS") == "1":
        assert MODEL != "modern", "bucket A/B is flagship-only for now"
        mixed = make_requests_mixed(N, dtype)
        print(f"slots={SLOTS} beam={BEAM} gen_len={GEN_LEN} S={S} N={N} "
              f"arrival={ARRIVAL_MS}ms chunk={CHUNK} (bucketed A/B)")
        for name, fn, rs in (
                ("single", run_engine, [r["full"] for r in mixed]),
                ("buckets", run_engine_bucketed, mixed)):
            wall, lat = fn(params, cfg, rs)
            print(f"{name:>10}: {N / wall:6.1f} captions/s sustained | "
                  f"latency mean {1e3 * float(np.mean(lat)):6.1f} ms  "
                  f"p50 {1e3 * pct(lat, 50):6.1f}  "
                  f"p95 {1e3 * pct(lat, 95):6.1f}")
        return

    reqs = (make_requests_modern(cfg, N, dtype) if MODEL == "modern"
            else make_requests(N, dtype))
    print(f"slots={SLOTS} beam={BEAM} gen_len={GEN_LEN} S={S} "
          f"N={N} arrival={ARRIVAL_MS}ms chunk={CHUNK}")

    for name, fn in (("microbatch", run_microbatch), ("engine", run_engine)):
        wall, lat = fn(params, cfg, reqs)
        print(f"{name:>10}: {N / wall:6.1f} captions/s sustained | latency "
              f"mean {1e3 * float(np.mean(lat)):6.1f} ms  "
              f"p50 {1e3 * pct(lat, 50):6.1f}  p95 {1e3 * pct(lat, 95):6.1f}")


if __name__ == "__main__":
    main()
