#!/usr/bin/env python
"""Per-step collective traffic of the sharded programs, from compiled HLO.

The ≥2000 captions/s v5e-8 north star rests on a near-linear DP scaling
assumption. This tool makes that assumption inspectable: it compiles the
FLAGSHIP-dims train step and the serving engine's decode chunk over a
virtual 8-device mesh (DP8 and DP4xTP2), walks the optimized HLO for
communication ops (all-reduce / all-gather / reduce-scatter /
collective-permute / all-to-all), and reports bytes moved per step next
to the program's FLOPs — the two numbers whose ratio bounds scaling
efficiency.

Interpretation (see docs/parallelism.md for the published table): with
per-chip ICI bandwidth W (v5e: 4.5e10 B/s per link per direction, 2D
torus — 9e10 B/s aggregate per chip on an 8-chip slice), a ring
all-reduce of G bytes costs ~2*(N-1)/N * G/W seconds, overlappable with
the backward pass; DP efficiency ~ compute_time / (compute_time +
exposed_collective_time).

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/collective_accounting.py [--json out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.random as jr  # noqa: E402

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")

_SHAPE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(sig: str) -> int:
    """Total bytes of an HLO result type like 'f32[16,512]' or a tuple
    '(f32[4], bf16[2,3])'."""
    total = 0
    for dt, dims in _SHAPE.findall(sig):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Sum result-shape bytes per collective op kind over an optimized HLO
    module (per participating device: HLO shapes are the per-shard view)."""
    out = {k: {"bytes": 0, "ops": 0} for k in COLLECTIVES}
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+\s*=\s*(\([^)]*\)|[\w\[\],]+)\s+"
                     r"([a-z\-]+)", line)
        if not m:
            continue
        kind = m.group(2)
        # "all-reduce-start"/"-done" pairs: count the -start only
        base = kind.removesuffix("-start")
        if kind.endswith("-done") or base not in COLLECTIVES:
            continue
        out[base]["bytes"] += shape_bytes(m.group(1))
        out[base]["ops"] += 1
    return out


def account(compiled) -> dict:
    hlo = compiled.as_text()
    cols = collective_bytes(hlo)
    cost = (compiled.cost_analysis() or [{}])
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return {"collectives": cols,
            "total_collective_bytes": sum(v["bytes"] for v in cols.values()),
            "flops": float(cost.get("flops", 0.0)) or None}


def flagship_train_step(mesh, B_global: int):
    """Compile the flagship-dims train step over `mesh` and return the
    accounting. Frozen-tower features arrive precomputed (article_hiddens),
    matching entry(); the DP gradient all-reduce covers every trainable
    decoder/captioner param."""
    import dataclasses

    from tell_tpu.config import CaptionerConfig
    from tell_tpu.models import init_captioner
    from tell_tpu.parallel import (batch_sharding, param_sharding_rules,
                                   shard_params)
    from tell_tpu.training import bert_adam, make_train_step

    cfg = dataclasses.replace(CaptionerConfig(), compute_dtype="bfloat16")
    params = init_captioner(jr.PRNGKey(0), cfg)
    params = shard_params(params, mesh)
    optimizer = bert_adam(t_total=437600)
    opt_state = optimizer.init(params)

    B, S, T = B_global, 512, 32
    ks = jr.split(jr.PRNGKey(1), 6)
    caption = jr.randint(ks[4], (B, T), 4, cfg.decoder.vocab_size)
    batch = {
        "image_grid": jr.normal(ks[0], (B, 49, 2048)),
        "article_hiddens": jr.normal(ks[1], (B, S, cfg.num_bert_layers,
                                              1024)),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jr.normal(ks[2], (B, 4, 512)),
        "obj_embeds": jr.normal(ks[3], (B, 64, 2048)),
        "caption_ids": caption.at[:, 0].set(cfg.decoder.bos_id),
    }
    batch = jax.device_put(batch, batch_sharding(mesh, batch))

    step = jax.jit(make_train_step(cfg, optimizer),
                   out_shardings=(param_sharding_rules(params, mesh),
                                  None, None))
    with mesh:
        compiled = step.lower(params, opt_state, batch,
                              jr.PRNGKey(2)).compile()
    n_params = sum(x.size for x in jax.tree.leaves(params))
    acc = account(compiled)
    acc["n_params"] = int(n_params)
    acc["global_batch"] = B
    return acc


def engine_chunk(mesh, slots: int):
    """Compile the serving engine's decode chunk sharded over `mesh` and
    return the accounting (expected: ~zero collective bytes — slots are
    embarrassingly parallel over 'data')."""
    import dataclasses

    from tell_tpu.config import CaptionerConfig
    from tell_tpu.models import init_captioner
    from tell_tpu.serving.engine import DecodeEngine

    cfg = dataclasses.replace(CaptionerConfig(), gen_len=16)
    params = init_captioner(jr.PRNGKey(0), cfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    eng = DecodeEngine(params, cfg, slots=slots, beam=5, chunk_steps=4,
                       dtype=jnp.bfloat16, mesh=mesh)
    state = eng.state
    compiled = eng._chunk.lower(eng.params, eng._aux, state).compile()
    acc = account(compiled)
    acc["slots"] = slots
    return acc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-engine", action="store_true")
    args = ap.parse_args()

    from tell_tpu.parallel import make_mesh

    report = {}
    for name, (n_data, n_model) in (("dp8", (8, 1)), ("dp4_tp2", (4, 2))):
        mesh = make_mesh(n_data=n_data, n_model=n_model,
                         devices=jax.devices()[:8])
        # per-chip batch 16 (the measured 72.9 ms/batch shape): global
        # batch = 16 * data-parallel degree (weak scaling)
        acc = flagship_train_step(mesh, B_global=16 * n_data)
        report[f"train_{name}"] = acc
        print(f"train {name}: {json.dumps(acc)}", flush=True)

    if not args.skip_engine:
        from jax.sharding import Mesh
        import numpy as np
        emesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        acc = engine_chunk(emesh, slots=16)
        report["engine_chunk_dp8"] = acc
        print(f"engine dp8: {json.dumps(acc)}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
