"""Continuous-batching decode engine: slot isolation + one-shot parity.

The engine's contract is that a request's caption NEVER depends on which
other requests share the engine or when they were admitted — every slot
must reproduce the one-shot `beam_search` result exactly (same candidate
math, per-slot step counters). The reference decodes whole jobs to
completion per worker process (tell/server/base.py:30-191) and has no
analogue of requests joining a running decode.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tell_tpu.config import small_test_config
from tell_tpu.models import init_captioner
from tell_tpu.models.beam import beam_search
from tell_tpu.serving.engine import DecodeEngine


def _request(cfg, seed: int) -> dict:
    """One encoded feature batch (leading dim 1) with ragged article pad."""
    import jax.random as jr
    dcfg = cfg.decoder
    ks = jr.split(jr.PRNGKey(seed), 5)
    s_art = dcfg.context("article").max_len
    n_pad = int(jr.randint(ks[4], (), 0, s_art // 2))
    mask = jnp.zeros((1, s_art), bool).at[0, s_art - n_pad:].set(True)
    return {
        "image_grid": jr.normal(ks[0], (1, dcfg.context("image").max_len,
                                        dcfg.context("image").kv_dim)),
        "article_hiddens": jr.normal(
            ks[1], (1, s_art, cfg.num_bert_layers,
                    dcfg.context("article").kv_dim)),
        "article_mask": mask,
        "face_embeds": jr.normal(ks[2], (1, dcfg.context("faces").max_len,
                                         dcfg.context("faces").kv_dim)),
        "obj_embeds": jr.normal(ks[3], (1, dcfg.context("obj").max_len,
                                        dcfg.context("obj").kv_dim)),
    }


def _setup(gen_len=6):
    import dataclasses
    cfg = dataclasses.replace(small_test_config(), gen_len=gen_len)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _ref(params, cfg, req, beam):
    out = beam_search(params, cfg, req, beam_size=beam, early_stop=True)
    return {k: np.asarray(v[0]) for k, v in out.items()}


def _check(result, ref):
    np.testing.assert_array_equal(result["token_ids"], ref["token_ids"])
    np.testing.assert_allclose(result["scores"], ref["scores"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(result["finished"], ref["finished"])


def test_engine_matches_one_shot_beam_search():
    """Staggered admissions: r2 joins while r0/r1 are mid-decode; every
    result must equal its one-shot beam_search."""
    cfg, params = _setup()
    reqs = [_request(cfg, s) for s in (1, 2, 3)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]

    eng = DecodeEngine(params, cfg, slots=3, beam=2, chunk_steps=2)
    futs = [eng.submit(reqs[0]), eng.submit(reqs[1])]
    eng.tick()                      # r0/r1 advance to t=2
    futs.append(eng.submit(reqs[2]))  # joins at t=0 while others run
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)


def test_engine_slot_reuse():
    """More requests than slots: freed slots take queued requests and the
    dirty state (conv buffers, KV, counters) must not leak."""
    cfg, params = _setup()
    reqs = [_request(cfg, s) for s in (4, 5, 6, 7)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]

    eng = DecodeEngine(params, cfg, slots=2, beam=2, chunk_steps=3)
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)
    assert sorted(eng.free) == [0, 1]
    assert eng.stats["requests"] == 4


def test_engine_queued_not_stranded_after_backpressure_drain():
    """Regression (ADVICE r4): with a tiny report pipeline (max_lag=1) a
    backpressure drain inside tick() can harvest EVERY in-flight report —
    pending and _reports both empty — while the queue still holds
    requests. tick() must keep reporting in-flight work (and
    run_until_drained must keep going) so those queued requests are
    admitted and their futures resolve, rather than being stranded by an
    early "drained" verdict."""
    cfg, params = _setup()
    reqs = [_request(cfg, 20 + s) for s in range(6)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]

    # chunk_steps >= gen_len: every admitted request finishes within one
    # chunk, so the single allowed in-flight report (max_lag=1) resolves
    # ALL pending slots at once — the exact state the fix guards.
    eng = DecodeEngine(params, cfg, slots=2, beam=2,
                       chunk_steps=cfg.gen_len, max_lag=1)
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)
    assert eng.stats["requests"] == len(reqs)


def test_engine_warm_then_results_match_one_shot():
    """warm() executes every admit rung + one chunk with dummy data and
    must leave the engine fully inert: requests decoded afterwards still
    reproduce one-shot beam_search exactly."""
    cfg, params = _setup()
    reqs = [_request(cfg, 40 + s) for s in range(3)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]
    eng = DecodeEngine(params, cfg, slots=3, beam=2, chunk_steps=2)
    eng.warm(reqs[0])
    assert sorted(eng.free) == [0, 1, 2]
    assert eng.tick() is False          # nothing live after warm
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)


def test_engine_idle_tick():
    cfg, params = _setup()
    eng = DecodeEngine(params, cfg, slots=2, beam=2)
    assert eng.tick() is False
    assert eng.stats["chunks"] == 0


def test_engine_fuzz_random_schedules():
    """Property check of slot isolation: random engine geometry and a
    random interleaving of submissions and ticks must still reproduce
    every one-shot beam_search bit-for-bit (seeded, 3 rounds)."""
    rng = np.random.RandomState(1234)
    for round_i in range(3):
        gen_len = int(rng.randint(4, 9))
        cfg, params = _setup(gen_len=gen_len)
        slots = int(rng.randint(2, 5))
        beam = int(rng.randint(2, 4))
        chunk = int(rng.randint(1, 4))
        n_req = int(rng.randint(3, 7))
        reqs = [_request(cfg, 100 * round_i + i) for i in range(n_req)]
        refs = [_ref(params, cfg, r, beam=beam) for r in reqs]

        eng = DecodeEngine(params, cfg, slots=slots, beam=beam,
                           chunk_steps=chunk,
                           max_lag=int(rng.randint(1, 4)))
        futs = []
        i, live = 0, True
        while i < n_req or live:
            # interleave 0-2 submissions between ticks
            for _ in range(int(rng.randint(0, 3))):
                if i < n_req:
                    futs.append(eng.submit(reqs[i]))
                    i += 1
            live = eng.tick()
        eng.run_until_drained()
        for fut, ref in zip(futs, refs):
            _check(fut.result(timeout=0), ref)
        assert sorted(eng.free) == list(range(slots))
        assert eng.stats["requests"] == len(futs) == n_req


def test_engine_mesh_sharded_slots_match_one_shot():
    """mesh=: the resident slot state shards over the "data" axis (8
    virtual CPU devices); staggered admissions must still reproduce every
    one-shot beam_search bit-for-bit."""
    from tell_tpu.parallel.mesh import make_mesh

    cfg, params = _setup()
    reqs = [_request(cfg, s) for s in (8, 9, 10)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]

    mesh = make_mesh(8, 1)
    eng = DecodeEngine(params, cfg, slots=8, beam=2, chunk_steps=2,
                       mesh=mesh)
    futs = [eng.submit(reqs[0]), eng.submit(reqs[1])]
    eng.tick()
    futs.append(eng.submit(reqs[2]))  # joins mid-flight on another shard
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)
    assert sorted(eng.free) == list(range(8))


def _llm_setup(gen_len=6):
    import dataclasses
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import LLMConfig, init_llm_decoder
    cfg = LLMConfig(
        vocab_size=211, dim=32, num_layers=2, num_heads=4, num_kv_heads=2,
        ffn_dim=48, dropout=0.0, attention_dropout=0.0,
        max_target_positions=32, gen_len=gen_len, loss_vocab_chunk=64,
        contexts=(ContextSpec("image", 16, 5),
                  ContextSpec("article", 12, 9)))
    params = init_llm_decoder(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _llm_request(cfg, seed: int) -> dict:
    import jax.random as jr
    ks = jr.split(jr.PRNGKey(seed), 3)
    s_art = cfg.context("article").max_len
    n_pad = int(jr.randint(ks[2], (), 0, s_art // 2))
    mask = jnp.zeros((1, s_art), bool).at[0, s_art - n_pad:].set(True)
    return {
        "image_grid": jr.normal(ks[0], (1, cfg.context("image").max_len,
                                        cfg.context("image").kv_dim)),
        "article": jr.normal(ks[1], (1, s_art,
                                     cfg.context("article").kv_dim)),
        "article_mask": mask,
    }


def test_llm_engine_matches_one_shot_beam_search():
    """transformer_modern continuous batching (LLMDecodeEngine): staggered
    admissions with per-slot RoPE positions and per-row self-KV cache
    writes must reproduce one-shot llm_beam_search exactly."""
    from tell_tpu.models.llm_decoder import llm_beam_search
    from tell_tpu.serving.engine import LLMDecodeEngine

    cfg, params = _llm_setup()
    reqs = [_llm_request(cfg, s) for s in (31, 32, 33, 34)]
    refs = []
    for r in reqs:
        out = llm_beam_search(params, cfg, r, beam_size=2, early_stop=True)
        refs.append({k: np.asarray(v[0]) for k, v in out.items()})

    eng = LLMDecodeEngine(params, cfg, slots=2, beam=2, chunk_steps=2)
    futs = [eng.submit(reqs[0]), eng.submit(reqs[1])]
    eng.tick()                         # r0/r1 mid-decode
    futs += [eng.submit(reqs[2]), eng.submit(reqs[3])]  # queue for reuse
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)
    assert sorted(eng.free) == [0, 1]
    assert eng.stats["requests"] == 4


def test_llm_engine_mesh_sharded_slots_match_one_shot():
    """LLMDecodeEngine over a ("data",) mesh: per-slot self-KV caches and
    RoPE positions shard row-locally; results must equal one-shot
    llm_beam_search."""
    from tell_tpu.models.llm_decoder import llm_beam_search
    from tell_tpu.parallel.mesh import make_mesh
    from tell_tpu.serving.engine import LLMDecodeEngine

    cfg, params = _llm_setup()
    reqs = [_llm_request(cfg, s) for s in (41, 42)]
    refs = []
    for r in reqs:
        out = llm_beam_search(params, cfg, r, beam_size=2, early_stop=True)
        refs.append({k: np.asarray(v[0]) for k, v in out.items()})

    mesh = make_mesh(8, 1)
    eng = LLMDecodeEngine(params, cfg, slots=8, beam=2, chunk_steps=2,
                          mesh=mesh)
    futs = [eng.submit(reqs[0])]
    eng.tick()
    futs.append(eng.submit(reqs[1]))   # joins mid-flight on another shard
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)
    assert sorted(eng.free) == list(range(8))


def test_engine_length_penalty_matches_one_shot():
    """length_penalty reranks harvested beams exactly like one-shot
    beam_search's GNMT normalization (tnt serve --engine-length-penalty)."""
    cfg, params = _setup()
    req = _request(cfg, 55)
    ref = beam_search(params, cfg, req, beam_size=3, length_penalty=0.7,
                      early_stop=True)
    ref = {k: np.asarray(v[0]) for k, v in ref.items()}

    eng = DecodeEngine(params, cfg, slots=2, beam=3, chunk_steps=2,
                       length_penalty=0.7)
    out = eng.submit(req)
    eng.run_until_drained()
    _check(out.result(timeout=0), ref)


def test_engine_int8_kv_matches_one_shot(monkeypatch):
    """TELL_TPU_KV8=1 composes with the engine: the int8 context-KV cache
    (quantized inside precompute_context_kv_cat, which both paths share)
    must give the engine the exact one-shot beam_search captions."""
    monkeypatch.setenv("TELL_TPU_KV8", "1")
    cfg, params = _setup()
    reqs = [_request(cfg, s) for s in (71, 72)]
    refs = [_ref(params, cfg, r, beam=2) for r in reqs]

    eng = DecodeEngine(params, cfg, slots=2, beam=2, chunk_steps=2)
    futs = [eng.submit(r) for r in reqs]
    eng.run_until_drained()
    for fut, ref in zip(futs, refs):
        _check(fut.result(timeout=0), ref)


def test_llm_engine_fuzz_random_schedules():
    """Slot-isolation property for the modern family: random geometry and
    submit/tick interleavings reproduce one-shot llm_beam_search (seeded,
    2 rounds)."""
    from tell_tpu.models.llm_decoder import llm_beam_search
    from tell_tpu.serving.engine import LLMDecodeEngine

    rng = np.random.RandomState(77)
    for round_i in range(2):
        gen_len = int(rng.randint(4, 8))
        cfg, params = _llm_setup(gen_len=gen_len)
        slots = int(rng.randint(2, 4))
        beam = int(rng.randint(2, 4))
        chunk = int(rng.randint(1, 4))
        n_req = int(rng.randint(3, 6))
        reqs = [_llm_request(cfg, 500 + 10 * round_i + i)
                for i in range(n_req)]
        refs = []
        for r in reqs:
            out = llm_beam_search(params, cfg, r, beam_size=beam,
                                  early_stop=True)
            refs.append({k: np.asarray(v[0]) for k, v in out.items()})

        eng = LLMDecodeEngine(params, cfg, slots=slots, beam=beam,
                              chunk_steps=chunk,
                              max_lag=int(rng.randint(1, 4)))
        futs = []
        i, live = 0, True
        while i < n_req or live:
            for _ in range(int(rng.randint(0, 3))):
                if i < n_req:
                    futs.append(eng.submit(reqs[i]))
                    i += 1
            live = eng.tick()
        eng.run_until_drained()
        for fut, ref in zip(futs, refs):
            _check(fut.result(timeout=0), ref)
        assert sorted(eng.free) == list(range(slots))


def test_engine_poison_fails_futures_fast():
    """A dead tick loop must fail pending and queued requests immediately
    (server._tick_loop calls poison on crash) instead of leaving clients
    hanging to their timeout; later submits fail fast too."""
    cfg, params = _setup(gen_len=4)
    eng = DecodeEngine(params, cfg, slots=2, beam=2, chunk_steps=2)
    req = _request(cfg, 1)
    f_queued = eng.submit(req)          # never ticked: stays queued
    boom = RuntimeError("tick loop died")
    eng.poison(boom)
    with pytest.raises(RuntimeError, match="tick loop died"):
        f_queued.result(timeout=1)
    f_late = eng.submit(req)
    with pytest.raises(RuntimeError, match="tick loop died"):
        f_late.result(timeout=1)
