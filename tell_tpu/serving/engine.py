"""Continuous-batching beam-decode engine.

The micro-batcher (`serving/batcher.py`) decodes each micro-batch to
completion: every request in a batch waits for the slowest one, and a chip
serving streaming traffic idles between batches. This engine keeps ONE
resident fixed-shape beam-search state with `slots` request slots and lets
requests join and leave at chunk boundaries (vLLM-style continuous
batching, expressed the XLA way — all state surgery is `dynamic_update_slice`
on a fixed pytree, never a shape change):

* `admit` scatters newly encoded requests' context K/V into slot rows,
  zeroes those slots' conv ring buffers, and resets their beam
  bookkeeping — admissions COALESCE: up to TELL_TPU_ADMIT_BATCH queued
  requests ride one compiled program (power-of-two ladder), because an
  admit program costs ~0.22 ms x total slots on-device however little it
  writes (round-5 measurement — per-request admits were the many-slot
  capacity collapse);
* `chunk` advances ALL live slots by up to `chunk_steps` beam-search steps
  (the exact candidate math of `models/beam.py:beam_search_core`, with the
  global step counter replaced by a per-slot counter `t` — decode rows
  carry per-row positions, `ops/positional.py:sinusoidal_embed`);
* finished slots freeze (their only candidate is a zero-cost <pad>
  continuation, exactly the beam_search_core mechanism), are harvested on
  the host, and their slots take the next queued request.

Harvest is PIPELINED: each chunk also emits two packed report arrays
(int32 bookkeeping + float32 scores) whose device->host copy starts
asynchronously; the host inspects a report only once it has arrived
(`is_ready`), up to `max_lag` chunks later, so result transfer rides
behind the next chunks' compute instead of stalling the decode loop. This
matters doubly on remote/tunneled devices where a blocking fetch carries a
large fixed cost (a round-5 lazy-fetch variant that skipped the eager
async copies degraded streaming latency ~15x — see _chunk_impl's note).
Reports are guarded by a per-slot admission generation: a report that
predates a slot's re-admission can never resolve the new request with the
old request's beams.

A slot's caption therefore NEVER depends on which other requests share the
engine (asserted against one-shot `beam_search` in
tests/test_engine.py::test_engine_matches_one_shot_beam_search, with
staggered admissions).

The reference's serving has no analogue: its ZeroMQ ventilator hands whole
jobs to worker processes which decode them to completion
(/root/reference/tell/server/base.py:30-191, tell/tasks/captioner.py:50-444).
"""
from __future__ import annotations

import collections
import queue as _queue
import threading
from concurrent.futures import Future

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CaptionerConfig
from ..models.captioner import build_contexts
from ..models.decoder import (decode_softmax_quant, decode_step_quant,
                              decode_vocab_table, decoder_step,
                              decoder_top_k, init_decode_state,
                              precompute_context_kv_cat)


def _mask_write(full: jax.Array, new, b: jax.Array) -> jax.Array:
    """Write `new` (broadcastable to one leading-axis row) into row b of
    `full` via a masked where. Unlike a scatter this stays
    collective-free when the leading axis is sharded over a mesh — every
    device rewrites only its own rows (the replicated `new` broadcasts) —
    at the cost of touching every row, so it is the mesh-only path."""
    B = full.shape[0]
    m = (jnp.arange(B) == b).reshape((B,) + (1,) * (full.ndim - 1))
    return jnp.where(m, jnp.asarray(new).astype(full.dtype), full)


def _rows_write(full: jax.Array, new, bs: jax.Array) -> jax.Array:
    """Batched row scatter — the single-chip admit path: rows `bs` [N]
    of `full` take `new` (broadcastable to [N, ...]). One state pass
    admits N requests: the round-5 capacity probes measured ~0.22 ms x
    TOTAL slots per admit program regardless of how few bytes it writes
    (a full-state pass per admission), which made per-request admits the
    slots=128 collapse — 512 admits x 28.8 ms = the entire 16 s wall.
    Duplicate ids in `bs` (shape-ladder padding) carry identical rows,
    so last-writer-wins is benign."""
    N = bs.shape[0]
    rows = jnp.broadcast_to(jnp.asarray(new).astype(full.dtype),
                            (N,) + full.shape[1:])
    return full.at[bs].set(rows)


def _rows_write_mesh(full: jax.Array, new, bs: jax.Array) -> jax.Array:
    """Mesh-mode batched writer: N static masked writes inside ONE
    program (collective-free on a slot-sharded leading axis; the scatter
    in _rows_write would gather across shards)."""
    N = bs.shape[0]
    rows = jnp.broadcast_to(jnp.asarray(new).astype(full.dtype),
                            (N,) + full.shape[1:])
    out = full
    for i in range(N):
        out = _mask_write(out, rows[i], bs[i])
    return out


class DecodeEngine:
    """Slot-based continuous beam decode for the flagship captioner.

    params/cfg: captioner params + CaptionerConfig. `slots` concurrent
    requests x `beam` beams, decode advancing in `chunk_steps`-step jitted
    chunks. Feature batches (image_grid / article_hiddens / article_mask /
    face_embeds / obj_embeds, leading dim 1) go in via `submit`; a Future
    resolving to {"token_ids": [beam, gen_len+1], "scores": [beam],
    "finished": [beam]} comes back (same contract as beam_search, minus
    the batch dim).

    The beam/slot bookkeeping is model-agnostic; the flagship-specific
    pieces live in the `_model_*`/`_dyn_*` hooks, overridden by
    LLMDecodeEngine for the transformer_modern family.
    """

    def __init__(self, params: dict, cfg, *,
                 slots: int = 8, beam: int = 5,
                 chunk_steps: int = 8, length_penalty: float = 0.0,
                 max_lag: int = 8, mesh=None, dtype=jnp.float32):
        assert slots >= 2, "a 1-slot engine is just beam_search"
        self.cfg = cfg
        self.dcfg = dcfg = self._decode_cfg(cfg)
        self.slots, self.beam = slots, beam
        self.chunk_steps = chunk_steps
        self.length_penalty = length_penalty
        self.params = params
        self.mesh = mesh
        B, K, L = slots, beam, cfg.gen_len
        if mesh is not None and slots % mesh.shape["data"]:
            raise ValueError(f"engine slots {slots} must divide over the "
                             f"mesh data axis {mesh.shape['data']}")

        # resident state, built from zero contexts (slots start empty):
        # aux = per-engine constants (e.g. the merged embed table), kv =
        # static context KV, dyn = per-row model state (conv ring buffers /
        # self-attention caches)
        self._aux, kv0, dyn0 = self._model_init(params, dtype)
        self.state = {
            "kv": kv0, **dyn0,
            "t": jnp.full((B,), L, jnp.int32),      # per-slot step count
            "tokens": jnp.full((B, K), dcfg.bos_id, jnp.int32),
            "scores": jnp.zeros((B, K), jnp.float32),
            "finished": jnp.ones((B, K), bool),     # empty slots are inert
            "lengths": jnp.zeros((B, K), jnp.int32),
            "paths": jnp.full((B, K, L + 1), dcfg.pad_id, jnp.int32),
        }

        # KV leaves are classified STRUCTURALLY, not by dim-0 value: a
        # leaf whose shape is identical for B slots and for a single
        # request carries no slot dim (segment ids etc.) and is SHARED —
        # admissions must not touch it, and on a mesh it replicates. A
        # [S] leaf whose length happens to equal B or B*K would otherwise
        # silently misclassify.
        zb1 = jax.tree.map(lambda x: x[:1], self._zero_batch(dtype))
        kv1_s = jax.eval_shape(self._encode_kv, params, zb1)
        self._kv_shared = jax.tree.map(
            lambda full, s: tuple(full.shape) == tuple(s.shape),
            self.state["kv"], kv1_s)

        if mesh is not None:
            # slot-major leaves shard over "data"; everything else (params,
            # aux constants, shared segment-id leaves) replicates. All
            # per-slot chunk math is row-local, so the compiled programs'
            # only cross-chip traffic is the loop's all-done reduction
            # (parallel/mesh.py is the training-side analogue).
            from jax.sharding import NamedSharding, PartitionSpec as P
            row = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())

            kv = jax.tree.map(
                lambda l, s: jax.device_put(
                    l, rep if l.shape == s.shape else row),
                self.state["kv"], kv1_s)

            def place(x):  # non-kv leaves: built with leading B or B*K
                sharded = getattr(x, "ndim", 0) >= 1 \
                    and x.shape[0] in (B, B * K)
                return jax.device_put(x, row if sharded else rep)

            self.state = {**jax.tree.map(
                place, {k: v for k, v in self.state.items() if k != "kv"}),
                "kv": kv}
            self._aux = jax.tree.map(
                lambda x: jax.device_put(x, rep), self._aux)
            self.params = jax.device_put(params, rep)

        # params/aux ride as call-time args — closure arrays would
        # be baked into the HLO as constants (see training/train_step.py)
        self._admit = jax.jit(self._admit_many_impl, donate_argnums=1)
        self._chunk = jax.jit(self._chunk_impl, donate_argnums=2)
        # admission bursts coalesce up to this many requests into one
        # admit program (power-of-two ladder, one compile per rung);
        # the cap is floored to a power of two so burst padding and the
        # warm() ladder enumerate exactly the same compiled shapes
        import os as _os
        cap = max(1, min(slots,
                         int(_os.environ.get("TELL_TPU_ADMIT_BATCH",
                                             "16"))))
        self._admit_cap = 1 << (cap.bit_length() - 1)

        self.max_lag = max_lag
        self.free: list[int] = list(range(slots))
        self.pending: dict[int, Future] = {}
        self.queue: "_queue.Queue[tuple[dict, Future]]" = _queue.Queue()
        self.stats = {"requests": 0, "chunks": 0}
        self._poisoned: BaseException | None = None
        self._lock = threading.Lock()
        # submit() must not stall behind tick()'s chunk dispatch / blocking
        # report drain, so the poisoned-check + queue.put ride a dedicated
        # cheap lock; poison() takes BOTH (always _lock first) so a put can
        # never land after poison() drained the queue
        self._submit_lock = threading.Lock()
        # per-slot admission generation + in-flight packed reports, oldest
        # first: (report_i32, report_f32, gen-at-chunk-time)
        self._gen = np.zeros(slots, np.int64)
        self._reports: collections.deque = collections.deque()

    # ------------------------------------------------------------------
    # model hooks (flagship captioner; LLMDecodeEngine overrides)
    # ------------------------------------------------------------------

    def _decode_cfg(self, cfg):
        """The config object carrying vocab/pad/bos/eos + contexts."""
        return cfg.decoder

    def _model_init(self, params: dict, dtype
                    ) -> tuple[dict, object, dict]:
        """-> (aux constants, zero-context KV, per-row dynamic state)."""
        contexts0 = build_contexts(params, self.cfg,
                                   self._zero_batch(dtype))
        dstate = init_decode_state(params["decoder"], self.dcfg, contexts0,
                                   self.slots, beam=self.beam, dtype=dtype)
        aux = {"embed_table": dstate.pop("embed_table"),
               "vocab_table": decode_vocab_table(params["decoder"],
                                                 self.dcfg, dtype),
               # int8 decode levers (TELL_TPU_DEC8 / _DEC8_SM): quantized
               # once here, closed over by every chunk like the KV
               "quant_sm": decode_softmax_quant(params["decoder"],
                                                self.dcfg),
               "step_quant": decode_step_quant(params["decoder"],
                                               self.dcfg)}
        dstate.pop("step")  # replaced by the per-slot counter
        return aux, dstate.pop("kv"), dstate

    def _encode_kv(self, params: dict, batch1: dict):
        """One request's feature batch (leading dim 1) -> context KV."""
        contexts = build_contexts(params, self.cfg, batch1)
        return precompute_context_kv_cat(params["decoder"], self.dcfg,
                                         contexts, beam=self.beam)

    def _dyn_reset(self, state: dict, bs: jax.Array, w) -> dict:
        """Zero slots `bs`'s rows of the per-row dynamic state (conv
        window buffers)."""
        B, K = self.slots, self.beam
        return {"conv": [w(buf.reshape((B, K) + buf.shape[1:]), 0.0, bs
                           ).reshape(buf.shape)
                         for buf in state["conv"]]}

    def _model_step(self, params: dict, aux: dict, state: dict,
                    step_rows: jax.Array
                    ) -> tuple[jax.Array, jax.Array, dict]:
        """One decode step over all rows -> (cand log-probs [R, K],
        cand ids [R, K], new dynamic state)."""
        dyn = {"conv": state["conv"], "kv": state["kv"],
               "embed_table": aux["embed_table"], "step": step_rows}
        feats, dstate, _ = decoder_step(
            params["decoder"], self.dcfg,
            state["tokens"].reshape(self.slots * self.beam), dyn,
            quant=aux.get("step_quant"))
        lp, ids = decoder_top_k(params["decoder"], self.dcfg, feats,
                                self.beam, vocab_table=aux["vocab_table"],
                                quant_sm=aux.get("quant_sm"))
        return lp, ids, {"conv": dstate["conv"]}

    def _dyn_reorder(self, dyn: dict, parent: jax.Array) -> dict:
        """Reorder per-row dynamic state by parent beam WITHIN each slot —
        a [B, K] take_along_axis (shard-local on a slot-sharded mesh),
        never a flat gather across the whole B*K axis."""
        B, K = self.slots, self.beam
        conv = [jnp.take_along_axis(
                    buf.reshape((B, K) + buf.shape[1:]),
                    parent.reshape((B, K) + (1,) * (buf.ndim - 1)),
                    axis=1).reshape(buf.shape)
                for buf in dyn["conv"]]
        return {"conv": conv}

    # ------------------------------------------------------------------
    # jitted programs
    # ------------------------------------------------------------------

    def _zero_batch(self, dtype) -> dict:
        cfg, dcfg = self.cfg, self.dcfg
        B = self.slots
        z = lambda *s: jnp.zeros(s, dtype)  # noqa: E731
        batch = {}
        for spec in dcfg.contexts:
            if spec.name == "image":
                batch["image_grid"] = z(B, spec.max_len, spec.kv_dim)
            elif spec.name == "article":
                if cfg.weigh_bert:
                    batch["article_hiddens"] = z(B, spec.max_len,
                                                 cfg.num_bert_layers,
                                                 spec.kv_dim)
                else:
                    batch["article"] = z(B, spec.max_len, spec.kv_dim)
                batch["article_mask"] = jnp.ones((B, spec.max_len), bool)
            elif spec.name == "faces":
                batch["face_embeds"] = z(B, spec.max_len, spec.kv_dim)
            elif spec.name == "obj":
                batch["obj_embeds"] = z(B, spec.max_len, spec.kv_dim)
        return batch

    def _admit_many_impl(self, params: dict, state: dict, batchN: dict,
                         bs: jax.Array) -> dict:
        """Encode N requests' feature batches (stacked, leading dim N)
        into context KV and scatter them into slots `bs` [N] — ONE
        dispatch and one state pass for the whole admission burst.
        Round-5 finding: a per-request admit program costs ~0.22 ms x
        TOTAL slots on-device regardless of bytes written, so admission
        bursts (every generation turnover under saturation) dominated
        many-slot capacity — batched admission is what restored it
        (tools/engine_capacity.py)."""
        K, L = self.beam, self.cfg.gen_len
        dcfg = self.dcfg
        kvN = self._encode_kv(params, batchN)
        w = _rows_write_mesh if self.mesh is not None else _rows_write
        kv = jax.tree.map(
            lambda full, new, shared: full if shared else w(full, new, bs),
            state["kv"], kvN, self._kv_shared)
        N = bs.shape[0]
        scores0 = jnp.broadcast_to(
            jnp.asarray([0.0] + [-1e9] * (K - 1), jnp.float32), (N, K))
        paths0 = jnp.broadcast_to(
            jnp.full((K, L + 1), dcfg.pad_id, jnp.int32)
            .at[:, 0].set(dcfg.bos_id), (N, K, L + 1))
        return {**state, "kv": kv, **self._dyn_reset(state, bs, w),
                "t": w(state["t"], 0, bs),
                "tokens": w(state["tokens"], dcfg.bos_id, bs),
                "scores": w(state["scores"], scores0, bs),
                "finished": w(state["finished"], False, bs),
                "lengths": w(state["lengths"], 0, bs),
                "paths": w(state["paths"], paths0, bs)}

    def _step(self, params: dict, aux: dict, state: dict) -> dict:
        """One beam step over all slots — beam_search_core's candidate math
        with a per-slot step counter."""
        dcfg = self.dcfg
        B, K, L = self.slots, self.beam, self.cfg.gen_len
        t, finished = state["t"], state["finished"]
        # a slot at the length cap freezes exactly like a finished beam
        eff_finished = finished | (t >= L)[:, None]

        cand_lp, cand_ids, dstate = self._model_step(
            params, aux, state, jnp.repeat(t, K))
        cand_lp = cand_lp.reshape(B, K, K)
        cand_ids = cand_ids.reshape(B, K, K)

        fin_lp = jnp.full((K,), -jnp.inf).at[0].set(0.0)
        cand_lp = jnp.where(eff_finished[:, :, None], fin_lp[None, None, :],
                            cand_lp)
        cand_ids = jnp.where(eff_finished[:, :, None], dcfg.pad_id, cand_ids)

        total = state["scores"][:, :, None] + cand_lp          # [B, K, K]
        top_scores, top_flat = jax.lax.top_k(total.reshape(B, K * K), K)
        parent = top_flat // K
        tok = jnp.take_along_axis(cand_ids.reshape(B, K * K), top_flat,
                                  axis=-1).astype(jnp.int32)

        def g(x):
            return jnp.take_along_axis(
                x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)),
                axis=1)

        was_finished = g(eff_finished)
        new_finished = g(finished) | (tok == dcfg.eos_id)
        new_lengths = g(state["lengths"]) + (~was_finished).astype(jnp.int32)
        tok = jnp.where(was_finished, dcfg.pad_id, tok)
        # write at per-slot position t+1 (past the cap the one-hot is empty)
        write = jnp.arange(L + 1)[None, None, :] == (t + 1)[:, None, None]
        new_paths = jnp.where(write, tok[:, :, None], g(state["paths"]))

        return {**state, **self._dyn_reorder(dstate, parent),
                "t": jnp.minimum(t + 1, L),
                "tokens": tok, "scores": top_scores,
                "finished": new_finished, "lengths": new_lengths,
                "paths": new_paths}

    def _chunk_impl(self, params: dict, aux: dict, state: dict):
        B, K, L = self.slots, self.beam, self.cfg.gen_len

        def done(s):
            return jnp.all(s["finished"] | (s["t"] >= L)[:, None])

        def cond(c):
            i, s = c
            return (i < self.chunk_steps) & ~done(s)

        def body(c):
            i, s = c
            return i + 1, self._step(params, aux, s)

        _, state = jax.lax.while_loop(cond, body, (0, state))
        # pack everything harvest needs into two arrays so the host fetch
        # is two transfers, started asynchronously by tick(). (A round-5
        # "two-tier" variant — tiny per-chunk status, big paths report
        # fetched lazily on finish — was built while hunting the slots=128
        # collapse and REVERTED: the collapse turned out to be per-request
        # admit programs, and removing the async copy start degraded the
        # streaming latency probe ~15x — a lazily-started fetch pays its
        # whole tunnel RTT synchronously inside the tick loop, whereas the
        # eager async copy has already landed by harvest time.)
        report_i = jnp.concatenate(
            [state["t"][:, None], state["finished"].astype(jnp.int32),
             state["lengths"], state["paths"].reshape(B, K * (L + 1))],
            axis=1)
        return state, report_i, state["scores"]

    # ------------------------------------------------------------------
    # host loop
    # ------------------------------------------------------------------

    def warm(self, batch1: dict) -> None:
        """Compile every admission-ladder rung + the chunk program by
        DRIVING THE PRODUCTION PATH: for each rung, submit that many
        copies of `batch1` in one burst (all slots free -> one admit at
        exactly that rung) and drain. Anything less literal was measured
        to miss: `jit.lower().compile()` does not populate the dispatch
        cache, and a hand-built execution warm produced subtly different
        avals — both left rung compiles landing inside real requests
        (a ~15x streaming-latency regression on the tunneled chip).
        Must be called before serving traffic."""
        assert not self.pending and self.queue.empty(), \
            "warm() must run before traffic"
        rung = 1
        while True:
            futs = [self.submit(batch1) for _ in range(rung)]
            self.run_until_drained()
            for f in futs:
                f.result(timeout=900)
            if rung >= self._admit_cap:
                break
            rung = min(rung * 2, self._admit_cap)

    def submit(self, batch1: dict) -> Future:
        """batch1: feature dict with leading dim 1 (one request)."""
        fut: Future = Future()
        # check-and-enqueue must be atomic with poison(): a put() racing a
        # dying tick loop would otherwise land after poison() drained the
        # queue and hang the client until its timeout. Uses the dedicated
        # submit lock so client HTTP threads never wait behind tick()'s
        # chunk dispatch or a blocking device fetch.
        with self._submit_lock:
            if self._poisoned is not None:
                fut.set_exception(self._poisoned)
                return fut
            self.queue.put((batch1, fut))
            self.stats["requests"] += 1
        return fut

    def poison(self, exc: BaseException) -> None:
        """Fail every pending and queued request immediately — called when
        the tick loop dies so clients get the error instead of hanging to
        their timeout (the reference's ZeroMQ stack simply lost requests
        of a dead worker, tell/server/base.py)."""
        with self._lock, self._submit_lock:
            self._poisoned = exc
            for fut in self.pending.values():
                if not fut.done():
                    fut.set_exception(exc)
            self.pending.clear()
            while not self.queue.empty():
                try:
                    _, fut = self.queue.get_nowait()
                except _queue.Empty:
                    break
                if not fut.done():
                    fut.set_exception(exc)

    def _admit_queued(self):
        while self.free and not self.queue.empty():
            grabbed = []          # (slot, batch1, fut)
            while self.free and len(grabbed) < self._admit_cap:
                try:
                    batch1, fut = self.queue.get_nowait()
                except _queue.Empty:
                    break
                grabbed.append((self.free.pop(), batch1, fut))
            if not grabbed:
                return
            n = len(grabbed)
            padded = 1
            while padded < n:
                padded *= 2
            bs = [b for b, _, _ in grabbed]
            reqs = [r for _, r, _ in grabbed]
            if padded > n:   # shape-pad to the ladder rung by DUPLICATING
                # the last admission: same slot id, same rows — the
                # duplicate scatter writes identical data (benign)
                bs += [bs[-1]] * (padded - n)
                reqs += [reqs[-1]] * (padded - n)
            batchN = {k: jnp.concatenate(
                [jnp.asarray(r[k]) for r in reqs], axis=0)
                for k in reqs[0]}
            self.state = self._admit(self.params, self.state, batchN,
                                     jnp.asarray(bs, jnp.int32))
            for b, _, fut in grabbed:
                self._gen[b] += 1
                self.pending[b] = fut

    def _harvest_report(self, report_i, report_f, gen):
        """Resolve futures from one arrived (host-side) report. `gen` is the
        per-slot admission generation at the report's chunk time — rows
        whose slot was re-admitted since are stale and skipped."""
        K, L = self.beam, self.cfg.gen_len
        ri = np.asarray(report_i)
        scores_all = np.asarray(report_f).astype(np.float32)
        t = ri[:, 0]
        fin = ri[:, 1:1 + K].astype(bool)
        lengths_all = ri[:, 1 + K:1 + 2 * K]
        paths_all = ri[:, 1 + 2 * K:].reshape(self.slots, K, L + 1)
        done = fin.all(axis=1) | (t >= L)
        for b in [b for b in self.pending
                  if done[b] and gen[b] == self._gen[b]]:
            fut = self.pending.pop(b)
            scores, lengths = scores_all[b], lengths_all[b]
            if self.length_penalty > 0:
                norm = ((5.0 + lengths.astype(np.float32)) / 6.0
                        ) ** self.length_penalty
                ranked = scores / norm
            else:
                ranked = scores
            order = np.argsort(-ranked, kind="stable")
            fut.set_result({"token_ids": paths_all[b][order],
                            "scores": ranked[order],
                            "finished": fin[b][order]})
            self.free.append(b)

    def _drain_reports(self, block_first: bool = False):
        """Harvest every in-flight report that has reached the host;
        block_first forces the oldest through (used to bound the pipeline
        and to flush at drain time)."""
        while self._reports:
            report_i, report_f, gen = self._reports[0]
            if not block_first and not report_i.is_ready():
                return
            self._reports.popleft()
            self._harvest_report(report_i, report_f, gen)
            block_first = False

    def tick(self) -> bool:
        """Harvest arrived reports -> admit -> chunk (async report copy).
        Returns True while any slot or report is in flight."""
        with self._lock:
            self._drain_reports()
            if not self.pending:
                # every future is resolved; whatever is still in flight
                # can resolve nothing (reports only settle pending slots)
                self._reports.clear()
            self._admit_queued()
            if self.pending:
                self.state, report_i, report_f = self._chunk(
                    self.params, self._aux, self.state)
                report_i.copy_to_host_async()
                report_f.copy_to_host_async()
                self._reports.append((report_i, report_f, self._gen.copy()))
                self.stats["chunks"] += 1
                if len(self._reports) > self.max_lag:
                    self._drain_reports(block_first=True)
                    # the blocking drain may have freed finished slots:
                    # refill them now so the next chunk runs full
                    self._admit_queued()
            # queued-but-unadmitted requests are in-flight work too: the
            # backpressure drain above can harvest EVERY report (pending
            # and _reports both empty) while the queue still holds
            # requests — reporting "drained" then strands them
            # (run_until_drained exits, futures never resolve)
            return (bool(self.pending) or bool(self._reports)
                    or not self.queue.empty())

    def run_until_drained(self):
        """Convenience for offline use: tick until queue + slots empty.

        No forced blocking drain when saturated: tick() already bounds
        in-flight reports at max_lag and blocks on the oldest past that,
        which both frees finished slots and caps dead-work chunks. An
        earlier version force-drained the oldest report on every loop
        iteration whenever all slots were busy with requests queued —
        measured to HALVE saturated throughput on the tunneled chip
        (43.6 vs 98.4 captions/s at slots=32 beam-5 len=100): each
        blocking fetch serialized the host with the device instead of
        letting the async report pipeline run max_lag deep."""
        while not self.queue.empty() or self.pending or self._reports:
            if not self.tick():
                break


class LLMDecodeEngine(DecodeEngine):
    """Continuous-batching engine for the transformer_modern family
    (models/llm_decoder.py): same slot/beam bookkeeping, with the dynamic
    per-row state being the causal self-attention KV caches instead of
    conv ring buffers, and per-slot step counters feeding RoPE positions
    and per-row cache writes (_self_attn_step's per-row path).

    cfg: LLMConfig. Requests are encoded feature batches (image_grid /
    article / article_mask [+ faces / obj]), leading dim 1.
    """

    def _decode_cfg(self, cfg):
        return cfg  # LLMConfig carries vocab ids + contexts directly

    def _zero_batch(self, dtype) -> dict:
        cfg, B = self.cfg, self.slots
        z = lambda *s: jnp.zeros(s, dtype)  # noqa: E731
        batch = {}
        for spec in cfg.contexts:
            if spec.name == "image":
                batch["image_grid"] = z(B, spec.max_len, spec.kv_dim)
            elif spec.name == "article":
                batch["article"] = z(B, spec.max_len, spec.kv_dim)
                batch["article_mask"] = jnp.ones((B, spec.max_len), bool)
            elif spec.name == "faces":
                batch["face_embeds"] = z(B, spec.max_len, spec.kv_dim)
            elif spec.name == "obj":
                batch["obj_embeds"] = z(B, spec.max_len, spec.kv_dim)
        return batch

    def _model_init(self, params: dict, dtype):
        from ..models.llm_decoder import (_build_contexts,
                                          init_llm_decode_state)
        contexts0 = _build_contexts(params, self.cfg,
                                    self._zero_batch(dtype))
        dstate = init_llm_decode_state(params, self.cfg, contexts0,
                                       self.slots, beam=self.beam,
                                       dtype=dtype)
        dstate.pop("step")  # per-slot counter instead
        return {}, dstate.pop("kv"), dstate

    def _encode_kv(self, params: dict, batch1: dict):
        from ..models.llm_decoder import _build_contexts
        contexts = _build_contexts(params, self.cfg, batch1)
        return precompute_context_kv_cat(params, self.cfg, contexts,
                                         beam=self.beam)

    def _dyn_reset(self, state: dict, bs: jax.Array, w) -> dict:
        B, K = self.slots, self.beam
        self_kv = [
            {n: w(c[n].reshape((B, K) + c[n].shape[1:]), 0.0, bs
                  ).reshape(c[n].shape) for n in ("k", "v")}
            for c in state["self_kv"]]
        return {"self_kv": self_kv}

    def _model_step(self, params: dict, aux: dict, state: dict,
                    step_rows: jax.Array):
        from ..models.llm_decoder import llm_decoder_step, tied_top_k
        feats, st, _ = llm_decoder_step(
            params, self.cfg,
            state["tokens"].reshape(self.slots * self.beam),
            {"self_kv": state["self_kv"], "kv": state["kv"],
             "step": step_rows})
        lp, ids = tied_top_k(params, self.cfg, feats, self.beam)
        return lp, ids, {"self_kv": st["self_kv"]}

    def _dyn_reorder(self, dyn: dict, parent: jax.Array) -> dict:
        B, K = self.slots, self.beam
        self_kv = [
            {n: jnp.take_along_axis(
                    c[n].reshape((B, K) + c[n].shape[1:]),
                    parent.reshape((B, K) + (1,) * (c[n].ndim - 1)),
                    axis=1).reshape(c[n].shape) for n in ("k", "v")}
            for c in dyn["self_kv"]]
        return {"self_kv": self_kv}
