"""HTTP caption service.

Keeps the API surface of the reference demo backend
(/root/reference/demo/backend/tat/views.py:26-69): POST /caption takes an
article (+ optional image features) and returns the generated caption with
per-word attention payloads; POST /scrape fetches and sections an article
URL (network-gated). The ZeroMQ ventilator/worker/sink + Django + client
stack collapses into this one process: a threading HTTP frontend over a
MicroBatcher over one jitted batched decode.
"""
from __future__ import annotations

import json
import logging
import queue as _queue_mod
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CaptionerConfig
from ..data.tokenizer import RobertaTokenizer
from .batcher import MicroBatcher

log = logging.getLogger("tell_tpu.serving")


class CaptionService:
    """Model worker: batches of raw requests -> captions (+ attention).

    Mirrors CaptioningWorker (/root/reference/tell/tasks/captioner.py:50-444)
    minus the per-request GPU fan-out: one batched decode per micro-batch.
    """

    def __init__(self, params: dict, frozen: dict, cfg: CaptionerConfig,
                 tokenizer: RobertaTokenizer, max_batch: int = 32,
                 article_len: int | None = None,
                 need_attention: bool = False,
                 adapter=None, mesh=None,
                 engine_slots: int = 0, engine_beam: int = 5,
                 engine_length_penalty: float = 0.0,
                 engine_buckets: bool = False,
                 encode_batch: int = 8):
        """engine_slots > 0 switches decode to the continuous-batching beam
        engine (serving/engine.py): requests join and leave a resident
        slot-based beam search at chunk boundaries instead of decoding in
        lock-step micro-batches. Flagship captioner only (adapter=None).

        encode_batch: concurrent requests' article encodes coalesce into
        one jitted tower pass of up to this many rows before engine
        admission (serving/encode_batcher.py) — the round-4 B=1 per-
        request encode is the encode_batch=1 degenerate case."""
        from ..models.captioner import encode_contexts, generate

        # model registry adapter (pointer/LSTM/modern models serve through
        # the same API; default = the multi-context captioner)
        gen = generate if adapter is None else adapter.generate
        model_cfg = cfg if adapter is None else adapter.config
        cap_cfg = getattr(model_cfg, "captioner", model_cfg)
        self.cfg = cap_cfg
        cfg = cap_cfg
        self.tokenizer = tokenizer
        self.need_attention = need_attention
        # the modern LM config exposes contexts/pad ids at the top level
        dcfg = getattr(cfg, "decoder", cfg)
        if article_len is None:  # derive from the article context spec
            article_len = next((c.max_len for c in dcfg.contexts
                                if c.name == "article"), 512)
        self.article_len = article_len
        self._article_buckets = tuple(sorted(
            {max(16, article_len // 4), max(16, article_len // 2),
             article_len}))  # e.g. 512 -> (128, 256, 512)
        if adapter is not None and adapter.encode is not None:
            encode = adapter.encode
        else:
            encode = lambda fr, b: encode_contexts(fr, cap_cfg, b)  # noqa:E731

        import inspect
        gen_params = inspect.signature(gen).parameters
        takes_weights = "need_weights" in gen_params

        def decode_fn(params, frozen, batch):
            # towers ride as call-time args — closure arrays would be baked
            # into the HLO as constants (see training/train_step.py note),
            # once per compiled article bucket
            batch = encode(frozen, batch)
            # pass attention-map capture to any generate that supports it
            # (captioner + LSTM do; the pointer decode does not)
            kwargs = {"need_weights": need_attention} if takes_weights else {}
            return gen(params, model_cfg, batch, **kwargs)

        self._decode = jax.jit(decode_fn)
        # kept un-jitted for numerics_ab(): fresh traces pick up flipped
        # TELL_TPU_KV8/TELL_TPU_APPROX_TOPK env flags (read at trace time)
        self._decode_fn = decode_fn
        if adapter is None:
            from ..models.captioner import predict_forced

            def forced_fn(params, frozen, batch, token_ids):
                return predict_forced(params, cap_cfg,
                                      encode(frozen, batch), token_ids)

            self._forced_fn = forced_fn
        else:   # adapters own their decode loop; fall back to free-running
            self._forced_fn = None
        self.ab_report: dict | None = None
        # Multi-chip serving (the ZeroMQ worker fan-out of the reference,
        # tell/server/base.py:116-120, becomes one batch-sharded program):
        # batch rows ride the mesh's "data" axis, params/towers replicate.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(mesh, PartitionSpec())
            put = lambda t: jax.device_put(t, rep)  # noqa: E731
            params = jax.tree.map(put, params)
            frozen = jax.tree.map(
                lambda x: put(x) if hasattr(x, "dtype") else x, frozen)
            if max_batch % mesh.shape["data"]:
                raise ValueError(
                    f"max_batch {max_batch} must be divisible by the mesh "
                    f"data axis {mesh.shape['data']}")
        # device arrays up front: numpy params/towers (orbax restores host
        # numpy) would re-transfer host->device on every micro-batch
        as_dev = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, t)
        from ..ops.quant import maybe_quantize_frozen
        self._frozen = as_dev(maybe_quantize_frozen(frozen))
        self._params = as_dev(params)
        self.max_batch = max_batch
        def spec_of(name):
            if any(c.name == name for c in dcfg.contexts):
                c = dcfg.context(name)
                return (c.max_len, c.kv_dim)
            return (0, 0)

        self._spec = {"faces": spec_of("faces"), "obj": spec_of("obj"),
                      "image": spec_of("image")}
        self._needs_copy_masks = (adapter is not None
                                  and adapter.name.startswith("pointer"))
        # raw-image requests: compute grid/face/object features from the
        # towers at pack time (the reference worker's get_faces/get_objects
        # staging, captioner.py:291-362) when towers are available AND the
        # model has the matching context
        from .vision import VisionPipeline
        self.vision = VisionPipeline(
            self._frozen,
            wanted={"image": self._spec["image"][0],
                    "faces": self._spec["faces"][0],
                    "obj": self._spec["obj"][0]})
        self.batcher = MicroBatcher(self._run, max_batch=max_batch)
        self._close_lock = threading.Lock()
        self._closed = False

        self.engine = None
        if engine_slots:
            if adapter is not None and adapter.name not in ("captioner",
                                                            "modern"):
                raise ValueError(
                    "continuous batching serves the captioner and modern "
                    f"families only (got adapter {adapter.name!r})")
            modern = adapter is not None and adapter.name == "modern"
            if modern and need_attention:
                raise ValueError("attention replay is captioner-only; "
                                 "drop --attention for the modern engine")
            # with --mesh-data the resident slot state shards over the
            # "data" axis (slots divide across chips; admissions/chunks
            # are collective-free row-local programs)
            from .engine import DecodeEngine, LLMDecodeEngine
            eng_cls = LLMDecodeEngine if modern else DecodeEngine

            import dataclasses

            def cfg_at(w: int):
                """cap_cfg with the article context capped at width w."""
                tgt = getattr(cap_cfg, "decoder", cap_cfg)
                new_ctx = tuple(dataclasses.replace(c, max_len=w)
                                if c.name == "article" else c
                                for c in tgt.contexts)
                if tgt is not cap_cfg:
                    return dataclasses.replace(
                        cap_cfg, decoder=dataclasses.replace(
                            tgt, contexts=new_ctx))
                return dataclasses.replace(cap_cfg, contexts=new_ctx)

            # --engine-buckets: one resident engine per article bucket —
            # the per-step K/V stream is proportional to the article width,
            # so a 128-token article decoding in a 512-wide slot pays ~4x
            # the HBM traffic it needs. Requests route to the smallest
            # bucket that fits (identical captions: pad columns are exactly
            # masked, same argument as micro-batch bucketing).
            widths = (self._article_buckets if engine_buckets
                      else (self.article_len,))
            self.engines = {
                w: eng_cls(self._params, cfg_at(w),
                           slots=engine_slots, beam=engine_beam,
                           length_penalty=engine_length_penalty,
                           mesh=mesh)
                for w in widths}
            self.engine = self.engines[max(widths)]
            self._encode1 = jax.jit(encode)

            # Batched + overlapped article encode in front of the engine:
            # concurrent requests coalesce into one tower pass (power-of-
            # two row ladder, one compile per occupied rung), and the
            # encode dispatch overlaps the engine's decode chunks. With
            # weigh_bert the 25-layer weighted sum folds INTO the encode
            # program so only mixed [*, S, 1024] features reach admission
            # (the per-request _encode1 used to hand the engine the whole
            # [1, S, 25, 1024] hidden stack).
            weigh = adapter is None and getattr(cap_cfg, "weigh_bert",
                                                False)

            def encode_many(fr, p, batch):
                out = encode(fr, batch)
                if weigh and "article_hiddens" in out:
                    from ..models.captioner import weighted_layer_sum
                    out = {**out,
                           "article": weighted_layer_sum(
                               p, out["article_hiddens"])}
                    out.pop("article_hiddens")
                return {k: v for k, v in out.items() if k != "context_ids"}

            self._encode_many = jax.jit(encode_many)
            from .encode_batcher import EncodeBatcher
            self.enc_batchers = {
                w: EncodeBatcher(
                    lambda b: self._encode_many(self._frozen, self._params,
                                                b),
                    self.engines[w].submit,
                    max_batch=max(1, encode_batch))
                for w in widths}
            if need_attention:
                # attention maps come from a teacher-forced replay of the
                # winning caption (models/captioner.py:replay_attention),
                # off the engine's hot path — one B=1 scan per request
                from ..models.captioner import replay_attention
                self._replay = jax.jit(
                    lambda p, b, t: replay_attention(p, cap_cfg, b, t))
            self._eng_stop = threading.Event()

            def _tick_loop():
                engines = list(self.engines.values())
                while not self._eng_stop.is_set():
                    try:
                        live = [e.tick() for e in engines]
                    except Exception as e:  # fail pending requests fast:
                        # a dead tick loop must not leave clients hanging
                        # to their timeout (the reference's ZeroMQ stack
                        # silently lost a dead worker's requests)
                        log.exception("engine tick loop died")
                        for eng in engines:
                            eng.poison(e)
                        return
                    if not any(live):
                        time.sleep(0.005)

            self._eng_thread = threading.Thread(target=_tick_loop,
                                                daemon=True)
            self._eng_thread.start()

    def _context_text(self, req: dict) -> str:
        """Raw `context` text, or the reference worker's location-aware
        window over scraped sections (captioner.py:232-289)."""
        if "context" in req:
            return req["context"]
        if "sections" in req:
            from ..data.readers import assemble_location_aware
            article = {
                "parsed_section": [
                    {"type": sec.get("type", "paragraph"),
                     "text": sec.get("text", "")}
                    for sec in req["sections"]],
                "headline": {"main": req.get("title", "")},
            }
            pos = int(req.get("image_position", 0))
            count = lambda t: len(self.tokenizer.bpe.encode(t))  # noqa:E731
            paragraphs, _ = assemble_location_aware(
                article, pos, count, budget=self.article_len - 2)
            return "\n".join(paragraphs).strip()
        return ""

    @staticmethod
    def _request_image(req: dict) -> dict:
        """Normalize the request's image carrier: the demo's scrape flow
        ships it as sections[image_position].image_data (base64, reference
        captioner.py:271-284); direct requests use image / image_b64."""
        if "image" in req or "image_b64" in req:
            return req
        if "sections" in req:
            try:
                pos = int(req.get("image_position", 0))
                data = req["sections"][pos].get("image_data")
            except (IndexError, TypeError, ValueError):
                data = None
            if data:
                return {**req, "image_b64": data}
        return req

    def _pack(self, requests: list[dict],
              width: int | None = None) -> tuple[dict, list]:
        """Returns (batch, errors) — errors[i] is None or a per-request
        message. A malformed request (bad base64, wrong feature shape) must
        not poison the futures of the other requests sharing its
        micro-batch, so per-request work is isolated here and failed rows
        degrade to an empty context."""
        from ..data.pipeline import entity_occurrences

        B = len(requests)
        errors: list = [None] * B
        prepped = []
        for i, req in enumerate(requests):
            try:
                req = self._request_image(req)
                if "image" in req or "image_b64" in req:
                    req = {**req, **self.vision.process(req)}
            except Exception as e:  # noqa: BLE001 - reported per request
                errors[i] = f"bad request image: {e}"
                req = {"context": req.get("context", "")}
            prepped.append(req)
        requests = prepped
        dcfg = getattr(self.cfg, "decoder", self.cfg)
        all_toks: list = []
        all_masks: list = []
        for i, req in enumerate(requests):
            text = self._context_text(req)
            if self._needs_copy_masks:
                # pointer models: proper-noun masks from the request's
                # `entities` (plain strings, or named-entity dicts with a
                # "text" field as produced by tools/annotate_ner.py);
                # without entities the model simply never copies. One
                # indexed-span encode yields both ids and masks.
                ents = [e["text"] if isinstance(e, dict) else str(e)
                        for e in (req.get("entities") or [])]
                spans = entity_occurrences(text, ents)
                toks, pm = self.tokenizer.encode_with_indexed_spans(
                    text, spans, max_len=self.article_len)
                all_masks.append(pm)
            else:
                toks = self.tokenizer.encode(text,
                                             max_len=self.article_len)
            all_toks.append(toks)
        # article-width bucketing: decode at the smallest power-of-two-ish
        # bucket covering this micro-batch (pad columns are exactly masked,
        # so a short bucket gives IDENTICAL captions while the per-step K/V
        # stream shrinks with S). One compiled decode per bucket, as in
        # training (data/bucketing.py).
        if width is None:  # the continuous engine pins its full width
            width = self.article_len
            for b in self._article_buckets:
                if max((len(t) for t in all_toks), default=0) <= b:
                    width = b
                    break
        ids = np.full((B, width), dcfg.pad_id, np.int32)
        masks = np.full((B, width), -1, np.int32)
        for i, toks in enumerate(all_toks):
            ids[i, : len(toks)] = toks
        for i, pm in enumerate(all_masks):
            masks[i, : len(pm)] = pm
        batch = {"context_ids": ids}
        if self._needs_copy_masks:
            batch["proper_masks"] = masks
        n_img, img_dim = self._spec["image"]
        if n_img:
            grids = np.zeros((B, n_img, img_dim), np.float32)
            for i, req in enumerate(requests):
                if "image_grid" in req:
                    try:
                        grids[i] = np.asarray(req["image_grid"], np.float32)
                    except (ValueError, TypeError) as e:
                        errors[i] = f"bad image_grid: {e}"
            batch["image_grid"] = grids
        for name, key in (("faces", "face_embeds"), ("obj", "obj_embeds")):
            n, dim = self._spec[name]
            if n == 0:
                continue
            em = np.full((B, n, dim), np.nan, np.float32)
            for i, req in enumerate(requests):
                try:
                    v = np.asarray(req.get(key, []), np.float32)
                except (ValueError, TypeError) as e:
                    errors[i] = f"bad {key}: {e}"
                    continue
                if v.size:
                    k = min(n, v.shape[0])
                    em[i, :k] = v[: k, : dim] if v.ndim == 2 else v[:k]
            batch[key] = em
        return batch, errors

    def close(self, drain_s: float = 60.0) -> None:
        """Stop the engine tick loop and the micro-batcher (idempotent).
        In-flight engine requests drain first (bounded by drain_s) — the
        tick thread keeps advancing them until the queue and slots empty —
        and anything still unresolved afterwards (a submit that raced the
        drain, or a drain timeout) gets its future FAILED rather than
        abandoned, so no caller blocks on .result() forever."""
        # the WHOLE body runs under the lock: a concurrent second close()
        # (the /shutdown stop thread vs cmd_serve's main thread) must WAIT
        # for the first to finish draining, not return early and let the
        # process exit mid-drain
        with self._close_lock:
            if self._closed:
                return
            if self.engine is not None:
                # stop the encode batchers FIRST: queued-but-unencoded
                # payloads fail fast instead of racing the engine drain
                for b in getattr(self, "enc_batchers", {}).values():
                    b.shutdown()
                engines = list(self.engines.values())
                deadline = time.time() + drain_s
                while time.time() < deadline:
                    # the drain predicate holds each engine lock: admissions
                    # (queue pop -> pending insert) happen atomically under
                    # it inside tick(), so an unlocked read could see a
                    # request in neither collection and stop too early
                    busy = False
                    for eng in engines:
                        with eng._lock:
                            busy |= bool(eng.pending) \
                                or not eng.queue.empty()
                    if not busy:
                        break
                    time.sleep(0.05)
                self._eng_stop.set()
                self._eng_thread.join(timeout=30)
                leftovers = []
                for eng in engines:
                    with eng._lock:
                        leftovers += list(eng.pending.values())
                        eng.pending.clear()
                        try:
                            while True:
                                leftovers.append(eng.queue.get_nowait()[1])
                        except _queue_mod.Empty:
                            pass
                for fut in leftovers:
                    fut.set_exception(RuntimeError("service closed"))
            self.batcher.shutdown()
            self._closed = True

    def warmup(self) -> dict:
        """Compile-ahead: run one dummy request through every decode shape
        the service can hit (each article bucket width in micro-batch mode;
        the engine's encode+admit+chunk — and attention replay — in engine
        mode), so the first real request never pays a jit compile. On a
        tunneled TPU a cold compile is tens of seconds to minutes; `tnt
        serve --warmup` moves that to startup."""
        import time
        t0 = time.time()
        compiled = []
        if self.engine is not None:
            for w, eng in sorted(self.engines.items()):
                batch, _ = self._pack([{"context": "warmup request"}],
                                      width=w)
                batch.pop("proper_masks", None)
                # compile every encode-ladder rung live traffic can hit
                # (a cold rung compile mid-burst stalls that burst on a
                # tunneled chip), then drive one request through the full
                # batcher -> engine path
                batcher = self.enc_batchers[w]
                for size in batcher.warmup_sizes():
                    stacked = {k: np.repeat(np.asarray(v), size, axis=0)
                               for k, v in batch.items()}
                    enc = self._encode_many(self._frozen, self._params,
                                            stacked)
                    np.asarray(next(iter(enc.values())))  # force execution
                eng_fut, enc1 = batcher(batch)
                eng_fut.result(timeout=600)
                eng.warm(enc1)   # AOT: remaining admission rungs
                compiled.append(
                    f"engine@{w}xenc{batcher.warmup_sizes()}")
            if self.need_attention:   # replay compiles per width on demand
                self._caption_continuous({"context": "warmup request"})
        else:
            for w in self._article_buckets:
                padded = ([{"context": "warmup request"}]
                          + [{"context": ""}] * (self.max_batch - 1))
                batch, _ = self._pack(padded, width=w)
                batch["row_live"] = np.arange(self.max_batch) < 1
                out = self._decode_batch(batch)   # the exact _run dispatch
                np.asarray(out["token_ids"])      # force execution
                compiled.append(w)
        return {"compiled": compiled, "seconds": time.time() - t0}

    def numerics_ab(self, context: str | None = None) -> dict:
        """Deployment-gate numerics A/B with the DEPLOYED weights: decode
        one canned request greedy with both TPU-default numerics levers —
        the int8 K/V cache and the approximate per-cluster top-k — forced
        OFF (the exact fp path), then teacher-force those exact tokens
        through each lever's decode path (predict_forced) and report
        per-step argmax agreement per lever. Forced agreement has no
        greedy cascade, so the number measures the lever's numerics at
        the margins THIS deployment's weights actually produce (healthy
        quantized path ~0.99+ even at random weights; a broken kernel
        ~1/vocab) instead of the chaotic whole-suffix agreement a single
        near-tie flip destroys. Result lands in /status under
        "numerics_ab". `tnt serve --numerics-ab` runs it at startup
        (extra compiles). Model adapters (pointer/LSTM/modern) own their
        decode loop, so they fall back to free-running whole-sequence
        agreement."""
        import os
        import time as _time
        t0 = _time.time()
        padded = ([{"context": context
                    or "the mayor spoke in the city today"}]
                  + [{"context": ""}] * (self.max_batch - 1))
        batch, _ = self._pack(padded, width=self.article_len)
        batch["row_live"] = np.arange(self.max_batch) < 1
        from ..models.backbones.roberta import fast_gelu_mode
        from ..models.decoder import kv_cache_mode
        from ..ops.adaptive import topk_mode
        report = {"kv_cache_mode": kv_cache_mode(),
                  "topk_mode": topk_mode(),
                  "gelu_mode": fast_gelu_mode(),
                  "method": ("forced_per_step" if self._forced_fn
                             else "free_running")}
        levers = (("kv8_token_agreement", "TELL_TPU_KV8"),
                  ("approx_topk_token_agreement", "TELL_TPU_APPROX_TOPK"),
                  # tanh-GELU frozen-encoder default (TPU, round 5): the
                  # decode_fn re-encodes the canned article per trace, so
                  # the forced A/B isolates the encoder lever too
                  ("fast_gelu_token_agreement", "TELL_TPU_FAST_GELU"))
        prev = {var: os.environ.get(var) for _, var in levers}
        try:
            for _, var in levers:
                os.environ[var] = "0"
            ref = np.asarray(jax.jit(self._decode_fn)(
                self._params, self._frozen, batch)["token_ids"])
            for key, var in levers:
                os.environ[var] = "1"
                try:
                    if self._forced_fn is not None:
                        preds = np.asarray(jax.jit(self._forced_fn)(
                            self._params, self._frozen, batch, ref))[:1]
                        tgt = ref[:1, 1:]
                        pad = getattr(getattr(self.cfg, "decoder", self.cfg),
                                      "pad_id", 1)
                        live = tgt != pad
                        if not live.any():
                            live = np.ones_like(live)
                        report[key] = float((preds == tgt)[live].mean())
                    else:
                        out = jax.jit(self._decode_fn)(
                            self._params, self._frozen, batch)
                        toks = np.asarray(out["token_ids"])[:1]
                        report[key] = float((toks == ref[:1]).mean())
                finally:
                    os.environ[var] = "0"
        finally:
            for _, var in levers:
                if prev[var] is None:
                    os.environ.pop(var, None)
                else:
                    os.environ[var] = prev[var]
        report["seconds"] = round(_time.time() - t0, 1)
        self.ab_report = report
        return self.ab_report

    def _decode_batch(self, batch: dict):
        """The one decode dispatch (mesh placement + jitted program) both
        _run and warmup() go through — sharing it guarantees warmup
        compiles exactly the programs live traffic hits."""
        if self.mesh is not None:
            from ..parallel import batch_sharding
            batch = jax.device_put(batch, batch_sharding(self.mesh, batch))
            with self.mesh:
                return self._decode(self._params, self._frozen, batch)
        return self._decode(self._params, self._frozen, batch)

    def _source_lens(self, batch: dict) -> dict:
        """True per-context source lengths for the word-attention merge:
        lets merge_word_attentions DERIVE how many trailing bias/zero
        columns each attention map carries (S' - source_len) instead of
        assuming the add_bias_kv/add_zero_attn default of 2."""
        dcfg = getattr(self.cfg, "decoder", self.cfg)
        lens = {c.name: c.max_len for c in dcfg.contexts}
        if "context_ids" in batch:  # article rides the packed bucket width
            lens["article"] = int(np.asarray(batch["context_ids"]).shape[1])
        return lens

    def _run(self, requests: list[dict]) -> list[dict]:
        # pad the micro-batch to max_batch for a single compiled shape
        n = len(requests)
        padded = requests + [{"context": ""}] * (self.max_batch - n)
        batch, errors = self._pack(padded)
        # filler rows start pre-finished so early-exit decode tracks only
        # the real requests
        batch["row_live"] = np.arange(self.max_batch) < n
        out = self._decode_batch(batch)
        token_ids = np.asarray(out["token_ids"])[:n]
        results = []
        for i in range(n):
            r = {
                "caption": self.tokenizer.decode(token_ids[i]),
                "token_ids": token_ids[i].tolist(),
            }
            if errors[i]:
                r["error"] = errors[i]
            results.append(r)
        if self.need_attention and "attns" in out:
            # attns: per-layer dicts of [gen_len, B, 1, S'] maps from the
            # conv captioner, or ONE dict of [gen_len, B, S'] maps from the
            # LSTM decoder — normalize to first-layer per-context lists
            attns = out["attns"]
            layer0 = attns[0] if isinstance(attns, (list, tuple)) else attns
            from .word_attention import merge_word_attentions
            for i in range(n):
                results[i]["attns"] = {
                    name: (np.asarray(a)[:, i, 0].tolist()
                           if np.asarray(a).ndim == 4
                           else np.asarray(a)[:, i].tolist())
                    for name, a in layer0.items()
                }
                # word-level payload for the demo UI (reference
                # generate() merge, transformer_faces_objects.py:142-309)
                results[i].update(merge_word_attentions(
                    self.tokenizer, token_ids[i], results[i]["attns"],
                    context_ids=np.asarray(batch["context_ids"])[i],
                    source_lens=self._source_lens(batch)))
        return results

    def caption(self, request: dict) -> dict:
        if self.engine is not None:
            return self._caption_continuous(request)
        return self.batcher(request)

    def _caption_continuous(self, request: dict) -> dict:
        """Continuous-batching path: encode this request's contexts (one
        compiled B=1 tower pass), submit to the resident engine, decode the
        best beam. The request starts decoding at the next chunk boundary
        regardless of what else is in flight. With --engine-buckets the
        request routes to the smallest-width engine whose article bucket
        fits it."""
        bucketed = len(self.engines) > 1
        batch, errors = self._pack(
            [request], width=None if bucketed else self.article_len)
        if errors[0]:  # don't spend a decode slot on zeroed features
            return {"caption": "", "token_ids": [], "score": 0.0,
                    "error": errors[0]}
        width = batch["context_ids"].shape[1]
        batch.pop("proper_masks", None)
        # batched encode + engine admission: blocks until this request's
        # encode batch ran, returns the ENGINE future + our feature slice
        batcher = self.enc_batchers.get(
            width, self.enc_batchers[max(self.enc_batchers)])
        eng_fut, enc = batcher(batch)
        out = eng_fut.result(timeout=600)
        token_ids = np.asarray(out["token_ids"][0])  # best beam
        result = {"caption": self.tokenizer.decode(token_ids),
                  "token_ids": token_ids.tolist(),
                  "score": float(out["scores"][0]),
                  # the other beams, best-first: the demo's "alternative
                  # captions" list
                  "alternatives": [
                      {"caption": self.tokenizer.decode(t),
                       "score": float(s)}
                      for t, s in zip(np.asarray(out["token_ids"])[1:],
                                      np.asarray(out["scores"])[1:])]}
        if self.need_attention:
            attns = self._replay(self._params, enc, token_ids[None])
            layer0 = attns[0]
            result["attns"] = {
                name: np.asarray(a)[:, 0, 0].tolist()
                for name, a in layer0.items()}
            from .word_attention import merge_word_attentions
            result.update(merge_word_attentions(
                self.tokenizer, token_ids, result["attns"],
                context_ids=np.asarray(batch["context_ids"])[0],
                source_lens=self._source_lens(batch)))
        return result


def _kv_cache_mode() -> str:
    from ..models.decoder import kv_cache_mode
    return kv_cache_mode()


def _topk_mode() -> str:
    from ..ops.adaptive import topk_mode
    return topk_mode()


def _gelu_mode() -> str:
    from ..models.backbones.roberta import fast_gelu_mode
    return fast_gelu_mode()


class _Handler(BaseHTTPRequestHandler):
    service: CaptionService = None  # set by serve()

    def log_message(self, fmt, *args):  # quiet
        log.debug(fmt, *args)

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        elif self.path in ("/stats", "/status"):
            # SHOW_CONFIG + ServerStatistic analogue
            # (tell/server/base.py:319-383, utils.py:8-17)
            dcfg = getattr(self.service.cfg, "decoder", self.service.cfg)
            payload = {
                "statistics": self.service.batcher.stats,
                "config": {
                    "max_batch": self.service.max_batch,
                    "article_len": self.service.article_len,
                    "contexts": [c.name for c in dcfg.contexts],
                    "gen_len": self.service.cfg.gen_len,
                    "need_attention": self.service.need_attention,
                    "kv_cache_mode": _kv_cache_mode(),
                    "topk_mode": _topk_mode(),
                    "gelu_mode": _gelu_mode(),
                },
            }
            if self.service.ab_report is not None:
                payload["numerics_ab"] = self.service.ab_report
            if self.service.engine is not None:
                eng = self.service.engine
                payload["engine"] = {**eng.stats, "slots": eng.slots,
                                     "beam": eng.beam,
                                     "free_slots": len(eng.free)}
                if len(self.service.engines) > 1:
                    payload["engine_buckets"] = {
                        str(w): {**e.stats, "free_slots": len(e.free)}
                        for w, e in sorted(self.service.engines.items())}
            self._send(200, payload)
        elif self.path == "/metrics":
            self._send_metrics()
        elif self.path in ("/", "/index.html"):
            self._send_demo_page()
        else:
            self._send(404, {"error": "not found"})

    def _send_metrics(self):
        """Prometheus text exposition of the counters /status reports as
        JSON (the reference exposed ServerStatistic only over an internal
        ZeroMQ command; here any scraper can poll it)."""
        lines = []

        def counter(name, value, help_text):
            lines.append(f"# HELP {name} {help_text}")
            lines.append(f"# TYPE {name} counter")
            lines.append(f"{name} {value}")

        st = self.service.batcher.stats
        counter("tnt_requests_total", st.get("requests", 0),
                "Caption requests received by the micro-batcher")
        counter("tnt_batches_total", st.get("batches", 0),
                "Decode micro-batches executed")
        counter("tnt_errors_total", st.get("errors", 0),
                "Requests that failed")
        if self.service.engine is not None:
            eng = self.service.engine
            counter("tnt_engine_requests_total", eng.stats["requests"],
                    "Requests admitted to the continuous-batching engine")
            counter("tnt_engine_chunks_total", eng.stats["chunks"],
                    "Decode chunks executed by the engine")
            lines.append("# HELP tnt_engine_free_slots Currently free "
                         "engine slots")
            lines.append("# TYPE tnt_engine_free_slots gauge")
            lines.append(f"tnt_engine_free_slots {len(eng.free)}")
        body = ("\n".join(lines) + "\n").encode()
        self.send_response(200)
        self.send_header("Content-Type",
                         "text/plain; version=0.0.4; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_demo_page(self):
        import os
        page = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), "demo",
            "index.html")
        try:
            with open(page, "rb") as f:
                body = f.read()
        except OSError:
            self._send(404, {"error": "demo page missing"})
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        try:
            req = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            self._send(400, {"error": "bad json"})
            return
        if self.path == "/caption":
            try:
                self._send(200, self.service.caption(req))
            except Exception as e:
                self._send(500, {"error": str(e)})
        elif self.path == "/shutdown":
            # TERMINATE control command analogue (tell/server/utils.py:8-17)
            self._send(200, {"status": "shutting down"})

            def stop():
                self.server.shutdown()
                self.service.close()   # drain engine futures, stop batcher

            threading.Thread(target=stop, daemon=True).start()
        elif self.path == "/scrape":
            from .extractor import ExtractError, get_urls
            try:
                self._send(200, get_urls(req.get("url", "")))
            except ExtractError as e:
                self._send(422, {"error": str(e)})
            except Exception as e:
                self._send(502, {"error": f"fetch failed: {e}"})
        else:
            self._send(404, {"error": "not found"})


def serve(service: CaptionService, port: int = 5558,
          block: bool = True,
          host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """host defaults to loopback: the service exposes an unauthenticated
    /shutdown control endpoint (the reference's TERMINATE rode an internal
    ZeroMQ socket) — front a public deployment with the nginx config in
    demo/ and pass host="0.0.0.0" explicitly."""
    handler = type("Handler", (_Handler,), {"service": service})
    httpd = ThreadingHTTPServer((host, port), handler)
    if block:
        httpd.serve_forever()
    else:
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd
