"""Training loop.

Owns what the reference delegated to AllenNLP's CallbackApexTrainer
(/root/reference/tell/training/callback_apex_trainer.py:51-375): epoch loop,
per-shape jitted train steps, validation, metric tracking with patience,
checkpoint/recover, and structured logging. Callback events become plain
hook lists; mixed precision is bf16-by-default XLA instead of apex.

Device strategy: batches stream from the host loader into a (data, model)
mesh; every distinct bucket shape compiles once and is reused (the
fixed-shape set comes from data/bucketing.py).
"""
from __future__ import annotations

import json
import logging
import os
import time
from dataclasses import dataclass
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CaptionerConfig
from ..parallel import batch_sharding, make_mesh, shard_params
from .checkpoint import CheckpointManager
from .optimizer import bert_adam
from .train_step import make_train_step

log = logging.getLogger("tell_tpu.trainer")


@dataclass
class TrainerConfig:
    serialization_dir: str = "runs/default"
    num_epochs: int = 100
    patience: int = 30          # track_metrics callback analogue
    keep_checkpoints: int = 10
    # epochs between checkpoint writes (resume snapshot AND best-so-far).
    # 1 = every epoch (the reference's cadence). Small-corpus regimes with
    # hundreds of 2-batch epochs (e.g. the overfit quality-loop proof) set
    # this higher; a pending best save is flushed at the next gated epoch
    # or at training end with the CURRENT params, so with a non-monotone
    # val curve the captured "best" can be up to checkpoint_every-1 epochs
    # after the true optimum.
    checkpoint_every: int = 1
    log_every: int = 50
    seed: int = 0
    lr: float = 1e-4
    warmup: float = 0.05
    t_total: int = 437600
    weight_decay: float = 1e-5
    max_grad_norm: float = 0.1
    b1: float = 0.9
    b2: float = 0.98
    n_data: int | None = None   # mesh axes; default all devices on data
    n_model: int = 1
    # checkpoint dir of a trained captioner to warm-start from (the
    # reference's model_path + LoadStateDictWithPrefix, used by the pointer
    # models to start from 8_transformer_faces best.th)
    warm_start: str = ""
    # log_to_tensorboard callback analogue (config.yaml:163-166): scalar
    # events under <serialization_dir>/tb at this step interval (0 = off)
    summary_interval: int = 512
    # capture a jax.profiler device trace for steps [profile_at,
    # profile_at + profile_steps) into <serialization_dir>/profile
    # (the reference had no tracing at all, SURVEY.md §5)
    profile_steps: int = 0
    profile_at: int = 10


class Trainer:
    def __init__(self, cfg: CaptionerConfig, tcfg: TrainerConfig,
                 train_batches: Callable[[int], Iterator[dict]],
                 val_batches: Callable[[], Iterator[dict]] | None = None,
                 frozen: dict | None = None,
                 hooks: list | None = None,
                 adapter=None):
        """train_batches(epoch) / val_batches() yield fixed-shape numpy
        batches (see data/bucketing.py). `adapter` is a models.registry
        ModelAdapter; default = the multi-context captioner. When given,
        its .config replaces cfg for init/loss calls (e.g. PointerConfig
        wrapping the CaptionerConfig)."""
        if adapter is None:
            from ..models.registry import get_model
            adapter = get_model("captioner", cfg)
        self.adapter = adapter
        self.cfg = adapter.config if adapter.config is not None else cfg
        self.tcfg = tcfg
        self.train_batches = train_batches
        self.val_batches = val_batches
        # Cast the frozen towers to the compute dtype ONCE and materialize
        # them as device arrays here: orbax restores host numpy, and numpy
        # leaves passed to a jitted step are re-transferred host->device on
        # EVERY call (~1.4 GB/step for RoBERTa-large) with the bf16 cast
        # re-run on device each step.
        if frozen is not None:
            compute_dtype = getattr(getattr(self.cfg, "captioner", self.cfg),
                                    "compute_dtype", "float32")

            def _prep(x):
                if not hasattr(x, "dtype"):
                    return x
                if compute_dtype == "bfloat16" and x.dtype == jnp.float32:
                    return jnp.asarray(x, jnp.bfloat16)
                return jnp.asarray(x)

            frozen = jax.tree.map(_prep, frozen)
            # TELL_TPU_ENC8: int8-quantize the frozen RoBERTa ONCE here,
            # after the dtype cast (so the f32 quant scales are not
            # themselves downcast). The tower is frozen — no gradient
            # path — and the encode dispatches on the leaf structure.
            from ..ops.quant import maybe_quantize_frozen
            frozen = maybe_quantize_frozen(frozen)
        self.frozen = frozen
        self.hooks = hooks or []
        self.optimizer = bert_adam(
            lr=tcfg.lr, b1=tcfg.b1, b2=tcfg.b2,
            weight_decay=tcfg.weight_decay,
            max_grad_norm=tcfg.max_grad_norm, t_total=tcfg.t_total,
            warmup=tcfg.warmup)
        self.mesh = make_mesh(n_data=tcfg.n_data, n_model=tcfg.n_model)
        self.ckpt = CheckpointManager(
            os.path.join(tcfg.serialization_dir, "checkpoints"),
            keep=tcfg.keep_checkpoints)
        # adapters without a native e2e loss (LSTM) still train against
        # frozen towers: synthesize one from encode + loss so the step
        # never falls back to the CAPTIONER objective on foreign params
        loss_e2e = adapter.loss_e2e
        if loss_e2e is None and adapter.encode is not None:
            _enc, _loss = adapter.encode, adapter.loss

            def loss_e2e(p, fz, cfg, b, rng=None, deterministic=True):
                return _loss(p, cfg, _enc(fz, b), rng=rng,
                             deterministic=deterministic)
        self._loss_e2e = loss_e2e
        # frozen towers ride as a CALL-time argument — closure arrays would
        # be baked into the HLO as constants (see make_train_step note)
        self._step_fn = jax.jit(
            make_train_step(self.cfg, self.optimizer,
                            loss=adapter.loss, loss_e2e=loss_e2e),
            donate_argnums=(0, 1))
        self._eval_fn = None
        self._tb = None
        self._best_pending: tuple | None = None
        self._stop_requested = False
        self.state: dict = {}
        self.metrics_history: list[dict] = []

    def request_stop(self) -> None:
        """Ask the train loop to stop at the next batch boundary and write
        a resumable checkpoint (preemption-safe training: TPU VMs get a
        termination notice; the reference could only lose the epoch).
        Thread- and signal-safe (sets a flag, does no work itself)."""
        self._stop_requested = True

    def _check_stop(self) -> bool:
        """Stop decision at a batch boundary. Under multi-host training the
        host-local flag is OR-reduced across processes (parallel/multihost
        global_any): a SIGTERM lands on one host, and a unilateral break
        would deadlock the others' next collective against this host's
        checkpoint barrier. Every process calls this at the same point in
        its (identical) batch schedule, so all agree on the same batch."""
        from ..parallel.multihost import global_any
        agreed = global_any(self._stop_requested)
        if agreed:
            self._stop_requested = True   # keep post-loop branches in sync
        return agreed

    @property
    def tb(self):
        """Lazy TensorBoard writer (one events file per trainer; primary
        process only under multi-host)."""
        if (self._tb is None and self.tcfg.summary_interval
                and jax.process_index() == 0):
            from .tensorboard import TensorBoardWriter
            self._tb = TensorBoardWriter(
                os.path.join(self.tcfg.serialization_dir, "tb"))
        return self._tb

    # -- state ------------------------------------------------------------
    def initialize(self, rng: jax.Array | None = None) -> None:
        rng = jax.random.PRNGKey(self.tcfg.seed) if rng is None else rng
        params = self.adapter.init(rng, self.cfg)
        if self.tcfg.warm_start:
            import orbax.checkpoint as ocp
            target = params.get("captioner", params)
            restored = ocp.PyTreeCheckpointer().restore(
                os.path.abspath(self.tcfg.warm_start),
                item={"params": target})["params"]
            if "captioner" in params:
                params = {**params, "captioner": restored}
            else:
                params = restored
            log.info("warm-started from %s", self.tcfg.warm_start)
        params = shard_params(params, self.mesh)
        self.state = {
            "params": params,
            "opt": self.optimizer.init(params),
            "step": 0,
            "epoch": 0,
            "best_metric": float("inf"),
            "bad_epochs": 0,
        }

    def recover(self) -> bool:
        """Resume from the latest checkpoint (tell train --recover)."""
        if self.state == {}:
            self.initialize()
        restored = self.ckpt.restore(
            template={"params": self.state["params"],
                      "opt": self.state["opt"]})
        if restored is None:
            return False
        state, meta = restored
        # restored leaves arrive with default placement — re-apply the
        # mesh sharding initialize() established; the optimizer moments
        # mirror the param tree, so they take the same rules
        state = dict(state)
        state["params"] = shard_params(state["params"], self.mesh)
        opt = state["opt"]
        if hasattr(opt, "m") and hasattr(opt, "v"):
            state["opt"] = opt._replace(m=shard_params(opt.m, self.mesh),
                                        v=shard_params(opt.v, self.mesh))
        self.state.update(state)
        self.state.update({k: meta[k] for k in
                           ("step", "epoch", "best_metric", "bad_epochs",
                            "batch_cursor")
                           if k in meta})
        log.info("recovered at epoch %d batch %d step %d",
                 self.state["epoch"], self.state.get("batch_cursor", 0),
                 self.state["step"])
        return True

    # -- loops ------------------------------------------------------------
    def train(self) -> dict:
        if self.state == {}:
            self.initialize()
        t = self.tcfg
        rng = jax.random.PRNGKey(t.seed + 17)
        self._install_sigterm()
        stop = False
        while self.state["epoch"] < t.num_epochs and not stop:
            epoch = self.state["epoch"]
            em = self._train_epoch(epoch, rng)
            cursor = em.pop("cursor", 0)
            stopped_mid = em.pop("stopped_mid", False)
            # agreed globally: a flag raised between epochs must stop every
            # process, not just the signalled one
            if self._check_stop():
                # preempted: persist a checkpoint recover() resumes from.
                # A mid-epoch stop records the batch cursor so the resumed
                # run continues at the NEXT batch of the same (epoch_index-
                # seeded, deterministic) order — step-exact, no redone work
                # (the reference redoes the whole epoch). A stop that
                # landed after the epoch finished resumes at epoch + 1.
                at_epoch = epoch if stopped_mid else epoch + 1
                if self._best_pending is not None:
                    # don't lose a deferred best save to the preemption
                    ep, m_ = self._best_pending
                    self.ckpt.save_best({"params": self.state["params"]},
                                        {"epoch": ep, "metric": m_})
                    self._best_pending = None
                self.ckpt.save(
                    epoch, {"params": self.state["params"],
                            "opt": self.state["opt"]},
                    {"step": self.state["step"], "epoch": at_epoch,
                     "batch_cursor": cursor if stopped_mid else 0,
                     "best_metric": self.state["best_metric"],
                     "bad_epochs": self.state["bad_epochs"]})
                log.info("stop requested: checkpointed at epoch %d batch %d "
                         "step %d", epoch, cursor, self.state["step"])
                self.ckpt.flush()   # async save barrier before exiting
                return {"best_metric": self.state["best_metric"],
                        "epochs": epoch, "preempted": True}
            val = self._validate()
            em.update(val)
            em["epoch"] = epoch
            self.metrics_history.append(em)
            self._write_metrics(em)
            if self.tb is not None:
                self.tb.add_scalars(
                    {f"epoch/{k}": v for k, v in em.items() if k != "epoch"},
                    self.state["step"])

            metric = val.get("val_loss", em.get("loss", float("inf")))
            if metric < self.state["best_metric"]:
                self.state["best_metric"] = metric
                self.state["bad_epochs"] = 0
                self._best_pending = (epoch, metric)
            else:
                self.state["bad_epochs"] += 1
                if self.state["bad_epochs"] >= t.patience:
                    log.info("early stop: no improvement in %d epochs",
                             t.patience)
                    stop = True

            self.state["epoch"] = epoch + 1
            gated = ((epoch + 1) % max(t.checkpoint_every, 1) == 0
                     or self.state["epoch"] >= t.num_epochs or stop)
            if gated and self._best_pending is not None:
                ep, m_ = self._best_pending
                self.ckpt.save_best({"params": self.state["params"]},
                                    {"epoch": ep, "metric": m_})
                self._best_pending = None
            if gated:
                self.ckpt.save(
                    epoch, {"params": self.state["params"],
                            "opt": self.state["opt"]},
                    {"step": self.state["step"],
                     "epoch": self.state["epoch"],
                     "best_metric": self.state["best_metric"],
                     "bad_epochs": self.state["bad_epochs"]})
            for hook in self.hooks:
                hook(self, em)
        self.ckpt.flush()   # async save barrier before returning
        return {"best_metric": self.state["best_metric"],
                "epochs": self.state["epoch"]}

    def _install_sigterm(self) -> None:
        """Route SIGTERM (the preemption notice on cloud TPU VMs) to
        request_stop. Main-thread only; elsewhere (tests, servers) callers
        use request_stop directly."""
        import signal
        import threading
        if threading.current_thread() is not threading.main_thread():
            return
        try:
            signal.signal(signal.SIGTERM,
                          lambda signum, frame: self.request_stop())
        except ValueError:  # non-main interpreter contexts
            pass

    def _prefetched(self, batches):
        """Background host->device pipeline over a batch iterator; drops the
        bucketing padding marker. Context-managed so an aborted epoch
        (error/interrupt) releases the queued device batches. Under
        multi-host training (jax.distributed initialized) each process
        feeds only its LOCAL batch shard; every process must iterate the
        same number of identically-shaped batches per epoch."""
        from ..data.prefetch import DevicePrefetcher

        def host_batches():
            for b in batches:
                b.pop("real", None)
                yield b

        if jax.process_count() > 1:
            from ..parallel.multihost import place_global_batch
            return DevicePrefetcher(
                host_batches(),
                put_fn=lambda b: place_global_batch(self.mesh, b))
        return DevicePrefetcher(host_batches(),
                                lambda b: batch_sharding(self.mesh, b))

    def _train_epoch(self, epoch: int, rng: jax.Array) -> dict:
        t0 = time.time()
        losses, skips = [], []  # device arrays; converted once at epoch end
        tails, sizes = [], []  # tail-capacity overflow guard accumulators
        n_batches = 0
        n_examples = 0
        profiling = False
        stopped_mid = False
        # mid-epoch resume: skip the already-trained prefix of this epoch's
        # (deterministic, epoch_index-seeded) batch order. The skip runs
        # BEFORE the device prefetcher so skipped batches are never
        # device_put; with the native gather loader a skipped batch costs
        # well under a millisecond of host packing.
        resume_at = int(self.state.pop("batch_cursor", 0) or 0)
        batches = self.train_batches(epoch)
        if resume_at:
            import itertools
            batches = itertools.islice(batches, resume_at, None)
            log.info("resuming epoch %d at batch %d", epoch, resume_at)
        try:
            with self.mesh, self._prefetched(batches) as pf:
                for batch in pf:
                    if self._check_stop():
                        stopped_mid = True
                        break
                    step_rng = jax.random.fold_in(rng, self.state["step"])
                    if (self.tcfg.profile_steps and not profiling
                            and self.state["step"] == self.tcfg.profile_at):
                        jax.profiler.start_trace(os.path.join(
                            self.tcfg.serialization_dir, "profile"))
                        profiling = True
                    self.state["params"], self.state["opt"], m =                         self._step_fn(self.state["params"], self.state["opt"],
                                      batch, step_rng, self.frozen)
                    self.state["step"] += 1
                    # [profile_at, profile_at + profile_steps): stop AFTER
                    # the step counter has advanced past the window
                    if (profiling and self.state["step"]
                            >= self.tcfg.profile_at + self.tcfg.profile_steps):
                        jax.tree.map(lambda x: x.block_until_ready(),
                                     self.state["params"])
                        jax.profiler.stop_trace()
                        profiling = False
                    n_batches += 1
                    # static shape metadata — no device sync
                    n_examples += int(batch["caption_ids"].shape[0])
                    losses.append(m["loss"])
                    # int(skipped) here would sync the host every step and
                    # serialize dispatch; accumulate device-side instead
                    skips.append(m["skipped"])
                    tails.append(m.get("tail_dropped", 0))
                    sizes.append(m.get("sample_size", 0))
                    if n_batches % self.tcfg.log_every == 0:
                        log.info("epoch %d step %d loss %.4f", epoch,
                                 self.state["step"], float(m["loss"]))
                    si = self.tcfg.summary_interval
                    if (si and self.state["step"] % si == 0
                            and self.tb is not None):
                        # float() syncs once per interval — same cost class
                        # as the log line above
                        self.tb.add_scalar("train/loss", float(m["loss"]),
                                           self.state["step"])
        finally:
            if profiling:  # flush the trace even if the epoch aborts early
                jax.profiler.stop_trace()
        losses = np.asarray([float(x) for x in losses])
        skipped = int(sum(float(x) for x in skips))
        # NaN-skipped batches keep old params AND stay out of the epoch
        # mean (one NaN batch would otherwise poison the epoch metric and
        # force a spurious early stop; reference :225-227 drops them too)
        ok = np.isfinite(losses)
        mean = float(losses[ok].mean()) if ok.any() else float("nan")
        # Tail-capacity overflow guard: adaptive_softmax_loss silently
        # degrades overflowed rows to head-only loss (ops/adaptive.py
        # tail_capacity path); a misconfigured tail_capacity_frac would
        # quietly bias training, so surface it when the dropped fraction
        # exceeds 0.1% of non-pad tokens this epoch.
        tail_dropped = int(sum(float(x) for x in tails))
        n_tokens = int(sum(float(x) for x in sizes))
        tail_frac = tail_dropped / n_tokens if n_tokens else 0.0
        if tail_frac > 1e-3:
            log.warning(
                "epoch %d: adaptive-softmax tail capacity dropped %d/%d "
                "tokens (%.3f%%) to head-only loss — raise "
                "tail_capacity_frac", epoch, tail_dropped, n_tokens,
                100.0 * tail_frac)
        dt = time.time() - t0
        return {"loss": mean, "batches": n_batches, "skipped": skipped,
                "tail_dropped": tail_dropped, "tail_dropped_frac": tail_frac,
                "examples": n_examples,
                "examples_per_sec": n_examples / dt if dt > 0 else 0.0,
                "epoch_seconds": dt,
                # absolute position in the epoch's batch order + whether
                # the loop was actually cut short (for the stop branch's
                # cursor checkpoint) — popped before metrics are recorded
                "cursor": resume_at + n_batches,
                "stopped_mid": stopped_mid}

    def _validate(self) -> dict:
        if self.val_batches is None:
            return {}
        if self._eval_fn is None:
            if self.frozen is not None and self._loss_e2e is not None:
                # towers as a call-time arg, not closure constants
                eval_e2e = jax.jit(
                    lambda p, fz, b: self._loss_e2e(
                        p, fz, self.cfg, b)[0])
                self._eval_fn = lambda p, b: eval_e2e(p, self.frozen, b)
            else:
                self._eval_fn = jax.jit(
                    lambda p, b: self.adapter.loss(p, self.cfg, b)[0])
        losses = []
        with self.mesh, self._prefetched(self.val_batches()) as pf:
            for batch in pf:
                losses.append(float(self._eval_fn(self.state["params"],
                                                  batch)))
        return {"val_loss": float(np.mean(losses))} if losses else {}

    def _write_metrics(self, em: dict) -> None:
        if jax.process_index() != 0:  # primary-only under multi-host
            return
        os.makedirs(self.tcfg.serialization_dir, exist_ok=True)
        path = os.path.join(self.tcfg.serialization_dir, "metrics.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(em) + "\n")
