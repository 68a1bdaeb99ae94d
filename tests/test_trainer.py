"""End-to-end training test (SURVEY.md §4 invariant 6): synthetic fixture ->
shards -> bucketed batches -> Trainer with frozen RoBERTa tower -> loss
decreases -> checkpoint/recover round-trip."""
import glob

import jax
import numpy as np
import pytest

from tell_tpu.config import small_test_config
from tell_tpu.data.bucketing import BucketingConfig, bucket_batches
from tell_tpu.data.records import RecordDataset, write_shard
from tell_tpu.models.backbones import RobertaConfig, init_roberta
from tell_tpu.training.trainer import Trainer, TrainerConfig

CFG = small_test_config()
RCFG = RobertaConfig(vocab_size=CFG.decoder.vocab_size, dim=24, num_layers=2,
                     num_heads=4, ffn_dim=32, max_positions=40)
BCFG = BucketingConfig(article_lengths=(16,), caption_lengths=(12,),
                       token_budget=112, max_batch=4,
                       max_faces=4, face_dim=16, max_objects=8,
                       object_dim=32)


def make_shards(tmp_path, n=24):
    rng = np.random.RandomState(0)
    examples = []
    for _ in range(n):
        la = rng.randint(6, 15)
        lc = rng.randint(5, 11)
        examples.append({
            "context_ids": np.concatenate(
                [[0], rng.randint(4, 90, la), [2]]).astype(np.int32),
            "caption_ids": np.concatenate(
                [[0], rng.randint(4, 90, lc), [2]]).astype(np.int32),
            "image_grid": rng.randn(9, 32).astype(np.float32),
            "face_embeds": rng.randn(2, 16).astype(np.float32),
            "obj_embeds": rng.randn(3, 32).astype(np.float32),
        })
    write_shard(str(tmp_path / "train-00000.npz"), examples[:16])
    write_shard(str(tmp_path / "valid-00000.npz"), examples[16:])
    return tmp_path


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    return make_shards(tmp_path_factory.mktemp("shards"))


def test_train_loop_decreases_loss_and_checkpoints(shard_dir, tmp_path):
    train_ds = RecordDataset(str(shard_dir / "train-*.npz"), seed=0)
    val_ds = RecordDataset(str(shard_dir / "valid-*.npz"), seed=0)

    frozen = {"roberta": init_roberta(jax.random.PRNGKey(5), RCFG),
              "roberta_cfg": RCFG}

    def train_batches(epoch):
        return bucket_batches(train_ds.epoch(), BCFG)

    def val_batches():
        return bucket_batches(val_ds.epoch(shuffle=False), BCFG)

    tcfg = TrainerConfig(serialization_dir=str(tmp_path / "run"),
                         num_epochs=6, patience=10, lr=3e-3,
                         t_total=200, log_every=1000, summary_interval=2,
                         n_data=2, n_model=2)  # batches of 4 split 2-way DP
    trainer = Trainer(CFG, tcfg, train_batches, val_batches, frozen=frozen)
    result = trainer.train()

    hist = trainer.metrics_history
    assert len(hist) == 6
    assert hist[-1]["loss"] < hist[0]["loss"] - 0.3
    assert "val_loss" in hist[-1]
    assert result["best_metric"] < float("inf")

    # tensorboard events: per-step train/loss + per-epoch scalars
    from tests.test_tensorboard import read_events
    (ev_path,) = glob.glob(str(tmp_path / "run" / "tb" / "events.*"))
    evs = read_events(ev_path)
    step_losses = [e for e in evs if "train/loss" in e["scalars"]]
    epoch_evs = [e for e in evs if "epoch/val_loss" in e["scalars"]]
    assert len(step_losses) >= 3 and len(epoch_evs) == 6

    # checkpoints exist: best + per-epoch
    assert (tmp_path / "run" / "checkpoints" / "best").exists()
    assert trainer.ckpt.list() == [0, 1, 2, 3, 4, 5]

    # recover into a fresh trainer resumes at epoch 6
    trainer2 = Trainer(CFG, tcfg, train_batches, val_batches, frozen=frozen)
    assert trainer2.recover()
    assert trainer2.state["epoch"] == 6
    p1 = jax.tree.leaves(trainer.state["params"])
    p2 = jax.tree.leaves(trainer2.state["params"])
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p2[0]))


def test_preemption_stop_checkpoints_and_recovers(shard_dir, tmp_path):
    """request_stop (the SIGTERM preemption path) halts at the next batch
    boundary, writes a resumable checkpoint, and recover() picks the run
    back up — the reference could only lose in-flight work."""
    train_ds = RecordDataset(str(shard_dir / "train-*.npz"), seed=0)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(5), RCFG),
              "roberta_cfg": RCFG}

    def train_batches(epoch):
        return bucket_batches(train_ds.epoch(), BCFG)

    tcfg = TrainerConfig(serialization_dir=str(tmp_path / "run"),
                         num_epochs=50, patience=50, t_total=5000,
                         log_every=1000, summary_interval=0, n_data=1)
    trainer = Trainer(CFG, tcfg, train_batches, frozen=frozen)
    # deterministic "preemption": the epoch-end hook fires after epoch 0,
    # so epoch 1 stops at its first batch boundary
    trainer.hooks.append(lambda tr, em: tr.request_stop())
    result = trainer.train()
    assert result["preempted"] is True
    assert result["epochs"] == 1          # epoch 1 was cut short

    trainer2 = Trainer(CFG, tcfg, train_batches, frozen=frozen)
    assert trainer2.recover()
    assert trainer2.state["epoch"] == 1   # redoes the interrupted epoch
    assert trainer2.state["step"] == trainer.state["step"]
    p1, p2 = (jax.tree.leaves(t.state["params"])
              for t in (trainer, trainer2))
    np.testing.assert_allclose(np.asarray(p1[0]), np.asarray(p2[0]))


def test_keep_checkpoints_gc(tmp_path):
    from tell_tpu.training.checkpoint import CheckpointManager
    cm = CheckpointManager(str(tmp_path / "ck"), keep=3)
    for i in range(6):
        cm.save(i, {"x": np.arange(3)}, {"step": i})
    assert cm.list() == [3, 4, 5]
    state, meta = cm.restore()
    assert meta["step"] == 5
    np.testing.assert_array_equal(state["x"], np.arange(3))


def test_bf16_compute_keeps_fp32_master_params():
    """compute_dtype=bfloat16: loss/grads computed in bf16 but the param
    pytree and optimizer state stay fp32 (apex-O2 analogue)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import jax.random as jr
    from tell_tpu.config import small_test_config
    from tell_tpu.models import init_captioner
    from tell_tpu.training import bert_adam, make_train_step

    cfg = dataclasses.replace(small_test_config(),
                              compute_dtype="bfloat16")
    params = init_captioner(jr.PRNGKey(0), cfg)
    opt = bert_adam(t_total=100, warmup=0.0)
    state = opt.init(params)
    dcfg = cfg.decoder
    ks = jr.split(jr.PRNGKey(1), 8)
    B, T = 2, 8
    caption = jr.randint(ks[5], (B, T), 4, dcfg.vocab_size).at[:, 0].set(0)
    batch = {
        "image_grid": jr.normal(ks[0], (B, 9, 32)),
        "article": jr.normal(ks[1], (B, 16, 24)),
        "article_mask": jnp.zeros((B, 16), bool),
        "face_embeds": jr.normal(ks[2], (B, 4, 16)),
        "obj_embeds": jr.normal(ks[3], (B, 8, 32)),
        "caption_ids": caption,
    }
    step = jax.jit(make_train_step(cfg, opt))
    p2, s2, m = step(params, state, batch, jr.PRNGKey(3))
    p2, s2, m = step(p2, s2, batch, jr.PRNGKey(4))
    assert jnp.isfinite(m["loss"])
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(p2)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))
    # params actually moved
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
    assert max(jax.tree.leaves(diff)) > 0


def test_async_checkpoint_overlap_and_flush(tmp_path):
    """Async saves: save() returns before commit, flush() is the barrier,
    deferred meta.json + keep-N GC land after commit, and restore sees a
    consistent latest state."""
    import time
    from tell_tpu.training.checkpoint import CheckpointManager

    big = {"x": np.random.rand(512, 512).astype(np.float32)}
    cm = CheckpointManager(str(tmp_path / "ck"), keep=2, use_async=True)
    for i in range(4):
        big["x"][0, 0] = i
        cm.save(i, {"x": big["x"].copy()}, {"step": i})
    cm.flush()
    assert cm.list() == [2, 3]            # keep-2 GC applied post-commit
    state, meta = cm.restore()
    assert meta["step"] == 3
    assert state["x"][0, 0] == 3.0

    # save_best rides the same machinery
    cm.save_best({"x": big["x"]}, {"metric": 0.5})
    state, meta = cm.restore("best")
    assert meta["metric"] == 0.5


def test_midepoch_cursor_resume_is_step_exact(shard_dir, tmp_path):
    """A preemption in the middle of an epoch resumes at the NEXT batch of
    the same (epoch_index-seeded) order — the recovered run's final params
    are bit-identical to an uninterrupted run's (the reference redoes the
    whole epoch; we redo nothing)."""
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(5), RCFG),
              "roberta_cfg": RCFG}

    def factory(stop_after=None):
        ds = RecordDataset(str(shard_dir / "train-*.npz"), seed=0)
        holder = {}

        def train_batches(epoch):
            def gen():
                it = bucket_batches(
                    ds.epoch(lazy=True, epoch_index=epoch), BCFG)
                for j, b in enumerate(it):
                    if (stop_after is not None and epoch == 0
                            and j == stop_after):
                        holder["trainer"].request_stop()
                    yield b
            return gen()
        return train_batches, holder

    def tcfg(d):
        return TrainerConfig(serialization_dir=str(tmp_path / d),
                             num_epochs=2, patience=50, t_total=5000,
                             log_every=1000, summary_interval=0, n_data=1)

    # run A: uninterrupted
    tb_a, _ = factory()
    ta = Trainer(CFG, tcfg("a"), tb_a, frozen=frozen)
    res_a = ta.train()
    assert "preempted" not in res_a

    # run B: preempted mid-epoch-0, then recovered and finished
    tb_b, holder = factory(stop_after=2)
    tbr = Trainer(CFG, tcfg("b"), tb_b, frozen=frozen)
    holder["trainer"] = tbr
    res_b = tbr.train()
    assert res_b["preempted"] is True

    tb_b2, holder2 = factory()
    tb2 = Trainer(CFG, tcfg("b"), tb_b2, frozen=frozen)
    holder2["trainer"] = tb2
    assert tb2.recover()
    assert tb2.state["epoch"] == 0            # same epoch, not redone
    cursor = tb2.state.get("batch_cursor", 0)
    assert cursor >= 1                        # genuinely mid-epoch
    res_b2 = tb2.train()
    assert "preempted" not in res_b2

    # step counts line up and params match run A exactly
    assert tb2.state["step"] == ta.state["step"]
    for pa, pb in zip(jax.tree.leaves(ta.state["params"]),
                      jax.tree.leaves(tb2.state["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_tail_capacity_overflow_warns(shard_dir, tmp_path, caplog):
    """A too-small tail_capacity_frac silently degrades overflowed rows to
    head-only loss (ops/adaptive.py tail_capacity path); the trainer must
    count the drops per epoch and warn when the fraction exceeds 0.1%."""
    import logging

    from tell_tpu.config import small_test_config

    cfg = small_test_config(tail_capacity_frac=(0.01, 0.01))
    train_ds = RecordDataset(str(shard_dir / "train-*.npz"), seed=0)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(5), RCFG),
              "roberta_cfg": RCFG}

    def train_batches(epoch):
        return bucket_batches(train_ds.epoch(), BCFG)

    tcfg = TrainerConfig(serialization_dir=str(tmp_path / "run"),
                         num_epochs=1, patience=10, t_total=100,
                         log_every=1000, summary_interval=0, n_data=1)
    trainer = Trainer(cfg, tcfg, train_batches, frozen=frozen)
    with caplog.at_level(logging.WARNING):
        trainer.train()
    em = trainer.metrics_history[0]
    assert em["tail_dropped"] > 0
    assert em["tail_dropped_frac"] > 1e-3
    assert any("tail capacity" in r.message for r in caplog.records)
