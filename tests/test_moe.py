"""MoE SwiGLU FFN (ops/moe.py) + expert parallelism in the modern LM.

The reference has no MoE (SURVEY.md §2.10 — no expert parallelism); these
validate the ep leg of the mesh taxonomy: einsum dispatch == dense per-token
routing, capacity drops behave, expert-sharded execution matches unsharded
(8-device virtual CPU mesh per SURVEY.md §4 invariant 5).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tell_tpu.ops.moe import init_moe_ffn, moe_ffn, moe_ffn_dense_reference


def _params(rng, d=12, f=16, e=4):
    return init_moe_ffn(rng, d, f, e)


def test_moe_matches_dense_reference_at_full_capacity():
    d, e = 12, 4
    params = _params(jax.random.PRNGKey(0), d=d, e=e)
    x = jax.random.normal(jax.random.PRNGKey(1), (24, d))
    # capacity_factor e/k guarantees cap >= N*k/E * (E/k) = N: nothing drops
    out, aux = moe_ffn(params, x, top_k=2, capacity_factor=float(e))
    ref = moe_ffn_dense_reference(params, x, top_k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0


def test_moe_top1_and_single_expert():
    d = 12
    params = _params(jax.random.PRNGKey(2), d=d, e=3)
    x = jax.random.normal(jax.random.PRNGKey(3), (10, d))
    out, _ = moe_ffn(params, x, top_k=1, capacity_factor=3.0)
    ref = moe_ffn_dense_reference(params, x, top_k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # one expert: routing is the identity, gate is exactly 1
    p1 = _params(jax.random.PRNGKey(4), d=d, e=1)
    out1, _ = moe_ffn(p1, x, top_k=2, capacity_factor=1.0)
    ref1 = moe_ffn_dense_reference(p1, x, top_k=1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=2e-4, atol=2e-5)


def test_moe_capacity_drops_zero_overflow_tokens():
    """With capacity 1 per expert, at most E tokens route anywhere; a
    dropped token contributes nothing (its combine weights are 0)."""
    d, e, n = 8, 2, 12
    params = _params(jax.random.PRNGKey(5), d=d, e=e)
    x = jax.random.normal(jax.random.PRNGKey(6), (n, d))
    out, _ = moe_ffn(params, x, top_k=1, capacity_factor=1.0 / (n / e))
    nonzero = np.sum(np.any(np.abs(np.asarray(out)) > 0, axis=-1))
    assert nonzero <= e  # cap = 1 slot per expert


def test_moe_grads_flow_to_router_and_experts():
    params = _params(jax.random.PRNGKey(7))
    x = jax.random.normal(jax.random.PRNGKey(8), (16, 12))

    for k in (1, 2):
        def loss(p):
            out, aux = moe_ffn(p, x, top_k=k)
            return jnp.sum(out ** 2) + 0.01 * aux

        g = jax.grad(loss)(params)
        for path, leaf in jax.tree_util.tree_leaves_with_path(g):
            assert bool(jnp.isfinite(leaf).all()), path
        # router receives TASK-loss gradient through the gates; at top-1
        # the gate is the raw prob (renormalizing would pin it to 1 and
        # starve the router), so the grad must be well above aux-only scale
        assert float(jnp.abs(g["router"]["w"]).sum()) > 0.01, k


def test_moe_pads_do_not_consume_capacity():
    """With token_mask, pad tokens take no expert slots: real tokens'
    outputs match a pad-free call, and pad rows output zero."""
    d, e = 8, 2
    params = _params(jax.random.PRNGKey(30), d=d, e=e)
    real = jax.random.normal(jax.random.PRNGKey(31), (4, d))
    # many identical "pad" rows that would otherwise crowd one expert
    pads = jnp.tile(jax.random.normal(jax.random.PRNGKey(32), (1, d)),
                    (12, 1))
    x = jnp.concatenate([real, pads])
    mask = jnp.arange(16) < 4
    # tight capacity: ceil(16*1/2)*0.5 = 4 slots per expert
    out, aux = moe_ffn(params, x, top_k=1, capacity_factor=0.5,
                       token_mask=mask)
    ref, _ = moe_ffn(params, real, top_k=1, capacity_factor=2.0)
    np.testing.assert_allclose(np.asarray(out[:4]), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[4:]), 0.0)
    assert np.isfinite(float(aux))



def test_moe_expert_sharded_matches_unsharded():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    d = 16
    params = _params(jax.random.PRNGKey(9), d=d, f=24, e=4)
    x = jax.random.normal(jax.random.PRNGKey(10), (32, d))
    ref, ref_aux = moe_ffn(params, x)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    ep = NamedSharding(mesh, P("model"))
    repl = NamedSharding(mesh, P())
    sharded = {
        "router": jax.tree.map(lambda a: jax.device_put(a, repl),
                               params["router"]),
        "w1": jax.device_put(params["w1"], ep),
        "w3": jax.device_put(params["w3"], ep),
        "w2": jax.device_put(params["w2"], ep),
    }
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out, aux = jax.jit(moe_ffn)(sharded, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(aux), float(ref_aux), rtol=1e-5)


def test_llm_moe_loss_and_generate():
    """Modern LM with moe_experts: loss finite with aux term, grads finite,
    greedy generate runs (decode-step FFN path)."""
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import (LLMConfig, init_llm_decoder,
                                             llm_generate, llm_loss)
    cfg = LLMConfig(
        vocab_size=89, dim=16, num_layers=2, num_heads=2, num_kv_heads=2,
        ffn_dim=24, dropout=0.0, attention_dropout=0.0,
        max_target_positions=16, gen_len=5, loss_vocab_chunk=32,
        moe_experts=4, moe_top_k=2,
        contexts=(ContextSpec("image", 8, 3), ContextSpec("article", 8, 5)))
    params = init_llm_decoder(jax.random.PRNGKey(11), cfg)
    assert params["layers"][0]["ffn"]["w1"].shape == (4, 16, 24)
    B = 2
    ks = jax.random.split(jax.random.PRNGKey(12), 3)
    caps = jax.random.randint(ks[2], (B, 6), 4, cfg.vocab_size)
    caps = caps.at[:, 0].set(cfg.bos_id)
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 3, 8)),
        "article": jax.random.normal(ks[1], (B, 5, 8)),
        "article_mask": jnp.zeros((B, 5), bool),
        "caption_ids": caps,
    }

    def loss(p):
        return llm_loss(p, cfg, batch)[0]

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())
    _, aux = llm_loss(params, cfg, batch)
    assert "moe_aux" in aux and np.isfinite(float(aux["moe_aux"]))

    gen = llm_generate(params, cfg, batch)
    assert gen["token_ids"].shape == (B, cfg.gen_len + 1)  # BOS + gen_len
    assert bool(jnp.isfinite(gen["log_probs"]).all())


def test_moe_decode_is_batch_independent():
    """No-drop routing at decode: a row's generated caption must not depend
    on which other rows share its decode batch (capacity competition is a
    train-time-only tradeoff)."""
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import (LLMConfig, init_llm_decoder,
                                             llm_generate)
    cfg = LLMConfig(
        vocab_size=89, dim=16, num_layers=2, num_heads=2, num_kv_heads=2,
        ffn_dim=24, dropout=0.0, attention_dropout=0.0,
        max_target_positions=16, gen_len=6, loss_vocab_chunk=32,
        moe_experts=4, moe_top_k=2,
        contexts=(ContextSpec("image", 8, 3), ContextSpec("article", 8, 5)))
    params = init_llm_decoder(jax.random.PRNGKey(20), cfg)
    B = 3
    ks = jax.random.split(jax.random.PRNGKey(21), 2)
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 3, 8)),
        "article": jax.random.normal(ks[1], (B, 5, 8)),
        "article_mask": jnp.zeros((B, 5), bool),
    }
    full = llm_generate(params, cfg, batch)
    solo = llm_generate(params, cfg,
                        jax.tree.map(lambda a: a[:1], batch))
    np.testing.assert_array_equal(np.asarray(full["token_ids"][0]),
                                  np.asarray(solo["token_ids"][0]))


def test_moe_modern_trains_end_to_end(tmp_path):
    """Modern MoE family through the full Trainer path (SURVEY.md §4
    invariant 6): shards -> buckets -> DPxTP mesh (experts sharded over
    "model") -> loss decreases over epochs."""
    from tell_tpu.config import ContextSpec, small_test_config
    from tell_tpu.data.bucketing import BucketingConfig, bucket_batches
    from tell_tpu.data.records import RecordDataset, write_shard
    from tell_tpu.models.backbones import RobertaConfig, init_roberta
    from tell_tpu.models.registry import get_model
    from tell_tpu.models.llm_decoder import LLMConfig
    from tell_tpu.training.trainer import Trainer, TrainerConfig

    ccfg = small_test_config()
    rcfg = RobertaConfig(vocab_size=ccfg.decoder.vocab_size, dim=24,
                         num_layers=2, num_heads=4, ffn_dim=32,
                         max_positions=40)
    bcfg = BucketingConfig(article_lengths=(16,), caption_lengths=(12,),
                           token_budget=112, max_batch=4,
                           max_faces=4, face_dim=16, max_objects=8,
                           object_dim=32)
    mcfg = LLMConfig(
        vocab_size=ccfg.decoder.vocab_size, dim=16, num_layers=2,
        num_heads=2, num_kv_heads=2, ffn_dim=24, dropout=0.0,
        attention_dropout=0.0, max_target_positions=16, gen_len=5,
        loss_vocab_chunk=128, moe_experts=2, moe_top_k=2,
        contexts=(
            ContextSpec("image", 32, 9),
            ContextSpec("article", 24, 16),
            ContextSpec("faces", 16, 4),
            ContextSpec("obj", 32, 8),
        ))

    rng = np.random.RandomState(1)
    examples = []
    for _ in range(24):
        la, lc = rng.randint(6, 14), rng.randint(5, 11)
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

    train_ds = RecordDataset(str(tmp_path / "train-*.npz"), seed=0)
    val_ds = RecordDataset(str(tmp_path / "valid-*.npz"), seed=0)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(5), rcfg),
              "roberta_cfg": rcfg}
    tcfg = TrainerConfig(serialization_dir=str(tmp_path / "run"),
                         num_epochs=4, patience=10, lr=3e-3,
                         t_total=200, log_every=1000,
                         n_data=2, n_model=2)
    adapter = get_model("modern", mcfg)
    trainer = Trainer(ccfg, tcfg, lambda e: bucket_batches(
        train_ds.epoch(), bcfg),
        lambda: bucket_batches(val_ds.epoch(shuffle=False), bcfg),
        frozen=frozen, adapter=adapter)
    trainer.train()
    hist = trainer.metrics_history
    assert len(hist) == 4
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert np.isfinite(hist[-1]["val_loss"])


def test_llm_moe_sharding_rules_put_experts_on_model_axis():
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import LLMConfig, init_llm_decoder
    from tell_tpu.parallel import make_mesh, param_sharding_rules
    cfg = LLMConfig(
        vocab_size=89, dim=16, num_layers=2, num_heads=2, num_kv_heads=2,
        ffn_dim=24, dropout=0.0, attention_dropout=0.0,
        max_target_positions=16, gen_len=5, moe_experts=4,
        contexts=(ContextSpec("image", 8, 3),))
    params = init_llm_decoder(jax.random.PRNGKey(13), cfg)
    mesh = make_mesh(n_data=2, n_model=2)
    shardings = param_sharding_rules(params, mesh)
    spec = shardings["layers"][0]["ffn"]["w1"].spec
    assert spec[0] == "model"  # expert dim rides the model axis
    rspec = shardings["layers"][0]["ffn"]["router"]["w"].spec
    assert all(a is None for a in rspec)
