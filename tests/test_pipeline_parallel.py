"""Pipeline parallelism: GPipe stage rotation == sequential layer stack.

The reference has no pipeline parallelism (SURVEY.md §2.10); this validates
the pp axis of the mesh taxonomy on the virtual CPU mesh (SURVEY.md §4
invariant 5 — multi-chip tests without a pod).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tell_tpu.parallel.mesh import P  # noqa: F401  (import check)
from tell_tpu.parallel.pipeline import (pipeline_apply, pipeline_spec,
                                        stack_stages)
from jax.sharding import Mesh


def _mesh(n):
    devs = np.array(jax.devices()[:n]).reshape(n)
    return Mesh(devs, ("pipe",))


def _layer(rng, d):
    k1, k2 = jax.random.split(rng)
    return {"w": jax.random.normal(k1, (d, d)) * 0.3,
            "b": jax.random.normal(k2, (d,)) * 0.1}


def _layer_fn(lp, x, extras):
    bias = extras[0] if extras else 0.0
    return jnp.tanh(x @ lp["w"] + lp["b"] + bias)


def _sequential(layers, x, extras=()):
    for lp in layers:
        x = _layer_fn(lp, x, extras)
    return x


def test_pipeline_matches_sequential():
    d, L, B = 16, 8, 12
    mesh = _mesh(4)
    layers = [_layer(jax.random.fold_in(jax.random.PRNGKey(0), i), d)
              for i in range(L)]
    x = jax.random.normal(jax.random.PRNGKey(1), (B, d))
    ref = _sequential(layers, x)
    stacked = stack_stages(layers, 4)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh))
    for n_micro in (2, 4, 6, 12):
        out = pipeline_apply(stacked, _layer_fn, x, mesh, n_micro)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_llm_pipeline_matches_sequential():
    """The modern LM's pp path (llm_loss_pp over a 2-stage pipe mesh) equals
    the sequential llm_loss, value and layer gradients."""
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import (
        LLMConfig, init_llm_decoder, llm_loss, llm_loss_pp, llm_pp_sharding,
        stack_llm_layers)
    cfg = LLMConfig(
        vocab_size=97, dim=16, num_layers=4, num_heads=2, num_kv_heads=1,
        ffn_dim=24,
        dropout=0.0, attention_dropout=0.0, max_target_positions=16,
        gen_len=5, loss_vocab_chunk=32,
        contexts=(ContextSpec("image", 8, 3), ContextSpec("article", 8, 5)))
    params = init_llm_decoder(jax.random.PRNGKey(4), cfg)
    B, T = 4, 8
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    caps = jax.random.randint(ks[2], (B, T), 4, cfg.vocab_size)
    caps = caps.at[:, 0].set(0).at[:, -1].set(2)
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 3, 8)),
        "article": jax.random.normal(ks[1], (B, 5, 8)),
        "article_mask": jnp.zeros((B, 5), bool),
        "caption_ids": caps,
    }
    mesh = _mesh(2)
    stacked = stack_llm_layers(params, 2)
    stacked = jax.device_put(stacked, llm_pp_sharding(stacked, mesh))

    def loss_pp(st):
        return llm_loss_pp(st, cfg, batch, mesh, n_micro=2)[0]

    def loss_seq(p):
        return llm_loss(p, cfg, batch)[0]

    lp, gp = jax.value_and_grad(loss_pp)(stacked)
    ls, gs = jax.value_and_grad(loss_seq)(params)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    gref = stack_llm_layers(gs, 2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gp["layers"], gref["layers"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        gp["tok_embed"], gref["tok_embed"])


def test_pipeline_dp_x_pp_matches_sequential():
    """dp x pp composition: ("pipe", "data") mesh shards microbatch
    examples over "data" while stages rotate over "pipe"; still exact."""
    d, L, B = 16, 4, 16
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("pipe", "data"))
    layers = [_layer(jax.random.fold_in(jax.random.PRNGKey(6), i), d)
              for i in range(L)]
    x = jax.random.normal(jax.random.PRNGKey(7), (B, d))
    ref = _sequential(layers, x)
    stacked = stack_stages(layers, 2)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh))
    out = pipeline_apply(stacked, _layer_fn, x, mesh, n_micro=4,
                         data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    def loss_pp(st, x):
        return jnp.sum(pipeline_apply(st, _layer_fn, x, mesh, 4,
                                      data_axis="data") ** 2)

    def loss_seq(layers, x):
        return jnp.sum(_sequential(layers, x) ** 2)

    lp, gp = jax.value_and_grad(loss_pp)(stacked, x)
    ls, gs = jax.value_and_grad(loss_seq)(layers, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    gref = stack_stages(gs, 2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gp, gref)


def test_layer_aux_sums_real_work_only():
    """layer_aux totals every (layer, microbatch) contribution exactly once
    — bubble-tick recomputes must not inflate it."""
    d, L, B, n_micro = 8, 4, 8, 4
    mesh = _mesh(2)
    layers = [_layer(jax.random.fold_in(jax.random.PRNGKey(8), i), d)
              for i in range(L)]
    x = jax.random.normal(jax.random.PRNGKey(9), (B, d))

    def layer_fn(lp, h, extras):
        out = _layer_fn(lp, h, ())
        return out, jnp.sum(out ** 2)

    stacked = stack_stages(layers, 2)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh))
    out, aux = pipeline_apply(stacked, layer_fn, x, mesh, n_micro,
                              layer_aux=True)
    # sequential reference: per-microbatch per-layer sums
    ref_aux = 0.0
    for m in range(n_micro):
        h = x[m * 2:(m + 1) * 2]
        for lp in layers:
            h = _layer_fn(lp, h, ())
            ref_aux += float(jnp.sum(h ** 2))
    np.testing.assert_allclose(float(aux), ref_aux, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_sequential(layers, x)),
                               rtol=1e-5, atol=1e-5)


def test_llm_pp_with_moe_trains():
    """pp x ep: the modern LM with MoE FFNs runs pipelined — finite loss
    with the aux term, finite stage-sharded grads including experts."""
    from tell_tpu.config import ContextSpec
    from tell_tpu.models.llm_decoder import (
        LLMConfig, init_llm_decoder, llm_loss_pp, llm_pp_sharding,
        stack_llm_layers)
    cfg = LLMConfig(
        vocab_size=97, dim=16, num_layers=4, num_heads=2, num_kv_heads=2,
        ffn_dim=24, dropout=0.0, attention_dropout=0.0,
        max_target_positions=16, gen_len=5, loss_vocab_chunk=32,
        moe_experts=2, moe_top_k=2,
        contexts=(ContextSpec("image", 8, 3), ContextSpec("article", 8, 5)))
    params = init_llm_decoder(jax.random.PRNGKey(10), cfg)
    B, T = 4, 8
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    caps = jax.random.randint(ks[2], (B, T), 4, cfg.vocab_size)
    caps = caps.at[:, 0].set(0).at[:, -1].set(2)
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 3, 8)),
        "article": jax.random.normal(ks[1], (B, 5, 8)),
        "article_mask": jnp.zeros((B, 5), bool),
        "caption_ids": caps,
    }
    mesh = _mesh(2)
    stacked = stack_llm_layers(params, 2)
    stacked = jax.device_put(stacked, llm_pp_sharding(stacked, mesh))

    def loss(st):
        l, aux = llm_loss_pp(st, cfg, batch, mesh, n_micro=2)
        return l, aux

    (l, aux), g = jax.value_and_grad(loss, has_aux=True)(stacked)
    assert np.isfinite(float(l))
    assert "moe_aux" in aux and np.isfinite(float(aux["moe_aux"]))
    for leaf in jax.tree.leaves(g):
        assert bool(jnp.isfinite(leaf).all())
    assert float(jnp.abs(g["layers"]["ffn"]["router"]["w"]).sum()) > 0


def test_stage_mesh_mismatch_raises():
    """A stacked stage count that does not match the pipe axis must be a
    loud error, not silently dropped layers."""
    import pytest
    mesh = _mesh(2)
    layers = [{"w": jnp.eye(4)} for _ in range(4)]
    stacked = stack_stages(layers, 4)  # 4 stages, 2-device axis
    x = jnp.ones((4, 4))
    with pytest.raises(AssertionError, match="stages"):
        pipeline_apply(stacked, lambda lp, h, _: h @ lp["w"], x, mesh, 2)


def test_pipeline_with_extras_and_grad():
    """extras reach every layer; gradients flow through the ppermute chain
    back to stage-sharded params."""
    d, L, B = 8, 4, 8
    mesh = _mesh(2)
    layers = [_layer(jax.random.fold_in(jax.random.PRNGKey(2), i), d)
              for i in range(L)]
    x = jax.random.normal(jax.random.PRNGKey(3), (B, d))
    bias = jnp.full((d,), 0.05)
    stacked = stack_stages(layers, 2)
    stacked = jax.device_put(stacked, pipeline_spec(stacked, mesh))

    def loss_pp(stacked, x):
        return jnp.sum(pipeline_apply(stacked, _layer_fn, x, mesh, 4,
                                      extras=(bias,)) ** 2)

    def loss_seq(layers, x):
        return jnp.sum(_sequential(layers, x, (bias,)) ** 2)

    lp, gp = jax.value_and_grad(loss_pp)(stacked, x)
    ls, gs = jax.value_and_grad(loss_seq)(layers, x)
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    # per-layer grads equal after unstacking [P, L/P, ...]
    gref = stack_stages(gs, 2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), gp, gref)
