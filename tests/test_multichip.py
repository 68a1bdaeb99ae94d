"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 invariant 5 — the fake-backend strategy the reference lacks)."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tell_tpu.config import small_test_config
from tell_tpu.models import init_captioner
from tell_tpu.parallel import (batch_sharding, make_mesh,
                               param_sharding_rules, shard_params)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_param_sharding_rules_cover_tree():
    cfg = small_test_config()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = param_sharding_rules(params, mesh)
    # every leaf got a sharding; head-projection weights are model-sharded
    n = len(jax.tree.leaves(shardings))
    assert n == len(jax.tree.leaves(params))
    qw = shardings["decoder"]["layers"][0]["attn"]["image"]["q_proj"]["w"]
    assert "model" in str(qw.spec)
    emb = shardings["decoder"]["embed"]["bands"][0]["embed"]
    assert "model" in str(emb.spec)


def test_sharded_loss_matches_single_device():
    """DP x TP sharded loss == unsharded loss (collectives are correct)."""
    from tell_tpu.models.captioner import captioner_loss
    from tests.test_decoder import make_batch

    cfg = small_test_config()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1), B=4)

    loss_ref, _ = jax.jit(lambda p, b: captioner_loss(p, cfg, b))(params,
                                                                  batch)

    mesh = make_mesh(n_data=4, n_model=2)
    params_s = shard_params(params, mesh)
    batch_s = jax.device_put(batch, batch_sharding(mesh, batch))
    with mesh:
        loss_s, _ = jax.jit(lambda p, b: captioner_loss(p, cfg, b))(params_s,
                                                                    batch_s)
    np.testing.assert_allclose(float(loss_ref), float(loss_s), rtol=2e-4)


def test_graft_dryrun_multichip():
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_modern_sharded_loss_matches_single_device():
    """The modern LM's DP x TP sharded loss == unsharded loss (GQA heads
    and SwiGLU widths shard over 'model'; tied vocab table over rows)."""
    from tests.test_llm_decoder import CFG, make_batch
    from tell_tpu.models.llm_decoder import init_llm_decoder, llm_loss

    params = init_llm_decoder(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1), B=4)
    ref = float(llm_loss(params, CFG, batch)[0])

    mesh = make_mesh(n_data=4, n_model=2)
    sharded_params = shard_params(params, mesh)
    qw = param_sharding_rules(params, mesh)["layers"][0]["self_attn"]["q"][
        "w"]
    assert "model" in str(qw.spec)
    sharded_batch = jax.device_put(batch, batch_sharding(mesh, batch))
    with mesh:
        loss = float(jax.jit(
            lambda p, b: llm_loss(p, CFG, b)[0])(sharded_params,
                                                 sharded_batch))
    np.testing.assert_allclose(loss, ref, rtol=2e-5)


def test_force_host_device_flag_rewrites_existing():
    """A pre-existing smaller --xla_force_host_platform_device_count must
    be RAISED (a substring check would keep it and the child backend would
    come up with too few devices); larger or equal counts are kept; absent
    flag is appended."""
    import __graft_entry__ as ge

    f = ge._force_host_device_flag
    assert f("", 8) == "--xla_force_host_platform_device_count=8"
    assert f("--xla_foo=1", 8) == (
        "--xla_foo=1 --xla_force_host_platform_device_count=8")
    assert f("--xla_force_host_platform_device_count=2", 8) == (
        "--xla_force_host_platform_device_count=8")
    assert f("--xla_force_host_platform_device_count=16", 8) == (
        "--xla_force_host_platform_device_count=16")
    assert f("--a=1 --xla_force_host_platform_device_count=2 --b=2", 8) == (
        "--a=1 --xla_force_host_platform_device_count=8 --b=2")
