"""Ring-attention context parallelism parity on the CPU mesh.

Complements test_sequence_parallel.py (Ulysses): same sharded-encoder
contract, different mechanism — K/V blocks rotate with neighbor ppermutes
under an online softmax instead of head<->sequence all_to_alls. The ring
path must match the single-device encoder, must differentiate, and must
work with a head count NOT divisible by the mesh axis (the configuration
Ulysses cannot run).
"""
import numpy as np
import jax
import jax.numpy as jnp

from tell_tpu.models.backbones.roberta import (RobertaConfig, init_roberta,
                                               roberta_encode)
from tell_tpu.parallel import make_mesh
from tell_tpu.parallel.ring import roberta_encode_ring


def _setup(S=64, num_heads=4):
    cfg = RobertaConfig(vocab_size=200, dim=32, num_layers=2,
                        num_heads=num_heads, ffn_dim=64,
                        max_positions=S + 4)
    params = init_roberta(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, S), 4, 200)
    ids = ids.at[:, 0].set(0).at[0, S - 10:].set(cfg.pad_id)  # ragged pad
    return cfg, params, ids


def test_ring_matches_single_device():
    cfg, params, ids = _setup()
    ref = roberta_encode(params, cfg, ids, return_all_hiddens=True)
    mesh = make_mesh(n_data=2, n_model=4)
    out = roberta_encode_ring(params, cfg, ids, mesh, seq_axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_heads_not_divisible_by_axis():
    # 2 heads over a 4-way axis: Ulysses asserts out; the ring runs and
    # matches (queries stay local, so the head axis never re-shards)
    cfg, params, ids = _setup(num_heads=2)
    ref = roberta_encode(params, cfg, ids, return_all_hiddens=False)
    mesh = make_mesh(n_data=2, n_model=4)
    out = roberta_encode_ring(params, cfg, ids, mesh, seq_axis="model",
                              return_all_hiddens=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_gradient_matches_single_device():
    cfg, params, ids = _setup(S=32)
    mesh = make_mesh(n_data=2, n_model=4)
    # loss over non-pad rows only (pad-row outputs are masked downstream;
    # their near-cancelling grad contributions are pure float noise)
    w = (ids != cfg.pad_id).astype(jnp.float32)[:, :, None]

    def loss_ref(p):
        h = roberta_encode(p, cfg, ids, return_all_hiddens=False)
        return jnp.sum(w * h.astype(jnp.float32) ** 2)

    def loss_ring(p):
        h = roberta_encode_ring(p, cfg, ids, mesh, seq_axis="model",
                                return_all_hiddens=False)
        return jnp.sum(w * h.astype(jnp.float32) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_ring = jax.grad(loss_ring)(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_ring = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(g_ring)}
    for path, leaf in flat_ref:
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_ring[name]), np.asarray(leaf),
            rtol=5e-4, atol=5e-5, err_msg=name)


def test_ring_jits_under_mesh():
    cfg, params, ids = _setup()
    mesh = make_mesh(n_data=2, n_model=4)
    f = jax.jit(lambda p, i: roberta_encode_ring(
        p, cfg, i, mesh, return_all_hiddens=False).sum())
    v = float(f(params, ids))
    assert np.isfinite(v)
