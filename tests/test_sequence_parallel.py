"""Sequence-parallel (Ulysses) article encoding parity on the CPU mesh.

SURVEY.md §5: the reference truncates articles at 512 tokens and has no
sequence parallelism; this is the scale-out path for longer articles. The
sharded encoder must match the single-device encoder exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp

from tell_tpu.models.backbones.roberta import (RobertaConfig, init_roberta,
                                               roberta_encode)
from tell_tpu.parallel import make_mesh
from tell_tpu.parallel.sequence import roberta_encode_seq_parallel


def _setup(S=64):
    cfg = RobertaConfig(vocab_size=200, dim=32, num_layers=2, num_heads=4,
                        ffn_dim=64, max_positions=S + 4)
    params = init_roberta(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, S), 4, 200)
    ids = ids.at[:, 0].set(0).at[0, S - 10:].set(cfg.pad_id)  # ragged pad
    return cfg, params, ids


def test_seq_parallel_matches_single_device():
    cfg, params, ids = _setup()
    ref = roberta_encode(params, cfg, ids, return_all_hiddens=True)
    mesh = make_mesh(n_data=2, n_model=4)
    out = roberta_encode_seq_parallel(params, cfg, ids, mesh,
                                      seq_axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_parallel_final_hidden():
    cfg, params, ids = _setup()
    ref = roberta_encode(params, cfg, ids, return_all_hiddens=False)
    mesh = make_mesh(n_data=2, n_model=4)
    out = roberta_encode_seq_parallel(params, cfg, ids, mesh,
                                      seq_axis="model",
                                      return_all_hiddens=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_seq_parallel_jits_under_mesh():
    cfg, params, ids = _setup()
    mesh = make_mesh(n_data=2, n_model=4)
    f = jax.jit(lambda p, i: roberta_encode_seq_parallel(
        p, cfg, i, mesh, return_all_hiddens=False).sum())
    v = float(f(params, ids))
    assert np.isfinite(v)
