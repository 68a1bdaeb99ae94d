"""LSTM baseline decoder tests."""
import jax
import jax.numpy as jnp
import numpy as np

from tell_tpu.config import small_test_config
from tell_tpu.models.lstm_decoder import (init_lstm_decoder,
                                          lstm_decoder_forward,
                                          lstm_decoder_loss)

CFG = small_test_config().decoder


def make_inputs(rng, B=2, T=8):
    ks = jax.random.split(rng, 4)
    contexts = {
        "image": (jax.random.normal(ks[0], (B, 9, 32)),
                  jnp.zeros((B, 9), bool)),
        "article": (jax.random.normal(ks[1], (B, 16, 24)),
                    jnp.zeros((B, 16), bool).at[:, 10:].set(True)),
    }
    ids = jax.random.randint(ks[2], (B, T), 4, CFG.vocab_size)
    ids = ids.at[:, 0].set(CFG.bos_id)
    return ids, contexts


def test_forward_shapes_and_causality():
    params = init_lstm_decoder(jax.random.PRNGKey(0), CFG, num_layers=2,
                               image_dim=32, article_dim=24)
    ids, contexts = make_inputs(jax.random.PRNGKey(1))
    feats = lstm_decoder_forward(params, CFG, ids, contexts)
    assert feats.shape == (2, 8, CFG.embed_dim)
    # causality: perturbing a later token leaves earlier features unchanged
    ids2 = ids.at[:, 5].set(7)
    feats2 = lstm_decoder_forward(params, CFG, ids2, contexts)
    np.testing.assert_allclose(np.asarray(feats[:, :5]),
                               np.asarray(feats2[:, :5]), atol=1e-5)
    assert np.abs(np.asarray(feats[:, 5:]) -
                  np.asarray(feats2[:, 5:])).max() > 1e-6


def test_lstm_trains():
    params = init_lstm_decoder(jax.random.PRNGKey(0), CFG, num_layers=2,
                               image_dim=32, article_dim=24)
    ids, contexts = make_inputs(jax.random.PRNGKey(1))

    @jax.jit
    def step(p):
        def f(q):
            loss, n, _ = lstm_decoder_loss(q, CFG, ids, contexts)
            return loss / n
        loss, g = jax.value_and_grad(f)(p)
        return jax.tree.map(lambda a, b: a - 0.05 * b, p, g), loss

    losses = []
    for _ in range(10):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2
    assert all(np.isfinite(losses))
