"""Dynamic/lightweight conv tests.

Mirrors the reference's incremental-vs-full equivalence pattern
(/root/reference/tell/modules/convolutions/tests/test_linearized.py) plus an
independent numpy band-matrix cross-check.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tell_tpu.ops import (
    dynamic_conv, dynamic_conv_step, init_conv_state, init_dynamic_conv,
    init_lightweight_conv, lightweight_conv, lightweight_conv_step,
)
from tell_tpu.ops.linear import linear


def numpy_dynamic_conv(x, wlin, K, H, softmax=True):
    """Independent reference: softmax over full K taps, zero past padding."""
    B, T, C = x.shape
    R = C // H
    w = x @ wlin  # [B, T, H*K]
    w = w.reshape(B, T, H, K)
    if softmax:
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
    xp = np.concatenate([np.zeros((B, K - 1, C)), x], axis=1)
    out = np.zeros((B, T, C))
    for t in range(T):
        for k in range(K):
            # tap k sees input at time t - (K-1) + k
            out[:, t] += (w[:, t, :, k : k + 1]
                          * xp[:, t + k].reshape(B, H, R)).reshape(B, C)
    return out


@pytest.mark.parametrize("K,T", [(3, 10), (7, 16), (31, 8)])
def test_dynamic_conv_matches_numpy(K, T):
    B, C, H = 2, 32, 4
    rng = jax.random.PRNGKey(0)
    params = init_dynamic_conv(rng, C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    out = dynamic_conv(params, x, kernel_size=K, num_heads=H)
    ref = numpy_dynamic_conv(np.asarray(x),
                             np.asarray(params["weight_linear"]["w"]), K, H)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("K", [3, 7, 15])
def test_dynamic_conv_step_matches_full(K):
    """scan of one-step decode == full-sequence forward (causality + state)."""
    B, T, C, H = 2, 12, 32, 4
    params = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    full = dynamic_conv(params, x, kernel_size=K, num_heads=H)

    def step(state, x_t):
        out, state = dynamic_conv_step(params, x_t, state,
                                       kernel_size=K, num_heads=H)
        return state, out

    state0 = init_conv_state(B, C, K)
    _, outs = jax.lax.scan(step, state0, jnp.swapaxes(x, 0, 1))
    stepped = jnp.swapaxes(outs, 0, 1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=1e-5)


def test_dynamic_conv_causal():
    """Changing future inputs must not change past outputs."""
    B, T, C, H, K = 1, 10, 16, 4, 7
    params = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    out1 = dynamic_conv(params, x, kernel_size=K, num_heads=H)
    x2 = x.at[:, 5:].set(99.0)
    out2 = dynamic_conv(params, x2, kernel_size=K, num_heads=H)
    np.testing.assert_allclose(np.asarray(out1[:, :5]),
                               np.asarray(out2[:, :5]), atol=1e-5)


def test_kernel_longer_than_sequence():
    B, T, C, H, K = 2, 4, 16, 2, 15
    params = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    out = dynamic_conv(params, x, kernel_size=K, num_heads=H)
    ref = numpy_dynamic_conv(np.asarray(x),
                             np.asarray(params["weight_linear"]["w"]), K, H)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_lightweight_conv_step_matches_full():
    B, T, C, H, K = 2, 9, 16, 4, 5
    params = init_lightweight_conv(jax.random.PRNGKey(0), K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    full = lightweight_conv(params, x, kernel_size=K, num_heads=H)

    def step(state, x_t):
        out, state = lightweight_conv_step(params, x_t, state,
                                           kernel_size=K, num_heads=H)
        return state, out

    _, outs = jax.lax.scan(step, init_conv_state(B, C, K),
                           jnp.swapaxes(x, 0, 1))
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.swapaxes(outs, 0, 1)),
                               atol=1e-5)
