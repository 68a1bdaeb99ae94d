"""Pallas kernel parity tests (interpret mode on the CPU mesh).

SURVEY.md §4 invariant 3: Pallas dynamic-conv kernel ≡ jnp reference
(band-matrix formulation), forward + gradient.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tell_tpu.ops.dynamic_conv import (
    dynamic_conv, init_dynamic_conv, _can_fuse,
)
from tell_tpu.ops.kernels.dynamic_conv import fused_dynamic_conv, _reference


def _rearrange(w, H, K):
    C = w.shape[0]
    return w.reshape(C, H, K).transpose(0, 2, 1).reshape(C, K * H)


@pytest.mark.parametrize("B,T,C,H,K", [
    (2, 16, 128, 4, 3),
    (1, 40, 128, 8, 7),     # T not a multiple of the tile
    (2, 130, 256, 16, 31),  # T spans tiles, K large
])
def test_fused_matches_jnp(B, T, C, H, K):
    rng = jax.random.PRNGKey(0)
    p = init_dynamic_conv(rng, C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    ref = dynamic_conv(p, x, kernel_size=K, num_heads=H)  # jnp path on CPU
    w_km = _rearrange(p["weight_linear"]["w"], H, K)
    out = fused_dynamic_conv(x, w_km, K, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_no_softmax():
    B, T, C, H, K = 2, 9, 128, 4, 5
    p = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    ref = dynamic_conv(p, x, kernel_size=K, num_heads=H, weight_softmax=False)
    w_km = _rearrange(p["weight_linear"]["w"], H, K)
    out = fused_dynamic_conv(x, w_km, K, H, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gradient_matches():
    B, T, C, H, K = 2, 12, 128, 4, 3
    p = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    w_km = _rearrange(p["weight_linear"]["w"], H, K)

    def loss_fused(x, w):
        return jnp.sum(fused_dynamic_conv(x, w, K, H, True) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_reference(x, w, K, H, True) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w_km)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_km)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_dispatch_gate(monkeypatch):
    # auto on CPU -> jnp path; forced -> pallas path accepted by dynamic_conv
    C, H, K = 128, 4, 3
    p = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    assert not _can_fuse(p, None, 0.0, True, H, C)  # auto+cpu = off
    monkeypatch.setenv("TELL_TPU_FUSED", "1")
    assert _can_fuse(p, None, 0.0, True, H, C)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, C))
    out = dynamic_conv(p, x, kernel_size=K, num_heads=H)
    monkeypatch.setenv("TELL_TPU_FUSED", "0")
    ref = dynamic_conv(p, x, kernel_size=K, num_heads=H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
