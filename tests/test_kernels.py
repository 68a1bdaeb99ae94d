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


# ---------------------------------------------------------------------------
# Fused multi-context decode attention
# ---------------------------------------------------------------------------

def test_fused_decode_attention_matches_reference():
    from tell_tpu.ops.kernels.decode_attention import (
        fused_decode_attention, reference_decode_attention)
    B, H, M, G, S, hd = 2, 4, 3, 5, 24, 16
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (B, H, M * G, hd))
    k = jax.random.normal(ks[1], (B, H, hd, S))
    v = jax.random.normal(ks[2], (B, H, hd, S))
    seg = jnp.asarray([0] * 10 + [1] * 6 + [2] * 8, jnp.int32)
    pad = jnp.zeros((B, S), bool).at[:, 8:10].set(True).at[1, 20:].set(True)
    from tell_tpu.ops.kernels.decode_attention import segment_bias
    bias = segment_bias(seg, pad, M, G)
    ref = reference_decode_attention(q, k, v, bias)
    out = fused_decode_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_decode_attention_q8_matches_jnp_int8_math():
    """The int8-K/V kernel must equal the jnp int8 path EXACTLY (same
    quantized values, scales factored out of both contractions)."""
    from tell_tpu.ops.kernels.decode_attention import (
        fused_decode_attention_q8, segment_bias)
    from tell_tpu.models.decoder import _quantize_kv
    B, H, M, G, S, hd = 2, 4, 3, 5, 24, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, H, M * G, hd))
    k = jax.random.normal(ks[1], (B, H, hd, S))
    v = jax.random.normal(ks[2], (B, H, hd, S))
    k8, k_s = _quantize_kv(k)
    v8, v_s = _quantize_kv(v)
    seg = jnp.asarray([0] * 10 + [1] * 6 + [2] * 8, jnp.int32)
    pad = jnp.zeros((B, S), bool).at[:, 8:10].set(True).at[1, 20:].set(True)
    bias = segment_bias(seg, pad, M, G)

    # jnp twin of the int8 math (the _attn_group quant branch)
    scores = jnp.einsum("bhxd,bhds->bhxs", q, k8.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_s + bias[:, None]
    p = jax.nn.softmax(scores, axis=-1) * v_s
    ref = jnp.einsum("bhxs,bhds->bhxd", p.astype(q.dtype),
                     v8.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)

    out = fused_decode_attention_q8(q, k8, k_s, v8, v_s, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the int8 result approximates the fp result to quantization error
    from tell_tpu.ops.kernels.decode_attention import (
        reference_decode_attention)
    fp = reference_decode_attention(q, k, v, bias)
    assert np.max(np.abs(np.asarray(out) - np.asarray(fp))) < 0.1


def test_decoder_step_kv8_fused_matches_kv8_jnp(monkeypatch):
    """With TELL_TPU_KV8=1, fused-on vs fused-off decoder_step agree (the
    int8 kernel and the jnp int8 branch share quantized values)."""
    from tell_tpu.config import small_test_config
    from tell_tpu.models.decoder import (decoder_step, init_decoder,
                                         init_decode_state)
    cfg = small_test_config().decoder
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B = 2
    contexts = {}
    for i, spec in enumerate(cfg.contexts):
        feats = jax.random.normal(ks[i], (B, spec.max_len, spec.kv_dim))
        mask = jnp.zeros((B, spec.max_len), bool)
        contexts[spec.name] = (feats, mask)
    toks = jnp.array([5, 9], jnp.int32)

    monkeypatch.setenv("TELL_TPU_KV8", "1")
    monkeypatch.setenv("TELL_TPU_FUSED", "0")
    state = init_decode_state(params, cfg, contexts, B)
    ref, _, _ = decoder_step(params, cfg, toks, state)
    monkeypatch.setenv("TELL_TPU_FUSED", "1")
    state = init_decode_state(params, cfg, contexts, B)
    out, _, _ = decoder_step(params, cfg, toks, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decoder_step_with_fused_attention(monkeypatch):
    """decoder_step output is identical with kernels forced on (interpret)."""
    from tell_tpu.config import small_test_config
    from tell_tpu.models.decoder import (decoder_step, init_decoder,
                                         init_decode_state)
    cfg = small_test_config().decoder
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B = 2
    contexts = {}
    for i, spec in enumerate(cfg.contexts):
        feats = jax.random.normal(ks[i], (B, spec.max_len, spec.kv_dim))
        mask = jnp.zeros((B, spec.max_len), bool)
        contexts[spec.name] = (feats, mask)
    toks = jnp.array([5, 9], jnp.int32)

    monkeypatch.setenv("TELL_TPU_FUSED", "0")
    state = init_decode_state(params, cfg, contexts, B)
    ref, _, _ = decoder_step(params, cfg, toks, state)
    monkeypatch.setenv("TELL_TPU_FUSED", "1")
    state = init_decode_state(params, cfg, contexts, B)
    out, _, _ = decoder_step(params, cfg, toks, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Fused logits top-k + logsumexp
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N,D,V,k", [
    (8, 64, 300, 5),     # V not a tile multiple (padded final tile)
    (4, 32, 2048, 1),    # greedy
    (3, 16, 4100, 8),
])
def test_topk_logits_matches_reference(N, D, V, k):
    from tell_tpu.ops.kernels.topk_logits import (reference_topk_logits,
                                                  topk_logits)
    x = jax.random.normal(jax.random.PRNGKey(0), (N, D))
    t = jax.random.normal(jax.random.PRNGKey(1), (V, D))
    rv, ri, rlse = reference_topk_logits(x, t, k)
    v, i, lse = topk_logits(x, t, k)
    np.testing.assert_allclose(np.asarray(v), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; values above already pin them
    same = np.asarray(i) == np.asarray(ri)
    tied = np.isclose(np.asarray(v), np.asarray(rv))
    assert (same | tied).all()


def test_fused_decode_attention_long_context_dispatch():
    """Dispatch ladder: single-shot kernel while the whole K/V stripe fits
    a VMEM cell, S-tiled online-softmax kernel past that. _pick_bb /
    _pick_tile sanity at production head shapes (H=16, hd=64, MG=20)."""
    from tell_tpu.ops.kernels.decode_attention import (
        _pick_bb, _pick_tile, fused_decode_attention,
        reference_decode_attention, segment_bias)
    # production shape keeps BB=2; bf16 S=1024 fits single-shot at BB=1;
    # S=4096 rides the tiled kernel (BB=2, TS=512 measured fastest)
    assert _pick_bb(64, 16, 64, 640, 20, 2) == 2
    assert _pick_bb(64, 16, 64, 1024, 20, 2) == 1
    assert _pick_bb(64, 16, 64, 4096, 20, 2) is None
    assert _pick_tile(64, 16, 64, 4096, 20, 2) == (2, 512)

    B, M, G, hd = 2, 2, 1, 64
    S = 4200  # ragged: 4200 = 16*256 + 104, so the last tile is partial
    # H=2 fp32 fits single-shot (BB=1); H=16 must go tiled
    assert _pick_bb(B, 2, hd, S, M * G, 4) is not None
    assert _pick_bb(B, 16, hd, S, M * G, 4) is None
    assert _pick_tile(B, 16, hd, S, M * G, 4) is not None
    for H in (2, 16):
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (B, H, M * G, hd))
        k = jax.random.normal(ks[1], (B, H, hd, S))
        v = jax.random.normal(ks[2], (B, H, hd, S))
        seg = jnp.concatenate([jnp.zeros(S // 2, jnp.int32),
                               jnp.ones(S - S // 2, jnp.int32)])
        pad = jnp.zeros((B, S), bool).at[:, -300:].set(True)
        bias = segment_bias(seg, pad, M, G)
        out = fused_decode_attention(q, k, v, bias)
        ref = reference_decode_attention(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_fused_decode_attention_q8_long_context_tiled():
    """The int8-K/V tiled kernel must match the jnp int8 math to fp32
    rounding across tiles (incl. a ragged final tile and padded tail)."""
    from tell_tpu.ops.kernels.decode_attention import (
        _pick_bb, _tiled_decode_attention_q8, segment_bias)
    from tell_tpu.models.decoder import _quantize_kv
    B, H, M, G, hd = 2, 2, 2, 1, 16
    S = 300  # TS=128 -> 3 tiles, last ragged
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, H, M * G, hd))
    k = jax.random.normal(ks[1], (B, H, hd, S))
    v = jax.random.normal(ks[2], (B, H, hd, S))
    k8, k_s = _quantize_kv(k)
    v8, v_s = _quantize_kv(v)
    seg = (jnp.arange(S) * M // S).astype(jnp.int32)
    pad = jnp.zeros((B, S), bool).at[:, -50:].set(True)
    bias = segment_bias(seg, pad, M, G)

    scores = jnp.einsum("bhxd,bhds->bhxs", q, k8.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    scores = scores * k_s + bias[:, None]
    p = jax.nn.softmax(scores, axis=-1) * v_s
    ref = jnp.einsum("bhxs,bhds->bhxd", p.astype(q.dtype),
                     v8.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = _tiled_decode_attention_q8(q, k8, k_s, v8, v_s, bias, 2, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_dynamic_conv_short_sequence():
    """T < kernel_size (caption bucket 16 under the K=31 layer) must not
    crash the fused kernel and must match the jnp reference."""
    B, T, C, H, K = 2, 15, 128, 4, 31
    p = init_dynamic_conv(jax.random.PRNGKey(0), C, K, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    ref = dynamic_conv(p, x, kernel_size=K, num_heads=H)
    w_km = _rearrange(p["weight_linear"]["w"], H, K)
    out = fused_dynamic_conv(x, w_km, K, H, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_unpack_int4_roundtrip():
    """_quantize_kv4 packs rows (d, d+hd/2) into nibble pairs; unpack_int4
    must restore the exact clipped/rounded int4 values in original order."""
    from tell_tpu.models.decoder import _quantize_kv4
    from tell_tpu.ops.kernels.decode_attention import unpack_int4
    t = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 24)) * 2.0
    packed, scale = _quantize_kv4(t)
    assert packed.shape == (2, 3, 8, 24) and packed.dtype == jnp.int8
    got = np.asarray(unpack_int4(packed))
    want = np.clip(np.round(np.asarray(t) / np.asarray(scale)), -7, 7)
    np.testing.assert_array_equal(got, want.astype(np.int8))


def test_fused_decode_attention_q4_matches_jnp_int4_math():
    """The nibble-packed int4 path through the q8 kernel must equal the
    jnp twin exactly and approximate the fp result to int4 rounding."""
    from tell_tpu.models.decoder import _quantize_kv4
    from tell_tpu.ops.kernels.decode_attention import (
        fused_decode_attention_q8, reference_decode_attention,
        reference_decode_attention_q8, segment_bias)
    B, H, M, G, S, hd = 2, 4, 3, 5, 24, 16
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, H, M * G, hd))
    k = jax.random.normal(ks[1], (B, H, hd, S))
    v = jax.random.normal(ks[2], (B, H, hd, S))
    k4, k_s = _quantize_kv4(k)
    v4, v_s = _quantize_kv4(v)
    seg = jnp.asarray([0] * 10 + [1] * 6 + [2] * 8, jnp.int32)
    pad = jnp.zeros((B, S), bool).at[:, 8:10].set(True).at[1, 20:].set(True)
    bias = segment_bias(seg, pad, M, G)
    ref = reference_decode_attention_q8(q, k4, k_s, v4, v_s, bias)
    out = fused_decode_attention_q8(q, k4, k_s, v4, v_s, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    fp = reference_decode_attention(q, k, v, bias)
    # int4 rounding error on unit-normal K/V; sanity bound, not parity
    assert np.max(np.abs(np.asarray(out) - np.asarray(fp))) < 1.0


def test_fused_decode_attention_q4_long_context_tiled():
    """int4 through the S-tiled online-softmax kernel (ragged final tile
    + padded tail) must match the jnp twin."""
    from tell_tpu.models.decoder import _quantize_kv4
    from tell_tpu.ops.kernels.decode_attention import (
        _tiled_decode_attention_q8, reference_decode_attention_q8,
        segment_bias)
    B, H, M, G, hd = 2, 2, 2, 1, 16
    S = 300
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, H, M * G, hd))
    k = jax.random.normal(ks[1], (B, H, hd, S))
    v = jax.random.normal(ks[2], (B, H, hd, S))
    k4, k_s = _quantize_kv4(k)
    v4, v_s = _quantize_kv4(v)
    seg = (jnp.arange(S) * M // S).astype(jnp.int32)
    pad = jnp.zeros((B, S), bool).at[:, -50:].set(True)
    bias = segment_bias(seg, pad, M, G)
    ref = reference_decode_attention_q8(q, k4, k_s, v4, v_s, bias)
    out = _tiled_decode_attention_q8(q, k4, k_s, v4, v_s, bias, 2, 128,
                                     pack4=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decoder_step_kv4_fused_matches_kv4_jnp(monkeypatch):
    """With TELL_TPU_KV4=1, fused-on vs fused-off decoder_step agree (the
    packed-int4 kernel path and the jnp unpack branch share quantized
    values)."""
    from tell_tpu.config import small_test_config
    from tell_tpu.models.decoder import (decoder_step, init_decoder,
                                         init_decode_state)
    cfg = small_test_config().decoder
    params = init_decoder(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B = 2
    contexts = {}
    for i, spec in enumerate(cfg.contexts):
        feats = jax.random.normal(ks[i], (B, spec.max_len, spec.kv_dim))
        mask = jnp.zeros((B, spec.max_len), bool)
        contexts[spec.name] = (feats, mask)
    toks = jnp.array([5, 9], jnp.int32)

    monkeypatch.setenv("TELL_TPU_KV4", "1")
    monkeypatch.setenv("TELL_TPU_FUSED", "0")
    state = init_decode_state(params, cfg, contexts, B)
    ref, _, _ = decoder_step(params, cfg, toks, state)
    monkeypatch.setenv("TELL_TPU_FUSED", "1")
    state = init_decode_state(params, cfg, contexts, B)
    out, _, _ = decoder_step(params, cfg, toks, state)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_env_flag_parsing(monkeypatch):
    """Opt-in: only 1/true/on enable. Opt-out (default=True): 0/false/off
    AND set-but-empty (`NAME= cmd`) disable — an operator exporting an
    empty TELL_TPU_KV8 to force the fp parity path must get the fp path."""
    from tell_tpu.ops.kernels.dispatch import env_flag

    monkeypatch.delenv("X_FLAG", raising=False)
    assert env_flag("X_FLAG") is False
    assert env_flag("X_FLAG", default=True) is True
    for raw, opt_in, opt_out in [("1", True, True), ("true", True, True),
                                 ("on", True, True), ("0", False, False),
                                 ("false", False, False), ("off", False,
                                                           False),
                                 ("", False, False)]:
        monkeypatch.setenv("X_FLAG", raw)
        assert env_flag("X_FLAG") is opt_in, raw
        assert env_flag("X_FLAG", default=True) is opt_out, raw
