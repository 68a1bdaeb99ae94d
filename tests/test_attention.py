"""Cross-attention tests: numpy cross-check, static-KV equivalence, masking,
bias/zero column semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from tell_tpu.ops import (
    cross_attention, cross_attention_with_kv, init_cross_attention,
    precompute_kv,
)


def _np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_matches_numpy_reference():
    B, T, S, E, Dk, H = 2, 3, 5, 16, 24, 4
    rng = jax.random.PRNGKey(0)
    p = init_cross_attention(rng, E, H, kdim=Dk, vdim=Dk)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, E))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, Dk))
    pad = jnp.zeros((B, S), bool).at[:, -1].set(True)

    out, attn = cross_attention(p, q, ctx, pad, num_heads=H,
                                need_weights=True)

    # numpy reference
    pn = jax.tree.map(np.asarray, p)
    qn, cn = np.asarray(q), np.asarray(ctx)
    hd = E // H
    qq = (qn @ pn["q_proj"]["w"] + pn["q_proj"]["b"]) * hd ** -0.5
    kk = cn @ pn["k_proj"]["w"] + pn["k_proj"]["b"]
    vv = cn @ pn["v_proj"]["w"] + pn["v_proj"]["b"]
    # bias column + zero column
    kk = np.concatenate([kk, np.tile(pn["bias_k"], (B, 1, 1)),
                         np.zeros((B, 1, E))], axis=1)
    vv = np.concatenate([vv, np.tile(pn["bias_v"], (B, 1, 1)),
                         np.zeros((B, 1, E))], axis=1)
    mask = np.concatenate([np.asarray(pad), np.zeros((B, 2), bool)], axis=1)
    qh = qq.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    kh = kk.reshape(B, S + 2, H, hd).transpose(0, 2, 1, 3)
    vh = vv.reshape(B, S + 2, H, hd).transpose(0, 2, 1, 3)
    scores = qh @ kh.transpose(0, 1, 3, 2)
    scores = np.where(mask[:, None, None, :], -np.inf, scores)
    probs = _np_softmax(scores)
    o = (probs @ vh).transpose(0, 2, 1, 3).reshape(B, T, E)
    o = o @ pn["out_proj"]["w"] + pn["out_proj"]["b"]

    np.testing.assert_allclose(np.asarray(out), o, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), probs.mean(axis=1),
                               atol=1e-5)


def test_static_kv_equivalence():
    """precompute_kv + attend == one-shot cross_attention (static_kv path)."""
    B, T, S, E, Dk, H = 2, 4, 6, 32, 48, 8
    p = init_cross_attention(jax.random.PRNGKey(0), E, H, kdim=Dk, vdim=Dk)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, E))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, S, Dk))
    pad = jnp.zeros((B, S), bool).at[0, 3:].set(True)

    out1, _ = cross_attention(p, q, ctx, pad, num_heads=H)
    k, v, m = precompute_kv(p, ctx, pad)
    out2, _ = cross_attention_with_kv(p, q, k, v, m, num_heads=H)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    # per-step decode == full-sequence (no causal mask in cross-attn)
    outs = [cross_attention_with_kv(p, q[:, t:t+1], k, v, m, num_heads=H)[0]
            for t in range(T)]
    np.testing.assert_allclose(np.asarray(out1),
                               np.asarray(jnp.concatenate(outs, axis=1)),
                               atol=1e-6)


def test_fully_masked_context_attends_to_bias_and_zero():
    """With every real key masked (e.g. no faces), softmax distributes over
    the bias + zero columns only — output is finite, no NaNs."""
    B, T, S, E, H = 2, 3, 4, 16, 4
    p = init_cross_attention(jax.random.PRNGKey(0), E, H, kdim=E, vdim=E)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, E))
    ctx = jnp.zeros((B, S, E))
    pad = jnp.ones((B, S), bool)
    out, attn = cross_attention(p, q, ctx, pad, num_heads=H,
                                need_weights=True)
    assert np.isfinite(np.asarray(out)).all()
    a = np.asarray(attn)
    np.testing.assert_allclose(a[..., :S], 0.0, atol=1e-7)
    np.testing.assert_allclose(a.sum(-1), 1.0, atol=1e-5)
