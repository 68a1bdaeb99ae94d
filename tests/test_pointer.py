"""Pointer/copy model tests.

Key invariants:
* strict-causal self-attention never sees the present/future, and its
  incremental path matches the full forward (SURVEY.md §4 invariant 1
  generalized to the entity head);
* the static matched-sum copy probability equals an explicit reduced-vocab
  scatter-add + gather (the reference's formulation,
  transformer_pointer.py:262-303);
* pointer losses are finite + differentiable, zero when no entities;
* generation emits copied tokens only from proper-noun context positions.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tell_tpu.config import small_test_config
from tell_tpu.models.pointer import (
    PointerConfig, init_pointer, pointer_generate, pointer_loss,
    _copy_target_probs,
)
from tell_tpu.ops.self_attention import (
    copy_attention_scores, init_copy_attention, init_self_attention,
    self_attention,
)


def _cfg(version=1):
    cap = small_test_config()
    import dataclasses
    cap = dataclasses.replace(
        cap, decoder=dataclasses.replace(
            cap.decoder, contexts=cap.decoder.contexts[:3]),  # faces model
        gen_len=8)
    return PointerConfig(captioner=cap, copy_loss_version=version,
                         attn_dropout=0.0)


def _batch(cfg, B=2, T=10, S=16, seed=0):
    dcfg = cfg.captioner.decoder
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    caption = jax.random.randint(ks[0], (B, T), 4, dcfg.vocab_size)
    caption = caption.at[:, 0].set(dcfg.bos_id)
    caption = caption.at[:, -1].set(dcfg.eos_id)
    context_ids = jax.random.randint(ks[1], (B, S), 4, dcfg.vocab_size)
    # plant entity 1 and 2: caption tokens 2-3 copy context positions 5, 7
    caption = caption.at[:, 2].set(context_ids[0, 5])
    cap_masks = jnp.zeros((B, T), jnp.int32)
    cap_masks = cap_masks.at[:, 2].set(1).at[:, 3].set(2)
    proper = jnp.zeros((B, S), jnp.int32)
    proper = proper.at[:, 5].set(1).at[:, 7].set(2)
    art = cfg.captioner.decoder.context("article")
    return {
        "caption_ids": caption,
        "caption_copy_masks": cap_masks,
        "context_ids": context_ids,
        "proper_masks": proper,
        "image_grid": jax.random.normal(ks[2], (B, 9, 32)),
        "article": jax.random.normal(ks[3], (B, S, art.kv_dim)),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jax.random.normal(ks[4], (B, 4, 16)),
    }


def test_self_attention_strictly_causal():
    p = init_self_attention(jax.random.PRNGKey(0), 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 64))
    out = self_attention(p, x, 4)
    # changing the future must not change the past
    x2 = x.at[:, 4:].set(9.0)
    out2 = self_attention(p, x2, 4)
    np.testing.assert_allclose(np.asarray(out[:, :4]),
                               np.asarray(out2[:, :4]), atol=1e-6)
    # step 0 attends only to the scalar-bias zero vector: attn out is 0,
    # so out = LN(x + out_proj_bias_only_path(0))
    # (checked indirectly: out[0] independent of all other positions)
    x3 = x.at[:, 1:].set(-3.0)
    out3 = self_attention(p, x3, 4)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out3[:, 0]),
                               atol=1e-6)


def test_self_attention_incremental_matches_full():
    p = init_self_attention(jax.random.PRNGKey(0), 64)
    B, T, E = 2, 6, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, E))
    full = self_attention(p, x, 4)
    G = 8
    hist = jnp.zeros((B, G, E))
    steps = []
    for t in range(T):
        hist = hist.at[:, t].set(x[:, t])
        valid = (jnp.arange(G) <= t)[None, :].repeat(B, 0)
        o = self_attention(p, x[:, t:t + 1], 4, q_offset=t, kv=hist,
                           kv_valid=valid)
        steps.append(o[:, 0])
    inc = jnp.stack(steps, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=1e-5, atol=1e-5)


def test_copy_scores_shape_and_normalization():
    p = init_copy_attention(jax.random.PRNGKey(0), 64)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 64))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 11, 64))
    mask = jnp.zeros((2, 11), bool).at[:, 9:].set(True)
    s = copy_attention_scores(p, q, k, mask, num_heads=4)
    assert s.shape == (2, 5, 13)
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, rtol=1e-5)
    assert np.asarray(s[:, :, 9:11]).max() == 0.0  # padded positions


def test_matched_sum_equals_scatter_add():
    rng = np.random.RandomState(0)
    B, L, S, V = 2, 5, 9, 40
    attn = rng.rand(B, L, S).astype(np.float32)
    ids = rng.randint(0, V, (B, S))
    proper = rng.rand(B, S) > 0.4
    targets = rng.randint(0, V, (B, L))
    targets[0, 1] = ids[0][proper[0]][0] if proper[0].any() else targets[0, 1]
    attn_m = attn * proper[:, None, :]
    # explicit reduced-vocab scatter-add (the reference algorithm)
    expected = np.zeros((B, L))
    for b in range(B):
        probs = np.zeros((L, V))
        for s in range(S):
            if proper[b, s]:
                probs[:, ids[b, s]] += attn[b, :, s]
        for l in range(L):
            expected[b, l] = probs[l, targets[b, l]]
    got = _copy_target_probs(jnp.asarray(attn_m), jnp.asarray(ids),
                             jnp.asarray(proper), jnp.asarray(targets))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5,
                               atol=1e-6)


@pytest.mark.parametrize("version", [1, 2])
def test_pointer_loss_finite_and_differentiable(version):
    cfg = _cfg(version)
    params = init_pointer(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)

    def f(p):
        loss, aux = pointer_loss(p, cfg, batch)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(aux["gen_loss"]))
    g = jax.tree.leaves(jax.tree.map(lambda a: jnp.abs(a).sum(), grads))
    assert np.isfinite(np.asarray(g, dtype=np.float64)).all()
    # entity/copy heads must receive gradient
    assert float(jnp.abs(grads["entity_fc"]["v"]).sum()) > 0
    assert float(jnp.abs(grads["copy_attn"]["q_w"]).sum()) > 0


def test_pointer_loss_zero_without_entities():
    cfg = _cfg()
    params = init_pointer(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    batch["caption_copy_masks"] = jnp.zeros_like(batch["caption_copy_masks"])
    loss, _ = pointer_loss(params, cfg, batch)
    assert float(loss) == 0.0


def test_pointer_generate_copies_from_context():
    cfg = _cfg()
    params = init_pointer(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg)
    out = jax.jit(lambda p, b: pointer_generate(p, cfg, b),
                  static_argnames=())(params, batch)
    B, G = out["should_copy"].shape
    assert out["token_ids"].shape == (B, cfg.captioner.gen_len + 1)
    toks = np.asarray(out["token_ids"][:, 1:])
    copied = np.asarray(out["should_copy"])
    ids = np.asarray(batch["context_ids"])
    proper = np.asarray(batch["proper_masks"]) >= 1
    for b in range(B):
        allowed = set(ids[b][proper[b]].tolist())
        for t in range(G):
            if copied[b, t]:
                assert toks[b, t] in allowed
    # copy probabilities are only reported on copy steps
    cp = np.asarray(out["copy_probs"])
    assert (cp[~copied] == 0).all()
