"""Modern decoder-only LM (models/llm_decoder.py): the SURVEY.md §4
invariants applied to the stretch model family — step-decode ≡ full
teacher-forced forward, chunked tied-softmax ≡ dense, beam-1 ≡ greedy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.random as jr

from tell_tpu.config import ContextSpec
from tell_tpu.models.llm_decoder import (
    LLMConfig, init_llm_decoder, init_llm_decode_state, llm_beam_search,
    llm_decoder_step, llm_forward, llm_generate, llm_loss, llm_xent,
    tied_log_probs, _build_contexts,
)

CFG = LLMConfig(
    vocab_size=211, dim=32, num_layers=2, num_heads=4, ffn_dim=48,
    dropout=0.0, attention_dropout=0.0, max_target_positions=32,
    gen_len=7, loss_vocab_chunk=64,
    contexts=(
        ContextSpec("image", 16, 5),
        ContextSpec("article", 12, 9),
        ContextSpec("faces", 8, 3),
        ContextSpec("obj", 16, 4),
    ))


def make_batch(rng, B=3):
    ks = jr.split(rng, 6)
    face = jr.normal(ks[2], (B, 3, 8))
    face = face.at[:, -1].set(jnp.nan)  # absent face row
    caps = jnp.array([[0, 7, 9, 13, 2, 1, 1],
                      [0, 44, 101, 5, 6, 7, 2],
                      [0, 3, 2, 1, 1, 1, 1]])
    caps = jnp.tile(caps, (-(-B // 3), 1))[:B]
    lens = jnp.array([9, 6, 4] * (-(-B // 3)))[:B]
    return {
        "image_grid": jr.normal(ks[0], (B, 5, 16)),
        "article": jr.normal(ks[1], (B, 9, 12)),
        "article_mask": jnp.arange(9)[None] >= lens[:, None],
        "face_embeds": face,
        "obj_embeds": jr.normal(ks[3], (B, 4, 16)),
        "caption_ids": caps,
    }


@pytest.fixture(scope="module")
def setup():
    params = init_llm_decoder(jr.PRNGKey(0), CFG)
    batch = make_batch(jr.PRNGKey(1))
    return params, batch


def test_loss_finite_and_chunking_exact(setup):
    params, batch = setup
    loss, aux = llm_loss(params, CFG, batch)
    assert np.isfinite(float(loss))
    assert int(aux["sample_size"]) == 12  # non-pad target tokens

    # chunked online-softmax xent == dense log_softmax gather
    feats = jr.normal(jr.PRNGKey(2), (10, CFG.dim))
    targets = jnp.array([0, 5, 1, 7, 200, 13, 1, 2, 99, 210])
    s, n = llm_xent(params, CFG, feats, targets)
    lp = tied_log_probs(params, CFG, feats)
    keep = targets != CFG.pad_id
    dense = -jnp.take_along_axis(lp, targets[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(float(s), float(jnp.sum(dense * keep)),
                               rtol=1e-5)
    assert int(n) == int(keep.sum())


def test_step_decode_matches_full_forward(setup):
    """Teacher-force a caption through the scan step; features must match
    the full causal forward exactly (the incremental-state invariant)."""
    params, batch = setup
    contexts = _build_contexts(params, CFG, batch)
    ids = batch["caption_ids"]
    B, T = ids.shape
    full, _ = llm_forward(params, CFG, ids, contexts)

    state = init_llm_decode_state(params, CFG, contexts, B)
    outs = []
    for t in range(T):
        feats, state, _ = llm_decoder_step(params, CFG, ids[:, t], state)
        outs.append(feats)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5)


def test_greedy_matches_argmax_of_forward(setup):
    """First generated token == argmax of the full forward's next-token
    distribution at <s>."""
    params, batch = setup
    out = llm_generate(params, CFG, batch)
    assert out["token_ids"].shape == (3, CFG.gen_len + 1)

    contexts = _build_contexts(params, CFG, batch)
    bos = jnp.full((3, 1), CFG.bos_id, jnp.int32)
    feats, _ = llm_forward(params, CFG, bos, contexts)
    lp = tied_log_probs(params, CFG, feats[:, -1])
    np.testing.assert_array_equal(np.asarray(out["token_ids"][:, 1]),
                                  np.asarray(jnp.argmax(lp, axis=-1)))


def test_beam1_matches_greedy(setup):
    params, batch = setup
    greedy = llm_generate(params, CFG, batch)
    beam = llm_beam_search(params, CFG, batch, beam_size=1)
    np.testing.assert_array_equal(np.asarray(beam["token_ids"][:, 0]),
                                  np.asarray(greedy["token_ids"]))


def test_beam_scores_sorted_and_improve_on_greedy(setup):
    params, batch = setup
    beam = llm_beam_search(params, CFG, batch, beam_size=4)
    scores = np.asarray(beam["scores"])
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    greedy = llm_generate(params, CFG, batch)
    greedy_total = np.asarray(greedy["log_probs"]).sum(-1)
    assert (scores[:, 0] >= greedy_total - 1e-4).all()


def test_grads_flow(setup):
    params, batch = setup
    g = jax.grad(lambda p: llm_loss(p, CFG, batch)[0])(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_gqa_step_decode_matches_full_forward():
    """Grouped-query attention (num_kv_heads < num_heads): the KV cache
    shrinks but step-decode must still equal the full causal forward."""
    import dataclasses
    cfg = dataclasses.replace(CFG, num_kv_heads=2)
    params = init_llm_decoder(jr.PRNGKey(3), cfg)
    batch = make_batch(jr.PRNGKey(4))
    contexts = _build_contexts(params, cfg, batch)
    ids = batch["caption_ids"]
    B, T = ids.shape
    full, _ = llm_forward(params, cfg, ids, contexts)

    state = init_llm_decode_state(params, cfg, contexts, B)
    assert state["self_kv"][0]["k"].shape[2] == 2  # KV heads, not H
    outs = []
    for t in range(T):
        feats, state, _ = llm_decoder_step(params, cfg, ids[:, t], state)
        outs.append(feats)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5)


def test_kv8_decode_close_to_fp(setup, monkeypatch):
    """TELL_TPU_KV8=1 must flow through the shared stacked-attention core
    (scales applied), yielding ~quantization-error outputs, not garbage
    (regression: the modern cross block once dropped the scales)."""
    params, batch = setup
    contexts = _build_contexts(params, CFG, batch)
    toks = jnp.array([5, 9, 11], jnp.int32)

    monkeypatch.delenv("TELL_TPU_KV8", raising=False)
    state = init_llm_decode_state(params, CFG, contexts, 3)
    fp, _, _ = llm_decoder_step(params, CFG, toks, state)

    monkeypatch.setenv("TELL_TPU_KV8", "1")
    state8 = init_llm_decode_state(params, CFG, contexts, 3)
    assert state8["kv"][0][0]["k"].dtype == jnp.int8
    q8, _, _ = llm_decoder_step(params, CFG, toks, state8)

    err = float(jnp.max(jnp.abs(q8 - fp)))
    scale = float(jnp.max(jnp.abs(fp)))
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_decoder_step_per_row_positions_match_scalar(setup):
    """_self_attn_step's per-row path ([R] step array — the continuous
    engine's per-slot counters) must equal the scalar path when every row
    sits at the same position: same features, same cache contents."""
    params, batch = setup
    contexts = _build_contexts(params, CFG, batch)
    B = batch["image_grid"].shape[0]
    state = init_llm_decode_state(params, CFG, contexts, B)
    toks = jnp.array([7, 44, 3] * (-(-B // 3)))[:B]

    s_scalar = state
    s_rows = {**state, "step": jnp.zeros((B,), jnp.int32)}
    for t in range(3):
        f1, s_scalar, _ = llm_decoder_step(params, CFG, toks, s_scalar)
        f2, s_rows, _ = llm_decoder_step(params, CFG, toks, s_rows)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                                   rtol=1e-6, atol=1e-6)
        for c1, c2 in zip(s_scalar["self_kv"], s_rows["self_kv"]):
            np.testing.assert_allclose(np.asarray(c1["k"]),
                                       np.asarray(c2["k"]), atol=1e-6)
            np.testing.assert_allclose(np.asarray(c1["v"]),
                                       np.asarray(c2["v"]), atol=1e-6)


def test_llm_generate_attention_maps(setup):
    """need_weights: per-layer per-context head-averaged maps in the same
    payload format as captioner.generate (each modality is its own softmax,
    so every step's map sums to 1 over that context's keys+bias/zero)."""
    params, batch = setup
    out = llm_generate(params, CFG, batch, need_weights=True)
    attns = out["attns"]
    assert len(attns) == CFG.num_layers
    B = batch["image_grid"].shape[0]
    for layer in attns:
        assert set(layer) == {c.name for c in CFG.contexts}
        for name, a in layer.items():
            a = np.asarray(a)
            S_m = CFG.context(name).max_len + 2  # bias + zero columns
            assert a.shape == (CFG.gen_len, B, 1, S_m)
            np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-3)
    # the no-weights fast path still returns no attns key
    assert "attns" not in llm_generate(params, CFG, batch)
