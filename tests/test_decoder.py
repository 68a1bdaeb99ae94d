"""Decoder tests — SURVEY.md §4 invariant 1: step-decode(scan) must equal the
full teacher-forced forward (the reference's incremental-state tests,
generalized to the whole decoder stack)."""
import jax
import jax.numpy as jnp
import numpy as np

from tell_tpu.config import small_test_config
from tell_tpu.models import (
    decoder_forward, decoder_log_probs, decoder_step, init_captioner,
    init_decode_state, init_decoder,
)
from tell_tpu.models.captioner import build_contexts, captioner_loss, generate

CFG = small_test_config()
DCFG = CFG.decoder


def make_batch(rng, B=2, T=10):
    ks = jax.random.split(rng, 8)
    S = DCFG.context("article").max_len
    face_embeds = jax.random.normal(ks[3], (B, 4, 16))
    face_embeds = face_embeds.at[:, 2:].set(jnp.nan)  # 2 absent faces
    caption = jax.random.randint(ks[5], (B, T), 4, DCFG.vocab_size)
    caption = caption.at[:, 0].set(DCFG.bos_id)
    caption = caption.at[:, -2].set(DCFG.eos_id)
    caption = caption.at[:, -1].set(DCFG.pad_id)
    return {
        "image_grid": jax.random.normal(ks[0], (B, 9, 32)),
        "article_hiddens": jax.random.normal(ks[1], (B, S, 3, 24)),
        "article_mask": jnp.zeros((B, S), bool).at[:, 12:].set(True),
        "face_embeds": face_embeds,
        "obj_embeds": jax.random.normal(ks[4], (B, 8, 32)),
        "caption_ids": caption,
    }


def test_step_decode_matches_full_forward():
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1))
    contexts = build_contexts(params, CFG, batch)
    ids = batch["caption_ids"][:, :-1]
    full, _ = decoder_forward(params["decoder"], DCFG, ids, contexts)

    state = init_decode_state(params["decoder"], DCFG, contexts,
                              batch=ids.shape[0])

    def step(state, toks):
        feats, state, _ = decoder_step(params["decoder"], DCFG, toks, state)
        return state, feats

    _, stepped = jax.lax.scan(step, state, ids.T)
    stepped = jnp.swapaxes(stepped, 0, 1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(stepped),
                               atol=2e-4)

    # and the resulting log-prob distributions agree
    lp_full = decoder_log_probs(params["decoder"], DCFG, full)
    lp_step = decoder_log_probs(params["decoder"], DCFG, stepped)
    np.testing.assert_allclose(np.asarray(lp_full), np.asarray(lp_step),
                               atol=2e-3)


def test_loss_is_finite_and_differentiable():
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1))

    def f(p):
        loss, aux = captioner_loss(p, CFG, batch)
        return loss
    loss, grads = jax.value_and_grad(f)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # frozen-tower design: bert_weight gets a gradient (it mixes the hiddens)
    assert np.abs(np.asarray(grads["bert_weight"])).sum() > 0


def test_loss_decreases_with_sgd():
    params = init_captioner(jax.random.PRNGKey(0), CFG)
    batch = make_batch(jax.random.PRNGKey(1))

    @jax.jit
    def step(p):
        (loss, _), g = jax.value_and_grad(
            lambda q: captioner_loss(q, CFG, batch), has_aux=True)(p)
        p = jax.tree.map(lambda a, b: a - 0.03 * b, p, g)
        return p, loss

    losses = []
    for _ in range(12):
        params, loss = step(params)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.2, losses


def test_generate_greedy_semantics():
    cfg = small_test_config()
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1))
    import dataclasses
    cfg = dataclasses.replace(cfg, gen_len=12)
    out = generate(params, cfg, batch, rng=jax.random.PRNGKey(2))
    toks = np.asarray(out["token_ids"])
    B = toks.shape[0]
    assert toks.shape == (B, 13)
    assert (toks[:, 0] == cfg.decoder.bos_id).all()
    # greedy is deterministic
    out2 = generate(params, cfg, batch, rng=jax.random.PRNGKey(99))
    np.testing.assert_array_equal(toks, np.asarray(out2["token_ids"]))
    # after an EOS, everything is pad
    for b in range(B):
        row = toks[b, 1:]
        eos_pos = np.where(row == cfg.decoder.eos_id)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == cfg.decoder.pad_id).all()


def test_generate_matches_manual_argmax_rollout():
    """Greedy scan rollout == python loop over decoder_step + argmax."""
    import dataclasses
    cfg = dataclasses.replace(small_test_config(), gen_len=6)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1))
    out = generate(params, cfg, batch)

    contexts = build_contexts(params, cfg, batch)
    B = batch["caption_ids"].shape[0]
    state = init_decode_state(params["decoder"], cfg.decoder, contexts, B)
    toks = jnp.full((B,), cfg.decoder.bos_id, jnp.int32)
    finished = jnp.zeros((B,), bool)
    seq = [toks]
    for _ in range(6):
        feats, state, _ = decoder_step(params["decoder"], cfg.decoder, toks,
                                       state)
        lp = decoder_log_probs(params["decoder"], cfg.decoder, feats)
        nxt = jnp.argmax(lp, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, cfg.decoder.pad_id, nxt)
        finished = finished | (nxt == cfg.decoder.eos_id)
        seq.append(nxt)
        toks = nxt
    manual = np.stack([np.asarray(t) for t in seq], axis=1)
    np.testing.assert_array_equal(np.asarray(out["token_ids"]), manual)


def test_step_decode_matches_full_forward_with_grouped_contexts():
    """Step==full parity must hold for whatever chain grouping
    context_groups picks (it is a pure perf policy), including long
    article contexts whose features are shorter than max_len."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tell_tpu.config import small_test_config, ContextSpec
    from tell_tpu.models.decoder import (
        context_groups, decoder_forward, decoder_step, init_decoder,
        init_decode_state)

    cfg = small_test_config().decoder
    ctxs = tuple(
        dataclasses.replace(c, max_len=300) if c.name == "article" else c
        for c in cfg.contexts)
    cfg = dataclasses.replace(cfg, contexts=ctxs)
    groups = context_groups(cfg)
    assert sorted(i for g in groups for i in g) == [0, 1, 2, 3]

    params = init_decoder(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B, T = 2, 7
    contexts = {}
    for i, spec in enumerate(cfg.contexts):
        S = 10 if spec.name == "article" else spec.max_len
        feats = jax.random.normal(ks[i], (B, S, spec.kv_dim))
        mask = jnp.zeros((B, S), bool).at[:, S - 2:].set(
            spec.name == "article")
        contexts[spec.name] = (feats, mask)
    ids = jax.random.randint(ks[4], (B, T), 4, cfg.vocab_size)
    ids = ids.at[:, 0].set(cfg.bos_id)

    full, _ = decoder_forward(params, cfg, ids, contexts)
    state = init_decode_state(params, cfg, contexts, B)
    outs = []
    for t in range(T):
        feats, state, _ = decoder_step(params, cfg, ids[:, t], state)
        outs.append(feats)
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc),
                               rtol=2e-4, atol=2e-4)


def test_int8_kv_cache_close_to_fp(monkeypatch):
    """TELL_TPU_KV8=1: decode outputs stay within quantization tolerance of
    the fp path (per-row symmetric int8, scales factored out exactly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
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
        contexts[spec.name] = (feats, jnp.zeros((B, spec.max_len), bool))
    toks = jnp.array([5, 9], jnp.int32)
    monkeypatch.delenv("TELL_TPU_KV8", raising=False)
    state = init_decode_state(params, cfg, contexts, B)
    ref, _, _ = decoder_step(params, cfg, toks, state)
    monkeypatch.setenv("TELL_TPU_KV8", "1")
    state8 = init_decode_state(params, cfg, contexts, B)
    assert state8["kv"][0][0]["k"].dtype == jnp.int8
    out, _, _ = decoder_step(params, cfg, toks, state8)
    err = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert err < 0.05, err


def test_greedy_generation_deterministic():
    """SURVEY.md §4 invariant 6: greedy decode is run-to-run deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tell_tpu.config import small_test_config
    from tell_tpu.models import init_captioner
    from tell_tpu.models.captioner import generate
    import dataclasses
    cfg = dataclasses.replace(small_test_config(), gen_len=10)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    B = 2
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 9, 32)),
        "article": jax.random.normal(ks[1], (B, 16, 24)),
        "article_mask": jnp.zeros((B, 16), bool),
        "face_embeds": jax.random.normal(ks[2], (B, 4, 16)),
        "obj_embeds": jax.random.normal(ks[3], (B, 8, 32)),
    }
    a = generate(params, cfg, batch, rng=jax.random.PRNGKey(7))
    b = generate(params, cfg, batch, rng=jax.random.PRNGKey(99))
    # greedy (sampling_topk=1): the rng must not influence the output
    np.testing.assert_array_equal(np.asarray(a["token_ids"]),
                                  np.asarray(b["token_ids"]))


def test_step_decode_matches_full_forward_learned_positional():
    """cfg.positional == "learned" swaps the static sinusoidal table for a
    trainable one (params["pos_embed"]); the step≡full invariant and loss
    differentiability must hold unchanged."""
    cfg = small_test_config(positional="learned")
    dcfg = cfg.decoder
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    assert "pos_embed" in params["decoder"]
    batch = make_batch(jax.random.PRNGKey(1))
    contexts = build_contexts(params, cfg, batch)
    ids = batch["caption_ids"][:, :-1]
    full, _ = decoder_forward(params["decoder"], dcfg, ids, contexts)
    state = init_decode_state(params["decoder"], dcfg, contexts,
                              batch=ids.shape[0])

    def step(state, toks):
        feats, state, _ = decoder_step(params["decoder"], dcfg, toks, state)
        return state, feats

    _, stepped = jax.lax.scan(step, state, ids.T)
    np.testing.assert_allclose(np.asarray(full),
                               np.asarray(jnp.swapaxes(stepped, 0, 1)),
                               atol=2e-4)

    # the table trains: its gradient under the caption loss is nonzero
    def loss_fn(p):
        return captioner_loss(p, cfg, batch)[0]

    g = jax.grad(loss_fn)(params)
    gt = np.asarray(g["decoder"]["pos_embed"]["table"])
    assert np.isfinite(gt).all() and np.abs(gt).max() > 0


def test_int8_kv_decode_parity_gate(monkeypatch):
    """The gate behind the int8-KV default: whole greedy captions decoded
    with the int8 cache must track the fp path token-for-token (random
    near-tie logits may flip a tail token, so >= 95% agreement with
    identical prefixes of >= 4 tokens is required; scores stay close)."""
    import dataclasses

    cfg = dataclasses.replace(small_test_config(), gen_len=12)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    batch = make_batch(jax.random.PRNGKey(1))
    dec_batch = {k: v for k, v in batch.items() if k != "caption_ids"}

    monkeypatch.setenv("TELL_TPU_KV8", "0")
    ref = generate(params, cfg, dec_batch, early_stop=False)
    monkeypatch.setenv("TELL_TPU_KV8", "1")
    q = generate(params, cfg, dec_batch, early_stop=False)

    t_ref = np.asarray(ref["token_ids"])
    t_q = np.asarray(q["token_ids"])
    agree = (t_ref == t_q).mean()
    assert agree >= 0.95, f"int8-KV token agreement {agree:.3f}"
    assert (t_ref[:, :5] == t_q[:, :5]).all()
    lp_ref = np.asarray(ref["log_probs"]).sum(-1)
    lp_q = np.asarray(q["log_probs"]).sum(-1)
    np.testing.assert_allclose(lp_q, lp_ref, rtol=0.05, atol=0.5)


def test_int4_kv_decode_parity(monkeypatch):
    """Documentation gate for the OPT-IN int4 packed K/V cache
    (TELL_TPU_KV4=1): at the production head dim (hd=64) whole greedy
    captions must track the fp path closely (measured 0.88 agreement with
    identical >=4-token prefixes on random weights; random-weight logits
    are near-uniform, so this is a floor — trained models separate logits
    further). At tiny head dims (hd=16, the default test config) 4-bit
    rounding is much coarser (~0.5 agreement) — which is exactly why int4
    stays opt-in while int8 is the TPU default."""
    import dataclasses

    cfg = small_test_config(embed_dim=256, conv_dim=256, ffn_dim=512,
                            num_heads=4)
    cfg = dataclasses.replace(cfg, gen_len=12)
    assert cfg.decoder.embed_dim // cfg.decoder.num_heads == 64
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    B = 4
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    dcfg = cfg.decoder
    S = dcfg.context("article").max_len
    batch = {
        "image_grid": jax.random.normal(ks[0], (B, 9, 32)),
        "article_hiddens": jax.random.normal(
            ks[1], (B, S, 3, 24)),
        "article_mask": jnp.zeros((B, S), bool),
        "face_embeds": jax.random.normal(ks[2], (B, 4, 16)),
        "obj_embeds": jax.random.normal(ks[3], (B, 8, 32)),
    }

    monkeypatch.setenv("TELL_TPU_KV8", "0")
    ref = generate(params, cfg, batch, early_stop=False)
    monkeypatch.setenv("TELL_TPU_KV4", "1")
    q4 = generate(params, cfg, batch, early_stop=False)

    t_ref = np.asarray(ref["token_ids"])
    t_q = np.asarray(q4["token_ids"])
    agree = (t_ref == t_q).mean()
    assert agree >= 0.8, f"int4-KV token agreement {agree:.3f}"
    assert (t_ref[:, :3] == t_q[:, :3]).all()
    lp_ref = np.asarray(ref["log_probs"]).sum(-1)
    lp_q = np.asarray(q4["log_probs"]).sum(-1)
    np.testing.assert_allclose(lp_q, lp_ref, rtol=0.15, atol=1.0)
