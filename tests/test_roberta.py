"""RoBERTa tower parity vs HuggingFace transformers (randomly initialized —
no downloads; SURVEY.md §4 invariant 4: converted towers must match torch
activations on fixed inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tell_tpu.models.backbones import (RobertaConfig, convert_hf_roberta,
                                       init_roberta, roberta_encode)

SMALL = RobertaConfig(vocab_size=120, dim=32, num_layers=3, num_heads=4,
                      ffn_dim=64, max_positions=40)


def make_hf_model():
    transformers = pytest.importorskip("transformers")
    import torch
    torch.manual_seed(0)
    hf_cfg = transformers.RobertaConfig(
        vocab_size=SMALL.vocab_size, hidden_size=SMALL.dim,
        num_hidden_layers=SMALL.num_layers,
        num_attention_heads=SMALL.num_heads,
        intermediate_size=SMALL.ffn_dim,
        max_position_embeddings=SMALL.max_positions,
        pad_token_id=1, type_vocab_size=1, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5)  # roberta-large's published eps
    return transformers.RobertaModel(hf_cfg).eval()


def test_activation_parity_with_hf():
    import torch
    model = make_hf_model()
    params = convert_hf_roberta(model.state_dict(), SMALL)

    ids = np.array([[0, 9, 57, 23, 88, 2, 1, 1],
                    [0, 44, 101, 5, 6, 7, 8, 2]])
    with torch.no_grad():
        out = model(torch.tensor(ids),
                    attention_mask=torch.tensor(ids != 1),
                    output_hidden_states=True)
    theirs = np.stack([h.numpy() for h in out.hidden_states], axis=2)

    ours = roberta_encode(params, SMALL, jnp.asarray(ids),
                          return_all_hiddens=True)
    assert ours.shape == theirs.shape  # [B, S, L+1, D]
    # padding rows diverge (HF still writes garbage there); compare non-pad
    mask = (ids != 1)[:, :, None, None]
    diff = np.abs(np.asarray(ours) - theirs) * mask
    assert diff.max() < 2e-4, diff.max()


def test_all_hiddens_shape_and_final_consistency():
    params = init_roberta(jax.random.PRNGKey(0), SMALL)
    ids = jnp.array([[0, 5, 6, 2, 1, 1]])
    allh = roberta_encode(params, SMALL, ids, return_all_hiddens=True)
    final = roberta_encode(params, SMALL, ids, return_all_hiddens=False)
    assert allh.shape == (1, 6, SMALL.num_layers + 1, SMALL.dim)
    np.testing.assert_allclose(np.asarray(allh[:, :, -1]), np.asarray(final),
                               atol=1e-6)


def test_windowed_encode_matches_per_window():
    """roberta_encode_windowed == per-window encode re-concatenated; and a
    short sequence passes straight through to the plain encoder."""
    from tell_tpu.models.backbones.roberta import roberta_encode_windowed
    params = init_roberta(jax.random.PRNGKey(0), SMALL)
    W = SMALL.max_positions - 2  # 38
    B, S = 2, 3 * W - 7          # ragged final window
    rng = np.random.RandomState(0)
    ids = rng.randint(4, SMALL.vocab_size, size=(B, S)).astype(np.int32)
    ids[0, -15:] = 1  # trailing pad inside the last window
    ids = jnp.asarray(ids)

    out = roberta_encode_windowed(params, SMALL, ids)
    assert out.shape[:2] == (B, S)
    # manual reference: encode each 38-token window independently
    pieces = []
    for s0 in range(0, S, W):
        chunk = ids[:, s0:s0 + W]
        if chunk.shape[1] < W:
            chunk = jnp.pad(chunk, ((0, 0), (0, W - chunk.shape[1])),
                            constant_values=SMALL.pad_id)
        pieces.append(roberta_encode(params, SMALL, chunk))
    ref = jnp.concatenate(pieces, axis=1)[:, :S]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    short = ids[:, :W]
    np.testing.assert_allclose(
        np.asarray(roberta_encode_windowed(params, SMALL, short)),
        np.asarray(roberta_encode(params, SMALL, short)))


def test_captioner_encode_contexts_windowed_long_article():
    """A long-article config (article max_len > position table) encodes via
    windows inside encode_contexts and decodes end-to-end."""
    from tell_tpu.config import small_test_config, ContextSpec
    import dataclasses
    from tell_tpu.models.captioner import (encode_contexts, generate,
                                           init_captioner)
    cfg = small_test_config()
    # stretch the article context past the tiny tower's position table
    # article kv_dim must match the tower width; stretch its max_len past
    # the tiny tower's position table
    long_contexts = tuple(
        dataclasses.replace(c, kv_dim=SMALL.dim,
                            max_len=3 * (SMALL.max_positions - 2) - 5)
        if c.name == "article" else c for c in cfg.decoder.contexts)
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder,
                                         contexts=long_contexts),
        num_bert_layers=SMALL.num_layers + 1, gen_len=4)
    S = cfg.decoder.context("article").max_len
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(1), SMALL),
              "roberta_cfg": SMALL}
    rng = np.random.RandomState(1)
    ids = rng.randint(4, SMALL.vocab_size, size=(2, S)).astype(np.int32)
    ids[:, -30:] = 1
    batch = {"context_ids": jnp.asarray(ids)}
    key_of = {"image": "image_grid", "faces": "face_embeds",
              "obj": "obj_embeds"}
    for spec in cfg.decoder.contexts:
        if spec.name == "article":
            continue
        batch[key_of[spec.name]] = jnp.zeros(
            (2, spec.max_len, spec.kv_dim))
    enc = encode_contexts(frozen, cfg, batch)
    key = "article_hiddens" if cfg.weigh_bert else "article"
    assert enc[key].shape[1] == S
    out = generate(params, cfg, enc)
    assert out["token_ids"].shape == (2, cfg.gen_len + 1)
