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
