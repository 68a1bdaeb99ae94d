"""ViT tower parity vs HuggingFace transformers (randomly initialized —
no downloads; SURVEY.md §4 invariant 4: converted towers must match torch
activations on fixed inputs)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tell_tpu.models.backbones.vit import (ViTConfig, convert_hf_vit,
                                           init_vit, patchify, vit_encode)

SMALL = ViTConfig(image_size=32, patch_size=8, dim=48, num_layers=3,
                  num_heads=4, ffn_dim=96)


def make_hf_model():
    transformers = pytest.importorskip("transformers")
    import torch
    torch.manual_seed(0)
    hf_cfg = transformers.ViTConfig(
        image_size=SMALL.image_size, patch_size=SMALL.patch_size,
        hidden_size=SMALL.dim, num_hidden_layers=SMALL.num_layers,
        num_attention_heads=SMALL.num_heads,
        intermediate_size=SMALL.ffn_dim, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=SMALL.ln_eps)
    return transformers.ViTModel(hf_cfg, add_pooling_layer=False).eval()


def test_activation_parity_with_hf():
    import torch
    model = make_hf_model()
    params = convert_hf_vit(model.state_dict(), SMALL)

    rng = np.random.RandomState(0)
    imgs = rng.randn(2, SMALL.image_size, SMALL.image_size, 3).astype(
        np.float32)
    with torch.no_grad():
        theirs = model(
            torch.tensor(imgs.transpose(0, 3, 1, 2))).last_hidden_state
    ours = vit_encode(params, SMALL, jnp.asarray(imgs))
    assert ours.shape == tuple(theirs.shape)  # [B, 1+grid^2, D]
    assert np.abs(np.asarray(ours) - theirs.numpy()).max() < 2e-4


def test_patchify_order_matches_conv():
    """patchify + matmul == strided Conv2d with the permuted weight."""
    import torch
    rng = np.random.RandomState(1)
    P, D = 4, 6
    imgs = rng.randn(1, 8, 8, 3).astype(np.float32)
    w = rng.randn(D, 3, P, P).astype(np.float32)
    conv = torch.nn.functional.conv2d(
        torch.tensor(imgs.transpose(0, 3, 1, 2)), torch.tensor(w), stride=P)
    conv = conv.flatten(2).transpose(1, 2).numpy()  # [B, gh*gw, D]
    wt = w.transpose(2, 3, 1, 0).reshape(-1, D)
    ours = patchify(jnp.asarray(imgs), P) @ jnp.asarray(wt)
    np.testing.assert_allclose(np.asarray(ours), conv, atol=1e-5)


def test_shapes_and_tiny_config():
    cfg = ViTConfig.tiny()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    out = vit_encode(params, cfg,
                     jnp.zeros((2, cfg.image_size, cfg.image_size, 3)))
    assert out.shape == (2, cfg.num_tokens, cfg.dim)
