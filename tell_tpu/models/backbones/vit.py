"""ViT-L image encoder (frozen tower), JAX-native.

The stretch image tower (BASELINE.json configs[4]): a ViT-Large patch
encoder that replaces the ResNet-152 7x7 grid as the "image" context of
the multi-context decoder. Where the reference's image features are a
CNN grid (/root/reference/tell/models/resnet.py:92-117 -> [B, 49, 2048]),
this tower emits [B, 1 + (224/P)^2, D] patch tokens (CLS + grid), which
plug into the same ContextSpec("image", dim, n_tokens) slot.

TPU-first design notes:
* patchify = one reshape + one [P*P*3 -> D] matmul (MXU), not a conv —
  XLA lowers the conv the same way, but the explicit form keeps the
  layout NHWC-native and avoids any conv dimension-number pitfalls;
* pre-LN blocks, exact (erf) GELU, fp32 LayerNorm in bf16 compute —
  the same numerics conventions as backbones/roberta.py;
* no pooling head: the captioner consumes the full token grid (its
  cross-attention decides what to look at), CLS included.

`convert_hf_vit` maps a HuggingFace ViTModel state dict; activation
parity vs transformers is tested in tests/test_vit.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    ln_eps: float = 1e-12

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return 1 + self.grid * self.grid

    @staticmethod
    def large() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        """Smoke-test tower; feature dim stays 1024 so decoder configs
        built for ViT-L are unchanged."""
        return ViTConfig(image_size=32, patch_size=16, dim=1024,
                         num_layers=2, num_heads=16, ffn_dim=1024)



# static pytree leaf: ViTConfig rides inside jitted args (e.g. the frozen-towers
# dict passed to the train step at call time) without becoming a traced value
jax.tree_util.register_static(ViTConfig)

def _dense(rng, din, dout):
    return {"w": jax.random.normal(rng, (din, dout), jnp.float32) * 0.02,
            "b": jnp.zeros((dout,), jnp.float32)}


def _ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_vit(rng: jax.Array, cfg: ViTConfig) -> dict:
    ks = iter(jax.random.split(rng, 4 + 6 * cfg.num_layers))
    P = cfg.patch_size
    params = {
        "patch_embed": _dense(next(ks), P * P * 3, cfg.dim),
        "cls_token": jnp.zeros((cfg.dim,), jnp.float32),
        "pos_embed": jax.random.normal(
            next(ks), (cfg.num_tokens, cfg.dim), jnp.float32) * 0.02,
        "layers": [],
        "final_ln": _ln(cfg.dim),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln1": _ln(cfg.dim),
            "q": _dense(next(ks), cfg.dim, cfg.dim),
            "k": _dense(next(ks), cfg.dim, cfg.dim),
            "v": _dense(next(ks), cfg.dim, cfg.dim),
            "attn_out": _dense(next(ks), cfg.dim, cfg.dim),
            "ln2": _ln(cfg.dim),
            "fc1": _dense(next(ks), cfg.dim, cfg.ffn_dim),
            "fc2": _dense(next(ks), cfg.ffn_dim, cfg.dim),
        })
    return params


def _apply_ln(p, x, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["scale"] + p["bias"]).astype(x.dtype)


def _lin(p, x):
    return (jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
            + p["b"]).astype(x.dtype)


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """images: [B, H, W, 3] NHWC -> [B, (H/P)*(W/P), P*P*3].

    Row-major within a patch, channels minor — matches the memory order
    of a torch Conv2d(3, D, P, stride=P) applied to NCHW after the weight
    permutation done in convert_hf_vit.
    """
    B, H, W, C = images.shape
    g_h, g_w = H // patch, W // patch
    x = images.reshape(B, g_h, patch, g_w, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, P, P, C]
    return x.reshape(B, g_h * g_w, patch * patch * C)


def vit_encode(params: dict, cfg: ViTConfig, images: jax.Array) -> jax.Array:
    """images: [B, H, W, 3] (normalized) -> [B, 1+grid^2, D] patch tokens."""
    B = images.shape[0]
    x = _lin(params["patch_embed"], patchify(images, cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (B, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]

    H = cfg.num_heads
    hd = cfg.dim // H
    S = x.shape[1]
    for lp in params["layers"]:
        h = _apply_ln(lp["ln1"], x, cfg.ln_eps)
        q = _lin(lp["q"], h).reshape(B, S, H, hd)
        k = _lin(lp["k"], h).reshape(B, S, H, hd)
        v = _lin(lp["v"], h).reshape(B, S, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhts,bshd->bthd", probs, v,
                       preferred_element_type=jnp.float32)
        o = _lin(lp["attn_out"], o.reshape(B, S, cfg.dim).astype(x.dtype))
        x = x + o
        h = _apply_ln(lp["ln2"], x, cfg.ln_eps)
        h = jax.nn.gelu(_lin(lp["fc1"], h).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + _lin(lp["fc2"], h)
    return _apply_ln(params["final_ln"], x, cfg.ln_eps)


def convert_hf_vit(state_dict: dict, cfg: ViTConfig) -> dict:
    """Map a HuggingFace ViTModel state dict to our pytree.

    Works with either bare (ViTModel) or `vit.`-prefixed
    (ViTForImageClassification) key names.
    """
    def get(name):
        for key in (name, "vit." + name):
            if key in state_dict:
                t = state_dict[key]
                return jnp.asarray(np.asarray(getattr(t, "cpu", lambda: t)()))
        raise KeyError(name)

    def dense(name):
        return {"w": get(name + ".weight").T, "b": get(name + ".bias")}

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    # Conv2d weight [D, 3, P, P] -> [P*P*3, D] matching patchify's
    # (row, col, channel) flattening order.
    pw = get("embeddings.patch_embeddings.projection.weight")
    D = pw.shape[0]
    pw = pw.transpose(2, 3, 1, 0).reshape(-1, D)
    params = {
        "patch_embed": {
            "w": pw,
            "b": get("embeddings.patch_embeddings.projection.bias")},
        "cls_token": get("embeddings.cls_token").reshape(-1),
        "pos_embed": get("embeddings.position_embeddings")[0],
        "layers": [],
        "final_ln": ln("layernorm"),
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append({
            "ln1": ln(pre + "layernorm_before"),
            "q": dense(pre + "attention.attention.query"),
            "k": dense(pre + "attention.attention.key"),
            "v": dense(pre + "attention.attention.value"),
            "attn_out": dense(pre + "attention.output.dense"),
            "ln2": ln(pre + "layernorm_after"),
            "fc1": dense(pre + "intermediate.dense"),
            "fc2": dense(pre + "output.dense"),
        })
    return params
