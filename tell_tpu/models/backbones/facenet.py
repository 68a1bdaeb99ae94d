"""FaceNet face embedder (InceptionResnetV1), JAX-native, NHWC.

Replaces /root/reference/tell/facenet/inception_resnet_v1.py:184-348 (the
vendored facenet-pytorch model, vggface2 weights): 160x160 prewhitened face
crops -> L2-normalized 512-d embeddings, consumed as the `faces` context
(top 4 at serve time, tell/tasks/captioner.py:291-303; top 10 stored by the
dataset pipeline, scripts/detect_facenet_nytimes.py:83-92).

Same TPU conventions as resnet.py: NHWC, frozen BN folded into scale/bias at
conversion (eps 1e-3 here). `convert_facenet` maps facenet-pytorch state
dict naming.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FaceNetConfig:
    repeats: tuple[int, int, int] = (5, 10, 5)  # Block35 / Block17 / Block8
    bn_eps: float = 1e-3
    embed_dim: int = 512


def _conv(x, w, stride=1, padding=(0, 0)):
    ph, pw = padding
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(ph, ph), (pw, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _basic(p, x, stride=1, padding=(0, 0)):
    h = _conv(x, p["conv"], stride=stride, padding=padding)
    return jax.nn.relu(h * p["scale"] + p["bias"])


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), "VALID")


def _block35(p, x, scale=0.17):
    b0 = _basic(p["branch0"], x)
    b1 = _basic(p["branch1.1"], _basic(p["branch1.0"], x), padding=(1, 1))
    b2 = _basic(p["branch2.2"],
                _basic(p["branch2.1"], _basic(p["branch2.0"], x),
                       padding=(1, 1)), padding=(1, 1))
    out = jnp.concatenate([b0, b1, b2], axis=-1)
    out = _conv(out, p["conv2d"]["w"]) + p["conv2d"]["b"]
    return jax.nn.relu(out * scale + x)


def _block17(p, x, scale=0.10):
    b0 = _basic(p["branch0"], x)
    b1 = _basic(p["branch1.0"], x)
    b1 = _basic(p["branch1.1"], b1, padding=(0, 3))   # 1x7
    b1 = _basic(p["branch1.2"], b1, padding=(3, 0))   # 7x1
    out = jnp.concatenate([b0, b1], axis=-1)
    out = _conv(out, p["conv2d"]["w"]) + p["conv2d"]["b"]
    return jax.nn.relu(out * scale + x)


def _block8(p, x, scale=0.20, relu=True):
    b0 = _basic(p["branch0"], x)
    b1 = _basic(p["branch1.0"], x)
    b1 = _basic(p["branch1.1"], b1, padding=(0, 1))   # 1x3
    b1 = _basic(p["branch1.2"], b1, padding=(1, 0))   # 3x1
    out = jnp.concatenate([b0, b1], axis=-1)
    out = _conv(out, p["conv2d"]["w"]) + p["conv2d"]["b"]
    out = out * scale + x
    return jax.nn.relu(out) if relu else out


def _mixed6a(p, x):
    b0 = _basic(p["branch0"], x, stride=2)
    b1 = _basic(p["branch1.0"], x)
    b1 = _basic(p["branch1.1"], b1, padding=(1, 1))
    b1 = _basic(p["branch1.2"], b1, stride=2)
    return jnp.concatenate([b0, b1, _maxpool(x)], axis=-1)


def _mixed7a(p, x):
    b0 = _basic(p["branch0.1"], _basic(p["branch0.0"], x), stride=2)
    b1 = _basic(p["branch1.1"], _basic(p["branch1.0"], x), stride=2)
    b2 = _basic(p["branch2.0"], x)
    b2 = _basic(p["branch2.1"], b2, padding=(1, 1))
    b2 = _basic(p["branch2.2"], b2, stride=2)
    return jnp.concatenate([b0, b1, b2, _maxpool(x)], axis=-1)


def facenet_forward(params: dict, cfg: FaceNetConfig,
                    x: jax.Array) -> jax.Array:
    """x: [B, H, W, 3] prewhitened crops -> [B, 512] L2-normalized."""
    h = _basic(params["conv2d_1a"], x, stride=2)
    h = _basic(params["conv2d_2a"], h)
    h = _basic(params["conv2d_2b"], h, padding=(1, 1))
    h = _maxpool(h)
    h = _basic(params["conv2d_3b"], h)
    h = _basic(params["conv2d_4a"], h)
    h = _basic(params["conv2d_4b"], h, stride=2)
    for bp in params["repeat_1"]:
        h = _block35(bp, h)
    h = _mixed6a(params["mixed_6a"], h)
    for bp in params["repeat_2"]:
        h = _block17(bp, h)
    h = _mixed7a(params["mixed_7a"], h)
    for bp in params["repeat_3"]:
        h = _block8(bp, h)
    h = _block8(params["block8"], h, relu=False)
    h = jnp.mean(h, axis=(1, 2))  # adaptive avg pool to 1x1
    h = jnp.dot(h, params["last_linear"],
                preferred_element_type=jnp.float32)
    h = h * params["last_bn"]["scale"] + params["last_bn"]["bias"]
    norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True))
    return (h / jnp.maximum(norm, 1e-12)).astype(x.dtype)


def prewhiten(img: jax.Array) -> jax.Array:
    """facenet-pytorch fixed_image_standardization: (x*255 - 127.5)/128 for
    [0,1] inputs (the MTCNN extract_face post-processing)."""
    return (img * 255.0 - 127.5) / 128.0


def init_facenet(rng: jax.Array, cfg: FaceNetConfig | None = None) -> dict:
    """Random-init InceptionResnetV1 pytree at the vggface2 architecture
    shapes (inception_resnet_v1.py:184-348) — for throughput benchmarks
    and smoke runs without the converted weights; embedding quality is
    meaningless, compute cost is identical."""
    cfg = cfg or FaceNetConfig()
    key = [rng]

    def nk():
        key[0], k = jax.random.split(key[0])
        return k

    def basic(cin, cout, kh, kw=None):
        kw = kh if kw is None else kw
        fan = kh * kw * cin
        return {"conv": jax.random.normal(
                    nk(), (kh, kw, cin, cout), jnp.float32) / np.sqrt(fan),
                "scale": jnp.ones((cout,), jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32)}

    def plain(cin, cout):
        return {"w": jax.random.normal(nk(), (1, 1, cin, cout),
                                       jnp.float32) / np.sqrt(cin),
                "b": jnp.zeros((cout,), jnp.float32)}

    def block35():
        return {"branch0": basic(256, 32, 1),
                "branch1.0": basic(256, 32, 1), "branch1.1": basic(32, 32, 3),
                "branch2.0": basic(256, 32, 1), "branch2.1": basic(32, 32, 3),
                "branch2.2": basic(32, 32, 3), "conv2d": plain(96, 256)}

    def block17():
        return {"branch0": basic(896, 128, 1),
                "branch1.0": basic(896, 128, 1),
                "branch1.1": basic(128, 128, 1, 7),
                "branch1.2": basic(128, 128, 7, 1),
                "conv2d": plain(256, 896)}

    def block8():
        return {"branch0": basic(1792, 192, 1),
                "branch1.0": basic(1792, 192, 1),
                "branch1.1": basic(192, 192, 1, 3),
                "branch1.2": basic(192, 192, 3, 1),
                "conv2d": plain(384, 1792)}

    params = {"conv2d_1a": basic(3, 32, 3), "conv2d_2a": basic(32, 32, 3),
              "conv2d_2b": basic(32, 64, 3), "conv2d_3b": basic(64, 80, 1),
              "conv2d_4a": basic(80, 192, 3),
              "conv2d_4b": basic(192, 256, 3)}
    params["repeat_1"] = [block35() for _ in range(cfg.repeats[0])]
    params["mixed_6a"] = {"branch0": basic(256, 384, 3),
                          "branch1.0": basic(256, 192, 1),
                          "branch1.1": basic(192, 192, 3),
                          "branch1.2": basic(192, 256, 3)}
    params["repeat_2"] = [block17() for _ in range(cfg.repeats[1])]
    params["mixed_7a"] = {"branch0.0": basic(896, 256, 1),
                          "branch0.1": basic(256, 384, 3),
                          "branch1.0": basic(896, 256, 1),
                          "branch1.1": basic(256, 256, 3),
                          "branch2.0": basic(896, 256, 1),
                          "branch2.1": basic(256, 256, 3),
                          "branch2.2": basic(256, 256, 3)}
    params["repeat_3"] = [block8() for _ in range(cfg.repeats[2])]
    params["block8"] = block8()
    params["last_linear"] = jax.random.normal(
        nk(), (1792, cfg.embed_dim), jnp.float32) / np.sqrt(1792)
    params["last_bn"] = {"scale": jnp.ones((cfg.embed_dim,), jnp.float32),
                         "bias": jnp.zeros((cfg.embed_dim,), jnp.float32)}
    return params


def convert_facenet(state_dict: dict, cfg: FaceNetConfig) -> dict:
    """facenet-pytorch InceptionResnetV1 state_dict -> pytree (BN folded)."""
    def t(name):
        v = state_dict[name]
        return np.asarray(getattr(v, "cpu", lambda: v)())

    def basic(prefix):
        g, b = t(prefix + ".bn.weight"), t(prefix + ".bn.bias")
        mean = t(prefix + ".bn.running_mean")
        var = t(prefix + ".bn.running_var")
        scale = g / np.sqrt(var + cfg.bn_eps)
        return {"conv": jnp.asarray(
                    t(prefix + ".conv.weight").transpose(2, 3, 1, 0)),
                "scale": jnp.asarray(scale),
                "bias": jnp.asarray(b - mean * scale)}

    def plain(prefix):
        return {"w": jnp.asarray(t(prefix + ".weight").transpose(2, 3, 1, 0)),
                "b": jnp.asarray(t(prefix + ".bias"))}

    def block(prefix, branches):
        p = {name: basic(f"{prefix}.{name}") for name in branches}
        p["conv2d"] = plain(prefix + ".conv2d")
        return p

    b35 = ("branch0", "branch1.0", "branch1.1",
           "branch2.0", "branch2.1", "branch2.2")
    b17 = ("branch0", "branch1.0", "branch1.1", "branch1.2")
    b8 = b17

    params = {name: basic(name) for name in
              ("conv2d_1a", "conv2d_2a", "conv2d_2b", "conv2d_3b",
               "conv2d_4a", "conv2d_4b")}
    params["repeat_1"] = [block(f"repeat_1.{i}", b35)
                          for i in range(cfg.repeats[0])]
    params["mixed_6a"] = {n: basic(f"mixed_6a.{n}") for n in
                          ("branch0", "branch1.0", "branch1.1", "branch1.2")}
    params["repeat_2"] = [block(f"repeat_2.{i}", b17)
                          for i in range(cfg.repeats[1])]
    params["mixed_7a"] = {n: basic(f"mixed_7a.{n}") for n in
                          ("branch0.0", "branch0.1", "branch1.0", "branch1.1",
                           "branch2.0", "branch2.1", "branch2.2")}
    params["repeat_3"] = [block(f"repeat_3.{i}", b8)
                          for i in range(cfg.repeats[2])]
    params["block8"] = block("block8", b8)
    params["last_linear"] = jnp.asarray(t("last_linear.weight").T)
    g, b = t("last_bn.weight"), t("last_bn.bias")
    mean, var = t("last_bn.running_mean"), t("last_bn.running_var")
    scale = g / np.sqrt(var + cfg.bn_eps)
    params["last_bn"] = {"scale": jnp.asarray(scale),
                         "bias": jnp.asarray(b - mean * scale)}
    return params
