"""ResNet image encoder (frozen tower), JAX-native, NHWC.

Replaces the reference's torchvision ResNet-152 feature extractor
(/root/reference/tell/models/resnet.py:12-117): `pool=False` returns the
[B, 49, 2048] 7x7 grid used as the image context; `pool=True` returns the
avg-pooled [B, 2048] vector used for YOLO object-crop embeddings
(tell/tasks/captioner.py:305-362).

TPU-native choices: NHWC layout (XLA's preferred conv layout on TPU), and
frozen batch-norm folded into a per-channel scale/bias at conversion time —
numerically identical in fp32 to inference-mode BN, and it lets XLA fuse the
affine into the conv epilogue.

`convert_torchvision_resnet` maps torchvision state_dict naming
(conv1/bn1/layerX.Y.convZ/downsample) onto the pytree, so the published
ImageNet weights drop in.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ResNetConfig:
    block_counts: tuple[int, ...] = (3, 8, 36, 3)  # resnet152
    width: int = 64
    bn_eps: float = 1e-5

    @staticmethod
    def resnet152() -> "ResNetConfig":
        return ResNetConfig((3, 8, 36, 3))

    @staticmethod
    def resnet50() -> "ResNetConfig":
        return ResNetConfig((3, 4, 6, 3))

    @property
    def out_dim(self) -> int:
        return self.width * 8 * 4  # 2048 for width 64



# static pytree leaf: ResNetConfig rides inside jitted args (e.g. the frozen-towers
# dict passed to the train step at call time) without becoming a traced value
jax.tree_util.register_static(ResNetConfig)

def _conv_init(rng, kh, kw, cin, cout):
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(rng, (kh, kw, cin, cout), jnp.float32) * std


def _bn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_resnet(rng: jax.Array, cfg: ResNetConfig) -> dict:
    """Random init (tests / from-scratch training of small variants)."""
    ks = iter(jax.random.split(rng, 4 + sum(cfg.block_counts) * 4))
    w = cfg.width
    params = {"stem": {"conv": _conv_init(next(ks), 7, 7, 3, w),
                       "bn": _bn_init(w)},
              "stages": []}
    cin = w
    for s, n_blocks in enumerate(cfg.block_counts):
        planes = w * (2 ** s)
        cout = planes * 4
        stage = []
        for b in range(n_blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            block = {
                "conv1": _conv_init(next(ks), 1, 1, cin, planes),
                "bn1": _bn_init(planes),
                "conv2": _conv_init(next(ks), 3, 3, planes, planes),
                "bn2": _bn_init(planes),
                "conv3": _conv_init(next(ks), 1, 1, planes, cout),
                "bn3": _bn_init(cout),
            }
            if b == 0:
                block["down_conv"] = _conv_init(next(ks), 1, 1, cin, cout)
                block["down_bn"] = _bn_init(cout)
            stage.append(block)
            cin = cout
        params["stages"].append(stage)
    return params


def _conv(x, w, stride=1, padding=None):
    # torch-style symmetric padding k//2 (XLA "SAME" pads asymmetrically for
    # even inputs under stride 2, which diverges from torchvision).
    if padding is None:
        p = w.shape[0] // 2
        padding = [(p, p), (p, p)]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn(p, x):
    return x * p["scale"] + p["bias"]


def _bottleneck(bp: dict, x: jax.Array, stride: int) -> jax.Array:
    """torchvision v1.5 bottleneck: the stride lives on the 3x3 conv."""
    identity = x
    h = jax.nn.relu(_bn(bp["bn1"], _conv(x, bp["conv1"])))
    h = jax.nn.relu(_bn(bp["bn2"], _conv(h, bp["conv2"], stride=stride)))
    h = _bn(bp["bn3"], _conv(h, bp["conv3"]))
    if "down_conv" in bp:
        identity = _bn(bp["down_bn"], _conv(x, bp["down_conv"],
                                            stride=stride))
    return jax.nn.relu(h + identity)


def resnet_forward(params: dict, cfg: ResNetConfig, x: jax.Array,
                   pool: bool = False) -> jax.Array:
    """x: [B, H, W, 3] -> grid [B, h*w, out_dim] or pooled [B, out_dim]."""
    h = _conv(x, params["stem"]["conv"], stride=2,
              padding=[(3, 3), (3, 3)])
    h = jax.nn.relu(_bn(params["stem"]["bn"], h))
    h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    for s, stage in enumerate(params["stages"]):
        for b, block in enumerate(stage):
            stride = 2 if (s > 0 and b == 0) else 1
            h = _bottleneck(block, h, stride)
    B, H, W, C = h.shape
    if pool:
        return jnp.mean(h, axis=(1, 2))
    return h.reshape(B, H * W, C)


def preprocess_image(img: jax.Array) -> jax.Array:
    """[0,1] RGB -> ImageNet-normalized (the reference's torchvision
    Normalize in scripts/process_images.py pipeline)."""
    mean = jnp.asarray([0.485, 0.456, 0.406], img.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], img.dtype)
    return (img - mean) / std


def convert_torchvision_resnet(state_dict: dict, cfg: ResNetConfig) -> dict:
    """torchvision state_dict -> pytree, with frozen BN folded to scale/bias.

    conv weights: torch [out, in, kh, kw] -> HWIO. BN: scale = g/sqrt(var+eps),
    bias = beta - mean*scale (inference-mode BN, exactly).
    """
    def t(name):
        v = state_dict[name]
        return np.asarray(getattr(v, "cpu", lambda: v)())

    def conv(name):
        return jnp.asarray(t(name + ".weight").transpose(2, 3, 1, 0))

    def bn(name):
        g, b = t(name + ".weight"), t(name + ".bias")
        mean, var = t(name + ".running_mean"), t(name + ".running_var")
        scale = g / np.sqrt(var + cfg.bn_eps)
        return {"scale": jnp.asarray(scale),
                "bias": jnp.asarray(b - mean * scale)}

    params = {"stem": {"conv": conv("conv1"), "bn": bn("bn1")}, "stages": []}
    for s, n_blocks in enumerate(cfg.block_counts):
        stage = []
        for bidx in range(n_blocks):
            pre = f"layer{s + 1}.{bidx}."
            block = {
                "conv1": conv(pre + "conv1"), "bn1": bn(pre + "bn1"),
                "conv2": conv(pre + "conv2"), "bn2": bn(pre + "bn2"),
                "conv3": conv(pre + "conv3"), "bn3": bn(pre + "bn3"),
            }
            if (pre + "downsample.0.weight") in state_dict:
                block["down_conv"] = conv(pre + "downsample.0")
                block["down_bn"] = bn(pre + "downsample.1")
            stage.append(block)
        params["stages"].append(stage)
    return params
