"""MTCNN face detector (P/R/O-net cascade), JAX-native, static shapes.

Replaces the vendored facenet-pytorch MTCNN
(/root/reference/tell/facenet/mtcnn.py:11-364 +
 utils/detect_face.py:9-248): image pyramid (factor 0.709) -> PNet proposals
-> RNet refinement -> ONet refinement + landmarks; thresholds (0.6, 0.7,
0.7); boxes sorted by size; 160x160 prewhitened crops feed FaceNet.

Static-shape design for XLA:
* the pyramid scale list is a trace-time constant for a given input size,
* every stage carries a fixed box budget with a validity mask instead of
  the reference's dynamic filtering (np.where + python loops),
* NMS uses the same one-IoU-matrix greedy loop as yolov3.nms_fixed, with
  MTCNN's +1 area convention and both 'union' and 'min' overlap methods.

Known deviation: pyramid resizing uses antialiased bilinear instead of
torch's 'area' interpolation (detect_face.py:244) — box-level effect is
sub-pixel.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MTCNNConfig:
    min_face_size: int = 20
    thresholds: tuple[float, float, float] = (0.6, 0.7, 0.7)
    factor: float = 0.709
    boxes_per_scale: int = 64
    stage1_boxes: int = 256
    max_faces: int = 64


# -- networks ---------------------------------------------------------------

def _prelu(x, a):
    return jnp.where(x > 0, x, x * a)


def _conv_valid(x, w, b, stride=1):
    h = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (h + b).astype(x.dtype)


def _ceil_maxpool(x, k, s):
    """torch MaxPool2d(..., ceil_mode=True): pad high so every window fits."""
    B, H, W, C = x.shape
    ph = max((math.ceil((H - k) / s)) * s + k - H, 0)
    pw = max((math.ceil((W - k) / s)) * s + k - W, 0)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1),
                                 [(0, 0), (0, ph), (0, pw), (0, 0)])


def pnet_forward(p: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x: [B, H, W, 3] -> (reg [B, h, w, 4], prob_face [B, h, w])."""
    h = _prelu(_conv_valid(x, *p["conv1"]), p["prelu1"])
    h = _ceil_maxpool(h, 2, 2)
    h = _prelu(_conv_valid(h, *p["conv2"]), p["prelu2"])
    h = _prelu(_conv_valid(h, *p["conv3"]), p["prelu3"])
    cls = jax.nn.softmax(_conv_valid(h, *p["conv4_1"]), axis=-1)
    reg = _conv_valid(h, *p["conv4_2"])
    return reg, cls[..., 1]


def _dense_wht(x, w, b):
    """torch permute(0,3,2,1)-then-flatten: our NHWC -> NWHC flatten."""
    B = x.shape[0]
    flat = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, -1)
    return (jnp.dot(flat, w, preferred_element_type=jnp.float32)
            + b).astype(x.dtype)


def rnet_forward(p: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x: [N, 24, 24, 3] -> (reg [N, 4], prob [N])."""
    h = _prelu(_conv_valid(x, *p["conv1"]), p["prelu1"])
    h = _ceil_maxpool(h, 3, 2)
    h = _prelu(_conv_valid(h, *p["conv2"]), p["prelu2"])
    h = _ceil_maxpool(h, 3, 2)
    h = _prelu(_conv_valid(h, *p["conv3"]), p["prelu3"])
    h = _prelu(_dense_wht(h, *p["dense4"]), p["prelu4"])
    prob = jax.nn.softmax(jnp.dot(h, p["dense5_1"][0]) + p["dense5_1"][1],
                          axis=-1)[:, 1]
    reg = jnp.dot(h, p["dense5_2"][0]) + p["dense5_2"][1]
    return reg, prob


def onet_forward(p: dict, x: jax.Array
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x: [N, 48, 48, 3] -> (reg [N,4], landmarks [N,10], prob [N])."""
    h = _prelu(_conv_valid(x, *p["conv1"]), p["prelu1"])
    h = _ceil_maxpool(h, 3, 2)
    h = _prelu(_conv_valid(h, *p["conv2"]), p["prelu2"])
    h = _ceil_maxpool(h, 3, 2)
    h = _prelu(_conv_valid(h, *p["conv3"]), p["prelu3"])
    h = _ceil_maxpool(h, 2, 2)
    h = _prelu(_conv_valid(h, *p["conv4"]), p["prelu4"])
    h = _prelu(_dense_wht(h, *p["dense5"]), p["prelu5"])
    prob = jax.nn.softmax(jnp.dot(h, p["dense6_1"][0]) + p["dense6_1"][1],
                          axis=-1)[:, 1]
    reg = jnp.dot(h, p["dense6_2"][0]) + p["dense6_2"][1]
    lmk = jnp.dot(h, p["dense6_3"][0]) + p["dense6_3"][1]
    return reg, lmk, prob


def init_mtcnn(rng: jax.Array) -> dict:
    """Random-init MTCNN pytree with the facenet-pytorch architecture
    shapes (mtcnn.py PNet/RNet/ONet) — for throughput benchmarks and smoke
    runs where the converted weights are unavailable; detection quality is
    meaningless, compute cost is identical."""
    ks = iter(jax.random.split(rng, 32))

    def conv(cin, cout, k):
        return (jax.random.normal(next(ks), (k, k, cin, cout),
                                  jnp.float32) * 0.1,
                jnp.zeros((cout,), jnp.float32))

    def dense(cin, cout):
        return (jax.random.normal(next(ks), (cin, cout),
                                  jnp.float32) * 0.05,
                jnp.zeros((cout,), jnp.float32))

    def prelu(c):
        return jnp.full((c,), 0.25, jnp.float32)

    p = {"conv1": conv(3, 10, 3), "prelu1": prelu(10),
         "conv2": conv(10, 16, 3), "prelu2": prelu(16),
         "conv3": conv(16, 32, 3), "prelu3": prelu(32),
         "conv4_1": conv(32, 2, 1), "conv4_2": conv(32, 4, 1)}
    r = {"conv1": conv(3, 28, 3), "prelu1": prelu(28),
         "conv2": conv(28, 48, 3), "prelu2": prelu(48),
         "conv3": conv(48, 64, 2), "prelu3": prelu(64),
         "dense4": dense(576, 128), "prelu4": prelu(128),
         "dense5_1": dense(128, 2), "dense5_2": dense(128, 4)}
    o = {"conv1": conv(3, 32, 3), "prelu1": prelu(32),
         "conv2": conv(32, 64, 3), "prelu2": prelu(64),
         "conv3": conv(64, 64, 3), "prelu3": prelu(64),
         "conv4": conv(64, 128, 2), "prelu4": prelu(128),
         "dense5": dense(1152, 256), "prelu5": prelu(256),
         "dense6_1": dense(256, 2), "dense6_2": dense(256, 4),
         "dense6_3": dense(256, 10)}
    return {"pnet": p, "rnet": r, "onet": o}


def convert_mtcnn(pnet_sd: dict, rnet_sd: dict, onet_sd: dict) -> dict:
    """facenet-pytorch {p,r,o}net.pt state dicts -> pytree."""
    def t(sd, name):
        v = sd[name]
        return np.asarray(getattr(v, "cpu", lambda: v)())

    def conv(sd, name):
        return (jnp.asarray(t(sd, name + ".weight").transpose(2, 3, 1, 0)),
                jnp.asarray(t(sd, name + ".bias")))

    def dense(sd, name):
        return (jnp.asarray(t(sd, name + ".weight").T),
                jnp.asarray(t(sd, name + ".bias")))

    def prelu(sd, name):
        return jnp.asarray(t(sd, name + ".weight"))

    p = {f"conv{i}": conv(pnet_sd, f"conv{i}") for i in (1, 2, 3)}
    p.update({f"prelu{i}": prelu(pnet_sd, f"prelu{i}") for i in (1, 2, 3)})
    p["conv4_1"] = conv(pnet_sd, "conv4_1")
    p["conv4_2"] = conv(pnet_sd, "conv4_2")

    r = {f"conv{i}": conv(rnet_sd, f"conv{i}") for i in (1, 2, 3)}
    r.update({f"prelu{i}": prelu(rnet_sd, f"prelu{i}")
              for i in (1, 2, 3, 4)})
    r["dense4"] = dense(rnet_sd, "dense4")
    r["dense5_1"] = dense(rnet_sd, "dense5_1")
    r["dense5_2"] = dense(rnet_sd, "dense5_2")

    o = {f"conv{i}": conv(onet_sd, f"conv{i}") for i in (1, 2, 3, 4)}
    o.update({f"prelu{i}": prelu(onet_sd, f"prelu{i}")
              for i in (1, 2, 3, 4, 5)})
    o["dense5"] = dense(onet_sd, "dense5")
    for name in ("dense6_1", "dense6_2", "dense6_3"):
        o[name] = dense(onet_sd, name)
    return {"pnet": p, "rnet": r, "onet": o}


# -- box math (detect_face.py helpers, vectorized) --------------------------

def bbreg(boxes: jax.Array, reg: jax.Array) -> jax.Array:
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    return jnp.stack([boxes[:, 0] + reg[:, 0] * w,
                      boxes[:, 1] + reg[:, 1] * h,
                      boxes[:, 2] + reg[:, 2] * w,
                      boxes[:, 3] + reg[:, 3] * h], axis=1)


def rerec(boxes: jax.Array) -> jax.Array:
    """Make boxes square around their center (detect_face.py rerec)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = jnp.maximum(w, h)
    x0 = boxes[:, 0] + w * 0.5 - side * 0.5
    y0 = boxes[:, 1] + h * 0.5 - side * 0.5
    return jnp.stack([x0, y0, x0 + side, y0 + side], axis=1)


def nms_mask(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
             thresh: float, method: str = "union") -> jax.Array:
    """Greedy NMS keep-mask over fixed-size inputs (+1 area convention)."""
    n = boxes.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = jnp.take(boxes, order, axis=0)
    v = jnp.take(valid, order)
    area = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    lt = jnp.maximum(b[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(b[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt + 1, 0), axis=-1)
    if method == "min":
        denom = jnp.minimum(area[:, None], area[None, :])
    else:
        denom = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(denom, 1e-9)

    def body(i, keep):
        alive = keep[i] & v[i]
        suppress = (iou[i] > thresh) & (jnp.arange(n) > i) & alive
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool)) & v
    inv = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n))
    return jnp.take(keep, inv)


def _crop_resize(img: jax.Array, boxes: jax.Array, size: int) -> jax.Array:
    from .yolov3 import crop_and_resize
    return crop_and_resize(img, boxes, out_size=size)


def pyramid_scales(h: int, w: int, min_face_size: int,
                   factor: float) -> list[float]:
    m = 12.0 / min_face_size
    minl = min(h, w) * m
    scales = []
    scale = m
    while minl >= 12:
        scales.append(scale)
        scale *= factor
        minl *= factor
    return scales


def detect_faces(params: dict, img: jax.Array,
                 cfg: MTCNNConfig = MTCNNConfig()
                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """img: [H, W, 3] uint8-range floats (0..255).

    Returns (boxes [max_faces, 4] xyxy, probs [max_faces], valid
    [max_faces]), sorted by box area descending (the reference's
    select_largest ordering, mtcnn.py:325-334).
    """
    H, W, _ = img.shape
    x = (img - 127.5) * 0.0078125
    cap1 = cfg.stage1_boxes

    # ---- stage 1: PNet over the pyramid
    all_boxes, all_regs, all_scores, all_valid = [], [], [], []
    for scale in pyramid_scales(H, W, cfg.min_face_size, cfg.factor):
        hs, ws = int(H * scale + 1), int(W * scale + 1)
        xi = jax.image.resize(x, (hs, ws, 3), "linear", antialias=True)
        reg, prob = pnet_forward(params["pnet"], xi[None])
        reg, prob = reg[0], prob[0]
        gh, gw = prob.shape
        k = min(cfg.boxes_per_scale, gh * gw)
        flat = prob.reshape(-1)
        top, idx = jax.lax.top_k(flat, k)
        gy = (idx // gw).astype(jnp.float32)
        gx = (idx % gw).astype(jnp.float32)
        # generateBoundingBox: stride 2, cell 12, floor((2*g + off)/scale)
        q1x = jnp.floor((2 * gx + 1) / scale)
        q1y = jnp.floor((2 * gy + 1) / scale)
        q2x = jnp.floor((2 * gx + 12) / scale)
        q2y = jnp.floor((2 * gy + 12) / scale)
        boxes = jnp.stack([q1x, q1y, q2x, q2y], axis=1)
        r = jnp.take(reg.reshape(-1, 4), idx, axis=0)
        valid = top >= cfg.thresholds[0]
        keep = nms_mask(boxes, top, valid, 0.5)
        # RAW boxes into the global NMS — the reference regresses only the
        # global-NMS survivors (detect_face.py: nms(0.7) over un-regressed
        # 12x12-cell boxes, then qq1..qq4), so regressing earlier would
        # change which boxes survive
        all_boxes.append(boxes)
        all_regs.append(r)
        all_scores.append(top)
        all_valid.append(keep)

    boxes = jnp.concatenate(all_boxes, axis=0)
    regs = jnp.concatenate(all_regs, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    valid = jnp.concatenate(all_valid, axis=0)
    # global stage-1 NMS then keep a fixed budget
    keep = nms_mask(boxes, scores, valid, 0.7)
    order = jnp.argsort(-jnp.where(keep, scores, -jnp.inf))[:cap1]
    boxes = jnp.take(boxes, order, axis=0)
    regs = jnp.take(regs, order, axis=0)
    scores = jnp.take(scores, order)
    valid = jnp.take(keep, order)
    boxes = jnp.where(valid[:, None], rerec(bbreg(boxes, regs)), 0.0)

    # ---- stage 2: RNet on 24x24 crops
    crops = _crop_resize(x, boxes, 24)
    reg, prob = rnet_forward(params["rnet"], crops)
    valid = valid & (prob >= cfg.thresholds[1])
    keep = nms_mask(boxes, prob, valid, 0.7)
    boxes = jnp.where(keep[:, None], rerec(bbreg(boxes, reg)), 0.0)

    # ---- stage 3: ONet on 48x48 crops
    crops = _crop_resize(x, boxes, 48)
    reg, _lmk, prob = onet_forward(params["onet"], crops)
    valid = keep & (prob >= cfg.thresholds[2])
    boxes = bbreg(boxes, reg)
    keep = nms_mask(boxes, prob, valid, 0.7, method="min")
    scores = jnp.where(keep, prob, 0.0)

    # sort by area descending (select_largest), fixed output budget
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    order = jnp.argsort(-jnp.where(keep, area, -jnp.inf))[: cfg.max_faces]
    return (jnp.take(boxes, order, axis=0), jnp.take(scores, order),
            jnp.take(keep, order))


def extract_faces(img: jax.Array, boxes: jax.Array,
                  image_size: int = 160) -> jax.Array:
    """Crop + resize + prewhiten detected faces for FaceNet
    (detect_face.py extract_face semantics, margin 0)."""
    crops = _crop_resize(img, boxes, image_size)
    return (crops - 127.5) / 128.0
