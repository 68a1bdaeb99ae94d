"""YOLOv3-SPP object detector, JAX-native, NHWC, static shapes.

Replaces the vendored ultralytics Darknet stack
(/root/reference/tell/yolov3/models.py:196-496 + cfg/yolov3-spp.cfg +
utils/utils.py NMS): 416-letterboxed images -> up to `max_det` boxes, whose
224x224 crops are embedded by the pooled ResNet-152 to form the `obj`
context (tell/tasks/captioner.py:305-362, scripts/annotate_yolo3.py:50-231).

Design:
* the architecture is built programmatically (`yolov3_spp_module_defs`) —
  darknet-53 backbone + SPP head with the standard route indices (61, 36) —
  instead of parsing a cfg file; `parse_darknet_cfg` still loads arbitrary
  user cfgs,
* `load_darknet_weights` reads the canonical binary .weights layout
  (per conv: bn bias/weight/mean/var then kernel; bias+kernel when no BN),
* detection decode is the standard YOLO head: xy = sigmoid + grid,
  wh = exp * anchor, all scaled by stride; obj/cls sigmoids ('default' arc,
  models.py:255-258),
* NMS is fixed-shape for XLA: top-K pre-select, one IoU matrix, greedy
  suppression via lax.fori_loop with a per-class coordinate offset so
  classes never suppress each other (conf 0.3 / IoU 0.6, utils.py:528).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

ANCHORS = ((10, 13), (16, 30), (33, 23), (30, 61), (62, 45), (59, 119),
           (116, 90), (156, 198), (373, 326))


def yolov3_spp_module_defs(num_classes: int = 80) -> list[dict]:
    """The yolov3-spp architecture as a module-def list (darknet indexing:
    one entry per block after [net])."""
    defs: list[dict] = []

    def conv(filters, size, stride=1, bn=True, act="leaky"):
        defs.append({"type": "convolutional", "filters": filters,
                     "size": size, "stride": stride, "bn": bn,
                     "activation": act})

    def stage(filters, blocks):
        conv(filters, 3, 2)
        for _ in range(blocks):
            conv(filters // 2, 1)
            conv(filters, 3)
            defs.append({"type": "shortcut", "from": -3})

    no = 3 * (num_classes + 5)  # 255
    # darknet-53 backbone
    conv(32, 3)
    stage(64, 1)
    stage(128, 2)
    stage(256, 8)    # ends at module index 36
    stage(512, 8)    # ends at module index 61
    stage(1024, 4)
    # SPP head, scale 1 (stride 32)
    conv(512, 1); conv(1024, 3); conv(512, 1)  # noqa: E702
    defs.append({"type": "maxpool", "size": 5, "stride": 1})
    defs.append({"type": "route", "layers": (-2,)})
    defs.append({"type": "maxpool", "size": 9, "stride": 1})
    defs.append({"type": "route", "layers": (-4,)})
    defs.append({"type": "maxpool", "size": 13, "stride": 1})
    defs.append({"type": "route", "layers": (-1, -3, -5, -6)})
    conv(512, 1); conv(1024, 3); conv(512, 1); conv(1024, 3)  # noqa: E702
    conv(no, 1, bn=False, act="linear")
    defs.append({"type": "yolo", "mask": (6, 7, 8), "classes": num_classes})
    # scale 2 (stride 16)
    defs.append({"type": "route", "layers": (-4,)})
    conv(256, 1)
    defs.append({"type": "upsample", "stride": 2})
    defs.append({"type": "route", "layers": (-1, 61)})
    conv(256, 1); conv(512, 3); conv(256, 1); conv(512, 3)  # noqa: E702
    conv(256, 1); conv(512, 3)  # noqa: E702
    conv(no, 1, bn=False, act="linear")
    defs.append({"type": "yolo", "mask": (3, 4, 5), "classes": num_classes})
    # scale 3 (stride 8)
    defs.append({"type": "route", "layers": (-4,)})
    conv(128, 1)
    defs.append({"type": "upsample", "stride": 2})
    defs.append({"type": "route", "layers": (-1, 36)})
    conv(128, 1); conv(256, 3); conv(128, 1); conv(256, 3)  # noqa: E702
    conv(128, 1); conv(256, 3)  # noqa: E702
    conv(no, 1, bn=False, act="linear")
    defs.append({"type": "yolo", "mask": (0, 1, 2), "classes": num_classes})
    return defs


def parse_darknet_cfg(text: str) -> list[dict]:
    """Parse a darknet .cfg into the same module-def list (skips [net])."""
    defs: list[dict] = []
    current: dict | None = None
    for raw in text.splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        if line.startswith("["):
            current = {"type": line.strip("[]")}
            if current["type"] != "net":
                defs.append(current)
            else:
                current = {"type": "net"}  # parsed but dropped
            continue
        key, value = (s.strip() for s in line.split("=", 1))
        if current is None:
            continue
        if key in ("layers", "mask", "from"):
            vals = tuple(int(v) for v in value.replace(",", " ").split())
            current[key] = vals if key != "from" else vals[0]
        elif key == "anchors":
            nums = [int(float(v)) for v in value.replace(",", " ").split()]
            current[key] = tuple(zip(nums[::2], nums[1::2]))
        elif key in ("filters", "size", "stride", "classes", "pad"):
            current[key] = int(value)
        elif key == "activation":
            current[key] = value
        elif key == "batch_normalize":
            current["bn"] = bool(int(value))
    for d in defs:
        d.setdefault("bn", False)
        if d["type"] == "convolutional" and "activation" not in d:
            d["activation"] = "linear"
    return defs


def init_yolov3(rng: jax.Array, defs: list[dict]) -> dict:
    """Random init; channel bookkeeping follows route/shortcut topology."""
    params: dict = {"convs": {}}
    channels = [3]
    for i, d in enumerate(defs):
        if d["type"] == "convolutional":
            cin = channels[-1]
            k, cout = d["size"], d["filters"]
            key = jax.random.fold_in(rng, i)
            w = jax.random.normal(key, (k, k, cin, cout), jnp.float32)
            w = w * (2.0 / (k * k * cin)) ** 0.5
            p = {"w": w}
            if d.get("bn", True):
                p["scale"] = jnp.ones((cout,), jnp.float32)
                p["bias"] = jnp.zeros((cout,), jnp.float32)
            else:
                p["b"] = jnp.zeros((cout,), jnp.float32)
            params["convs"][i] = p
            channels.append(cout)
        elif d["type"] == "route":
            layers = [l if l >= 0 else i + l for l in d["layers"]]
            channels.append(sum(channels[l + 1] for l in layers))
        elif d["type"] in ("shortcut", "maxpool", "upsample", "yolo"):
            channels.append(channels[-1])
    return params


def load_darknet_weights(defs: list[dict], path: str) -> dict:
    """Read the canonical darknet .weights binary into a param pytree."""
    with open(path, "rb") as f:
        header = np.fromfile(f, np.int32, 3)
        np.fromfile(f, np.int64 if header[0] * 10 + header[1] >= 2 else
                    np.int32, 1)  # images seen
        buf = np.fromfile(f, np.float32)
    pos = 0
    params: dict = {"convs": {}}
    channels = [3]
    for i, d in enumerate(defs):
        if d["type"] == "convolutional":
            cin = channels[-1]
            k, cout = d["size"], d["filters"]
            p: dict = {}
            if d.get("bn", True):
                bn_b = buf[pos:pos + cout]; pos += cout  # noqa: E702
                bn_w = buf[pos:pos + cout]; pos += cout  # noqa: E702
                bn_m = buf[pos:pos + cout]; pos += cout  # noqa: E702
                bn_v = buf[pos:pos + cout]; pos += cout  # noqa: E702
                scale = bn_w / np.sqrt(bn_v + 1e-5)  # darknet BN eps
                p["scale"] = jnp.asarray(scale)
                p["bias"] = jnp.asarray(bn_b - bn_m * scale)
            else:
                p["b"] = jnp.asarray(buf[pos:pos + cout]); pos += cout  # noqa: E702
            n = cout * cin * k * k
            w = buf[pos:pos + n].reshape(cout, cin, k, k); pos += n  # noqa: E702
            p["w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
            params["convs"][i] = p
            channels.append(cout)
        elif d["type"] == "route":
            layers = [l if l >= 0 else i + l for l in d["layers"]]
            channels.append(sum(channels[l + 1] for l in layers))
        else:
            channels.append(channels[-1])
    assert pos == len(buf), f"weight file mismatch: used {pos} of {len(buf)}"
    return params


def _decode_yolo(p: jax.Array, mask: tuple[int, ...], num_classes: int,
                 img_size: int) -> jax.Array:
    """p: [B, ny, nx, 3*(nc+5)] -> [B, 3*ny*nx, nc+5] decoded boxes."""
    B, ny, nx, _ = p.shape
    na = len(mask)
    no = num_classes + 5
    stride = img_size // nx
    p = p.reshape(B, ny, nx, na, no)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    anchors = jnp.asarray([ANCHORS[m] for m in mask], jnp.float32)
    xy = (jax.nn.sigmoid(p[..., 0:2])
          + jnp.stack([gx, gy], -1)[:, :, None, :]) * stride
    wh = jnp.exp(p[..., 2:4]) * anchors[None, None, None, :, :]
    conf = jax.nn.sigmoid(p[..., 4:])
    out = jnp.concatenate([xy, wh, conf], axis=-1)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, na * ny * nx, no)


def yolov3_forward(params: dict, defs: list[dict], x: jax.Array
                   ) -> jax.Array:
    """x: [B, S, S, 3] in [0,1] -> decoded detections [B, N, nc+5]."""
    img_size = x.shape[1]
    outputs: list[jax.Array] = []
    detections = []
    h = x
    for i, d in enumerate(defs):
        t = d["type"]
        if t == "convolutional":
            p = params["convs"][i]
            s, k = d["stride"], d["size"]
            pad = k // 2
            h = jax.lax.conv_general_dilated(
                h, p["w"], (s, s), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(x.dtype)
            if "scale" in p:
                h = h * p["scale"] + p["bias"]
            else:
                h = h + p["b"]
            if d["activation"] == "leaky":
                h = jax.nn.leaky_relu(h, 0.1)
        elif t == "shortcut":
            h = h + outputs[i + d["from"]]
        elif t == "route":
            layers = [l if l >= 0 else i + l for l in d["layers"]]
            h = jnp.concatenate([outputs[l] for l in layers], axis=-1)
        elif t == "maxpool":
            k, s = d["size"], d["stride"]
            pad = k // 2
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
                [(0, 0), (pad, pad), (pad, pad), (0, 0)])
        elif t == "upsample":
            B, H, W, C = h.shape
            h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
        elif t == "yolo":
            detections.append(_decode_yolo(h, d["mask"], d["classes"],
                                           img_size))
        outputs.append(h)
    return jnp.concatenate(detections, axis=1)


def nms_fixed(dets: jax.Array, conf_thres: float = 0.3,
              iou_thres: float = 0.6, pre_top_k: int = 256,
              max_det: int = 64) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape class-aware NMS.

    dets: [N, nc+5] (xywh center format + obj + cls probs).
    Returns (boxes_xyxy [max_det, 4], scores [max_det], valid [max_det]).
    """
    obj = dets[:, 4]
    cls_prob = dets[:, 5:] * obj[:, None]
    cls_id = jnp.argmax(cls_prob, axis=-1)
    score = jnp.max(cls_prob, axis=-1)
    score = jnp.where(score > conf_thres, score, 0.0)

    xy, wh = dets[:, :2], dets[:, 2:4]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)

    k = min(pre_top_k, dets.shape[0])
    top_score, idx = jax.lax.top_k(score, k)
    top_boxes = jnp.take(boxes, idx, axis=0)
    top_cls = jnp.take(cls_id, idx)
    # per-class offset: boxes of different classes never overlap
    off = top_cls.astype(jnp.float32)[:, None] * 8192.0
    nb = top_boxes + off

    area = jnp.maximum(nb[:, 2] - nb[:, 0], 0) * \
        jnp.maximum(nb[:, 3] - nb[:, 1], 0)
    lt = jnp.maximum(nb[:, None, :2], nb[None, :, :2])
    rb = jnp.minimum(nb[:, None, 2:], nb[None, :, 2:])
    inter = jnp.prod(jnp.maximum(rb - lt, 0), axis=-1)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-9)

    def body(i, keep):
        alive = keep[i] & (top_score[i] > 0)
        suppress = (iou[i] > iou_thres) & \
            (jnp.arange(k) > i) & alive
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, k, body, jnp.ones((k,), bool))
    keep = keep & (top_score > 0)
    order = jnp.argsort(~keep, stable=True)[:max_det]
    valid = jnp.take(keep, order)
    return (jnp.take(top_boxes, order, axis=0),
            jnp.take(top_score, order), valid)


def crop_and_resize(image: jax.Array, boxes: jax.Array,
                    out_size: int = 224) -> jax.Array:
    """Crop detected boxes from [H, W, 3] and resize to out_size^2 for the
    pooled-ResNet object embeddings (captioner.py:305-362)."""
    H, W, _ = image.shape

    def one(box):
        y0, x0 = box[1], box[0]
        y1, x1 = box[3], box[2]
        scale = jnp.stack([(y1 - y0) / out_size, (x1 - x0) / out_size])
        return jax.image.scale_and_translate(
            image, (out_size, out_size, 3), (0, 1),
            1.0 / jnp.maximum(scale, 1e-6),
            -jnp.stack([y0, x0]) / jnp.maximum(scale, 1e-6),
            method="bilinear")

    return jax.vmap(one)(boxes)
