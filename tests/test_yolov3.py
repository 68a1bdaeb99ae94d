"""YOLOv3-SPP tests: architecture invariants, decode shapes, darknet binary
weight round-trip, static NMS semantics."""
import numpy as np

import jax
import jax.numpy as jnp

from tell_tpu.models.backbones.yolov3 import (
    crop_and_resize, init_yolov3, load_darknet_weights, nms_fixed,
    parse_darknet_cfg, yolov3_forward, yolov3_spp_module_defs)


def test_architecture_invariants():
    defs = yolov3_spp_module_defs()
    counts = {}
    for d in defs:
        counts[d["type"]] = counts.get(d["type"], 0) + 1
    # yolov3-spp.cfg block census (76 conv / 23 shortcut / 7 route /
    # 3 maxpool / 2 upsample / 3 yolo = 114 modules)
    assert counts == {"convolutional": 76, "shortcut": 23, "route": 7,
                      "maxpool": 3, "upsample": 2, "yolo": 3}
    assert len(defs) == 114
    # route anchor points: module 36 ends the 256 stage, 61 the 512 stage
    assert defs[36]["type"] == "shortcut"
    assert defs[35]["filters"] == 256
    assert defs[61]["type"] == "shortcut"
    assert defs[60]["filters"] == 512
    masks = [d["mask"] for d in defs if d["type"] == "yolo"]
    assert masks == [(6, 7, 8), (3, 4, 5), (0, 1, 2)]


def test_cfg_parser_roundtrip():
    cfg_text = """
[net]
width=416
[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky
[shortcut]
from=-3
activation=linear
[route]
layers = -1, 61
[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=80
"""
    defs = parse_darknet_cfg(cfg_text)
    assert defs[0] == {"type": "convolutional", "bn": True, "filters": 32,
                       "size": 3, "stride": 1, "pad": 1,
                       "activation": "leaky"}
    assert defs[1]["from"] == -3
    assert defs[2]["layers"] == (-1, 61)
    assert defs[3]["anchors"] == ((10, 13), (16, 30), (33, 23))


def test_forward_detection_count():
    defs = yolov3_spp_module_defs()
    params = init_yolov3(jax.random.PRNGKey(0), defs)
    S = 128
    x = jnp.zeros((1, S, S, 3))
    dets = yolov3_forward(params, defs, x)
    g = S // 32
    expected = 3 * (g * g + (2 * g) ** 2 + (4 * g) ** 2)
    assert dets.shape == (1, expected, 85)
    d = np.asarray(dets)
    assert (d[..., 4] >= 0).all() and (d[..., 4] <= 1).all()  # sigmoided
    assert (d[..., 2:4] > 0).all()                            # wh positive


def test_darknet_weight_loading(tmp_path):
    defs = yolov3_spp_module_defs()
    # build the buffer following the binary layout: BN stats positive,
    # conv kernels zero-mean (all-positive kernels explode activations)
    rng = np.random.RandomState(0)
    parts = []
    channels = [3]
    for i, d in enumerate(defs):
        if d["type"] == "convolutional":
            cin, cout, k = channels[-1], d["filters"], d["size"]
            if d.get("bn", True):
                parts.append(rng.uniform(0.1, 0.5, 4 * cout))  # b,w,mean,var
            else:
                parts.append(rng.uniform(-0.1, 0.1, cout))
            fan = k * k * cin
            parts.append(rng.normal(0, fan ** -0.5, cout * fan))
            channels.append(cout)
        elif d["type"] == "route":
            layers = [l if l >= 0 else i + l for l in d["layers"]]
            channels.append(sum(channels[l + 1] for l in layers))
        else:
            channels.append(channels[-1])
    path = tmp_path / "w.weights"
    with open(path, "wb") as f:
        np.asarray([0, 2, 5], np.int32).tofile(f)
        np.asarray([0], np.int64).tofile(f)
        np.concatenate(parts).astype(np.float32).tofile(f)
    params = load_darknet_weights(defs, str(path))
    assert len(params["convs"]) == 76
    # runs end to end
    dets = yolov3_forward(params, defs, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(dets)).all()


def test_nms_semantics():
    # two heavily-overlapping class-0 boxes + one class-1 box at same spot
    dets = np.zeros((5, 85), np.float32)
    dets[0, :4] = [50, 50, 20, 20]; dets[0, 4] = 1; dets[0, 5] = 0.9   # noqa: E702
    dets[1, :4] = [51, 51, 20, 20]; dets[1, 4] = 1; dets[1, 5] = 0.8   # noqa: E702
    dets[2, :4] = [50, 50, 20, 20]; dets[2, 4] = 1; dets[2, 6] = 0.7   # noqa: E702
    dets[3, :4] = [200, 200, 10, 10]; dets[3, 4] = 1; dets[3, 5] = 0.6  # noqa: E702
    dets[4, :4] = [50, 50, 20, 20]; dets[4, 4] = 0.01; dets[4, 5] = 1.0  # noqa: E702
    boxes, scores, valid = nms_fixed(jnp.asarray(dets), max_det=8)
    v = np.asarray(valid)
    assert v.sum() == 3  # duplicate class-0 suppressed, low-conf dropped
    s = np.asarray(scores)[v.astype(bool)]
    np.testing.assert_allclose(sorted(s, reverse=True), [0.9, 0.7, 0.6],
                               atol=1e-5)


def test_crop_and_resize():
    img = jnp.asarray(np.random.RandomState(0).rand(100, 80, 3), jnp.float32)
    boxes = jnp.asarray([[10.0, 20.0, 50.0, 60.0],
                         [0.0, 0.0, 80.0, 100.0]])
    crops = crop_and_resize(img, boxes, out_size=32)
    assert crops.shape == (2, 32, 32, 3)
    # full-image crop resizes the whole image
    ref = jax.image.resize(img, (32, 32, 3), "bilinear")
    np.testing.assert_allclose(np.asarray(crops[1]), np.asarray(ref),
                               atol=0.15)
