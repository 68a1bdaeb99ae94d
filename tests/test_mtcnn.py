"""MTCNN tests: P/R/O-net parity vs independent torch nets through the
converter, box-math goldens, NMS semantics, full-cascade smoke test."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tell_tpu.models.backbones.mtcnn import (
    MTCNNConfig, bbreg, convert_mtcnn, detect_faces, extract_faces,
    nms_mask, onet_forward, pnet_forward, pyramid_scales, rerec,
    rnet_forward)


def build_torch_nets():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class PNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 10, 3)
            self.prelu1 = nn.PReLU(10)
            self.pool1 = nn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(10, 16, 3)
            self.prelu2 = nn.PReLU(16)
            self.conv3 = nn.Conv2d(16, 32, 3)
            self.prelu3 = nn.PReLU(32)
            self.conv4_1 = nn.Conv2d(32, 2, 1)
            self.conv4_2 = nn.Conv2d(32, 4, 1)

        def forward(self, x):
            h = self.prelu1(self.conv1(x))
            h = self.pool1(h)
            h = self.prelu2(self.conv2(h))
            h = self.prelu3(self.conv3(h))
            return self.conv4_2(h), torch.softmax(self.conv4_1(h), dim=1)

    class RNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 28, 3)
            self.prelu1 = nn.PReLU(28)
            self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(28, 48, 3)
            self.prelu2 = nn.PReLU(48)
            self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = nn.Conv2d(48, 64, 2)
            self.prelu3 = nn.PReLU(64)
            self.dense4 = nn.Linear(576, 128)
            self.prelu4 = nn.PReLU(128)
            self.dense5_1 = nn.Linear(128, 2)
            self.dense5_2 = nn.Linear(128, 4)

        def forward(self, x):
            h = self.pool1(self.prelu1(self.conv1(x)))
            h = self.pool2(self.prelu2(self.conv2(h)))
            h = self.prelu3(self.conv3(h))
            h = h.permute(0, 3, 2, 1).contiguous().view(h.shape[0], -1)
            h = self.prelu4(self.dense4(h))
            return self.dense5_2(h), torch.softmax(self.dense5_1(h), dim=1)

    class ONet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 32, 3)
            self.prelu1 = nn.PReLU(32)
            self.pool1 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = nn.Conv2d(32, 64, 3)
            self.prelu2 = nn.PReLU(64)
            self.pool2 = nn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv3 = nn.Conv2d(64, 64, 3)
            self.prelu3 = nn.PReLU(64)
            self.pool3 = nn.MaxPool2d(2, 2, ceil_mode=True)
            self.conv4 = nn.Conv2d(64, 128, 2)
            self.prelu4 = nn.PReLU(128)
            self.dense5 = nn.Linear(1152, 256)
            self.prelu5 = nn.PReLU(256)
            self.dense6_1 = nn.Linear(256, 2)
            self.dense6_2 = nn.Linear(256, 4)
            self.dense6_3 = nn.Linear(256, 10)

        def forward(self, x):
            h = self.pool1(self.prelu1(self.conv1(x)))
            h = self.pool2(self.prelu2(self.conv2(h)))
            h = self.pool3(self.prelu3(self.conv3(h)))
            h = self.prelu4(self.conv4(h))
            h = h.permute(0, 3, 2, 1).contiguous().view(h.shape[0], -1)
            h = self.prelu5(self.dense5(h))
            return (self.dense6_2(h), self.dense6_3(h),
                    torch.softmax(self.dense6_1(h), dim=1))

    torch.manual_seed(0)
    return PNet().eval(), RNet().eval(), ONet().eval()


@pytest.fixture(scope="module")
def nets():
    pnet, rnet, onet = build_torch_nets()
    params = convert_mtcnn(pnet.state_dict(), rnet.state_dict(),
                           onet.state_dict())
    return pnet, rnet, onet, params


def test_pnet_parity(nets):
    import torch
    pnet, _, _, params = nets
    x = np.random.RandomState(0).randn(1, 30, 40, 3).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = pnet(torch.tensor(x.transpose(0, 3, 1, 2)))
    reg, prob = pnet_forward(params["pnet"], jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(reg),
                               reg_t.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy()[:, 1],
                               atol=1e-5)


def test_rnet_onet_parity(nets):
    import torch
    _, rnet, onet, params = nets
    x24 = np.random.RandomState(1).randn(3, 24, 24, 3).astype(np.float32)
    with torch.no_grad():
        reg_t, prob_t = rnet(torch.tensor(x24.transpose(0, 3, 1, 2)))
    reg, prob = rnet_forward(params["rnet"], jnp.asarray(x24))
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy()[:, 1],
                               atol=1e-5)

    x48 = np.random.RandomState(2).randn(3, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        reg_t, lmk_t, prob_t = onet(torch.tensor(x48.transpose(0, 3, 1, 2)))
    reg, lmk, prob = onet_forward(params["onet"], jnp.asarray(x48))
    np.testing.assert_allclose(np.asarray(reg), reg_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lmk), lmk_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy()[:, 1],
                               atol=1e-5)


def test_box_math_goldens():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    sq = np.asarray(rerec(boxes))[0]
    assert sq[2] - sq[0] == sq[3] - sq[1] == 40.0   # square, max side
    assert abs((sq[0] + sq[2]) / 2 - 20.0) < 1e-5   # center preserved

    reg = jnp.asarray([[0.1, -0.1, 0.0, 0.2]])
    out = np.asarray(bbreg(boxes, reg))[0]
    # w = 21, h = 41 (the +1 convention)
    np.testing.assert_allclose(out, [10 + 0.1 * 21, 20 - 0.1 * 41,
                                     30.0, 60 + 0.2 * 41], atol=1e-5)


def test_nms_mask_union_and_min():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                         [0, 0, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    valid = jnp.ones((4,), bool)
    keep_u = np.asarray(nms_mask(boxes, scores, valid, 0.5, "union"))
    assert list(keep_u) == [True, False, True, True]
    # 'min' method: small box inside big box has IoMin ~1 -> suppressed
    keep_m = np.asarray(nms_mask(boxes, scores, valid, 0.5, "min"))
    assert list(keep_m) == [True, False, True, False]


def test_pyramid_scales():
    scales = pyramid_scales(224, 224, 20, 0.709)
    assert scales[0] == pytest.approx(12 / 20)
    assert all(s1 / s0 == pytest.approx(0.709)
               for s0, s1 in zip(scales, scales[1:]))
    assert 224 * scales[-1] >= 12 > 224 * scales[-1] * 0.709


def test_full_cascade_smoke(nets):
    _, _, _, params = nets
    img = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (112, 112, 3)), jnp.float32)
    cfg = MTCNNConfig(stage1_boxes=64, boxes_per_scale=16, max_faces=8)
    boxes, probs, valid = detect_faces(params, img, cfg)
    assert boxes.shape == (8, 4) and probs.shape == (8,)
    assert np.isfinite(np.asarray(boxes)).all()
    faces = extract_faces(img, boxes, image_size=32)
    assert faces.shape == (8, 32, 32, 3)
