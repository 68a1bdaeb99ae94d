"""FaceNet tower parity vs an independent torch InceptionResnetV1 (reduced
repeat counts for CPU speed; facenet-pytorch naming so the converter is
exercised as-is)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tell_tpu.models.backbones.facenet import (FaceNetConfig, convert_facenet,
                                               facenet_forward, prewhiten)

TINY = FaceNetConfig(repeats=(1, 2, 1))


def build_torch_facenet(cfg):
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, k, s, p=0):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, p, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class Block35(nn.Module):
        def __init__(self, scale=0.17):
            super().__init__()
            self.scale = scale
            self.branch0 = BasicConv2d(256, 32, 1, 1)
            self.branch1 = nn.Sequential(BasicConv2d(256, 32, 1, 1),
                                         BasicConv2d(32, 32, 3, 1, 1))
            self.branch2 = nn.Sequential(BasicConv2d(256, 32, 1, 1),
                                         BasicConv2d(32, 32, 3, 1, 1),
                                         BasicConv2d(32, 32, 3, 1, 1))
            self.conv2d = nn.Conv2d(96, 256, 1, 1)

        def forward(self, x):
            out = torch.cat([self.branch0(x), self.branch1(x),
                             self.branch2(x)], 1)
            return F.relu(self.conv2d(out) * self.scale + x)

    class Block17(nn.Module):
        def __init__(self, scale=0.10):
            super().__init__()
            self.scale = scale
            self.branch0 = BasicConv2d(896, 128, 1, 1)
            self.branch1 = nn.Sequential(
                BasicConv2d(896, 128, 1, 1),
                BasicConv2d(128, 128, (1, 7), 1, (0, 3)),
                BasicConv2d(128, 128, (7, 1), 1, (3, 0)))
            self.conv2d = nn.Conv2d(256, 896, 1, 1)

        def forward(self, x):
            out = torch.cat([self.branch0(x), self.branch1(x)], 1)
            return F.relu(self.conv2d(out) * self.scale + x)

    class Block8(nn.Module):
        def __init__(self, scale=0.20, noReLU=False):
            super().__init__()
            self.scale = scale
            self.noReLU = noReLU
            self.branch0 = BasicConv2d(1792, 192, 1, 1)
            self.branch1 = nn.Sequential(
                BasicConv2d(1792, 192, 1, 1),
                BasicConv2d(192, 192, (1, 3), 1, (0, 1)),
                BasicConv2d(192, 192, (3, 1), 1, (1, 0)))
            self.conv2d = nn.Conv2d(384, 1792, 1, 1)

        def forward(self, x):
            out = torch.cat([self.branch0(x), self.branch1(x)], 1)
            out = self.conv2d(out) * self.scale + x
            return out if self.noReLU else F.relu(out)

    class Mixed6a(nn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = BasicConv2d(256, 384, 3, 2)
            self.branch1 = nn.Sequential(BasicConv2d(256, 192, 1, 1),
                                         BasicConv2d(192, 192, 3, 1, 1),
                                         BasicConv2d(192, 256, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              F.max_pool2d(x, 3, 2)], 1)

    class Mixed7a(nn.Module):
        def __init__(self):
            super().__init__()
            self.branch0 = nn.Sequential(BasicConv2d(896, 256, 1, 1),
                                         BasicConv2d(256, 384, 3, 2))
            self.branch1 = nn.Sequential(BasicConv2d(896, 256, 1, 1),
                                         BasicConv2d(256, 256, 3, 2))
            self.branch2 = nn.Sequential(BasicConv2d(896, 256, 1, 1),
                                         BasicConv2d(256, 256, 3, 1, 1),
                                         BasicConv2d(256, 256, 3, 2))

        def forward(self, x):
            return torch.cat([self.branch0(x), self.branch1(x),
                              self.branch2(x), F.max_pool2d(x, 3, 2)], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv2d_1a = BasicConv2d(3, 32, 3, 2)
            self.conv2d_2a = BasicConv2d(32, 32, 3, 1)
            self.conv2d_2b = BasicConv2d(32, 64, 3, 1, 1)
            self.conv2d_3b = BasicConv2d(64, 80, 1, 1)
            self.conv2d_4a = BasicConv2d(80, 192, 3, 1)
            self.conv2d_4b = BasicConv2d(192, 256, 3, 2)
            self.repeat_1 = nn.Sequential(
                *[Block35() for _ in range(cfg.repeats[0])])
            self.mixed_6a = Mixed6a()
            self.repeat_2 = nn.Sequential(
                *[Block17() for _ in range(cfg.repeats[1])])
            self.mixed_7a = Mixed7a()
            self.repeat_3 = nn.Sequential(
                *[Block8() for _ in range(cfg.repeats[2])])
            self.block8 = Block8(noReLU=True)
            self.last_linear = nn.Linear(1792, 512, bias=False)
            self.last_bn = nn.BatchNorm1d(512, eps=0.001)

        def forward(self, x):
            h = self.conv2d_1a(x)
            h = self.conv2d_2a(h)
            h = self.conv2d_2b(h)
            h = F.max_pool2d(h, 3, 2)
            h = self.conv2d_3b(h)
            h = self.conv2d_4a(h)
            h = self.conv2d_4b(h)
            h = self.repeat_1(h)
            h = self.mixed_6a(h)
            h = self.repeat_2(h)
            h = self.mixed_7a(h)
            h = self.repeat_3(h)
            h = self.block8(h)
            h = F.adaptive_avg_pool2d(h, 1).flatten(1)
            h = self.last_bn(self.last_linear(h))
            return F.normalize(h, p=2, dim=1)

    torch.manual_seed(0)
    net = Net().eval()
    for m in net.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm1d)):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    return net


def test_facenet_parity():
    torch = pytest.importorskip("torch")
    net = build_torch_facenet(TINY)
    params = convert_facenet(net.state_dict(), TINY)
    x = np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)
    x = np.asarray(prewhiten(jnp.asarray(x)))
    with torch.no_grad():
        theirs = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(facenet_forward(params, TINY, jnp.asarray(x)))
    assert ours.shape == (2, 512)
    np.testing.assert_allclose(ours, theirs, atol=3e-4)
    np.testing.assert_allclose((ours ** 2).sum(-1), 1.0, atol=1e-4)
