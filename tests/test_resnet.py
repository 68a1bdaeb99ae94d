"""ResNet tower tests: activation parity against an independently written
torch bottleneck ResNet (torchvision semantics) through the state-dict
converter, plus grid/pool shape behavior."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tell_tpu.models.backbones import (ResNetConfig, convert_torchvision_resnet,
                                       init_resnet, resnet_forward)

TINY = ResNetConfig(block_counts=(1, 1, 1, 1), width=8)


def build_torch_resnet(cfg):
    """Independent torch implementation with torchvision naming/semantics."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            cout = planes * 4
            self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, cout, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU()
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            h = self.relu(self.bn1(self.conv1(x)))
            h = self.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return self.relu(h + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.width
            self.conv1 = nn.Conv2d(3, w, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(w)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            cin = w
            for s, n in enumerate(cfg.block_counts):
                planes = w * 2 ** s
                blocks = []
                for b in range(n):
                    stride = 2 if (s > 0 and b == 0) else 1
                    blocks.append(Bottleneck(cin, planes, stride))
                    cin = planes * 4
                setattr(self, f"layer{s+1}", nn.Sequential(*blocks))

        def forward(self, x):
            h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(4):
                h = getattr(self, f"layer{s+1}")(h)
            return h

    torch.manual_seed(0)
    net = Net().eval()
    # randomize BN stats so folding is actually exercised
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    return net


def test_activation_parity_with_torch():
    torch = pytest.importorskip("torch")
    net = build_torch_resnet(TINY)
    params = convert_torchvision_resnet(net.state_dict(), TINY)

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        theirs = net(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    theirs_grid = theirs.transpose(0, 2, 3, 1).reshape(2, -1, theirs.shape[1])

    ours = resnet_forward(params, TINY, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), theirs_grid, atol=2e-4)

    pooled = resnet_forward(params, TINY, jnp.asarray(x), pool=True)
    np.testing.assert_allclose(np.asarray(pooled),
                               theirs_grid.mean(axis=1), atol=2e-4)


def test_resnet152_grid_shape():
    """224x224 input must give the 7x7x2048 grid the decoder expects.

    Uses the real 152 spec with a tiny width to keep CPU time sane — the
    spatial geometry (stride stack) is what's under test.
    """
    cfg = ResNetConfig(block_counts=(3, 8, 36, 3), width=4)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 224, 224, 3))
    out = resnet_forward(params, cfg, x)
    assert out.shape == (1, 49, cfg.out_dim)
