"""`tnt towers verify` + convert_towers round-trip.

A locally saved torchvision-shaped state dict goes through
tools/convert_towers.py::convert_resnet to an orbax checkpoint; the
verify command must load it, mark it CONVERTED, and produce the same
activation checksum as an in-memory conversion — proving the offline
convert -> save -> restore -> probe path end to end (VERDICT item 7).
"""
import io
import json
import os
import sys

import numpy as np
import pytest

import jax

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _full_torch_state_dict():
    """torchvision-naming ResNet-152 state dict with random weights,
    built by the independent torch net from test_resnet."""
    pytest.importorskip("torch")
    import torch

    from tell_tpu.models.backbones import ResNetConfig
    from tests.test_resnet import build_torch_resnet

    torch.manual_seed(0)
    cfg = ResNetConfig.resnet152()
    net = build_torch_resnet(cfg)
    return cfg, net.state_dict()


@pytest.mark.slow
def test_convert_towers_roundtrip_and_verify(tmp_path, capsys):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, TOOLS)
    import convert_towers

    cfg, sd = _full_torch_state_dict()
    src = tmp_path / "resnet152.pth"
    torch.save(sd, str(src))
    out = tmp_path / "towers"
    convert_towers.convert_resnet(str(src), str(out))
    capsys.readouterr()

    # in-memory conversion is the ground truth for the checksum
    from tell_tpu.commands.towers import _checksum, verify
    from tell_tpu.models.backbones import (convert_torchvision_resnet,
                                           resnet_forward)
    params = convert_torchvision_resnet(
        {k: v.numpy() for k, v in sd.items()}, cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    want = _checksum(resnet_forward(params, cfg, x, pool=False),
                     resnet_forward(params, cfg, x, pool=True))

    rc = verify(str(out), towers=["resnet152"], as_json=True)
    assert rc == 0
    rows = json.loads(capsys.readouterr().out)
    (row,) = rows
    assert row["status"] == "CONVERTED"
    assert row["checksum"] == want
    assert row["outputs"]["grid"] == [1, 49, 2048]


def test_verify_random_fallback_banner(tmp_path, capsys):
    """Without checkpoints the command still runs, banners UNVERIFIED
    (random init) / NO CHECKPOINT, and exits 0."""
    from tell_tpu.commands.towers import verify
    rc = verify(str(tmp_path / "none"), towers=["mtcnn"], as_json=False)
    out = capsys.readouterr().out
    assert rc == 0
    assert "NO CHECKPOINT" in out
    assert "NOT validated" in out
