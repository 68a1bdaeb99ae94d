"""`tnt towers verify <dir>` — frozen-tower conversion smoke path.

Loads each converted tower checkpoint (written by tools/convert_towers.py
under <dir>/<name>), runs a fixed deterministic probe input through it,
and prints a per-tower manifest: parameter count, probe output shapes,
and an activation checksum. Comparing checksums against the documented
values for the published pretrained weights (docs/towers.md) validates a
real-weight conversion end to end — the activation-parity tests
(tests/test_{resnet,roberta,facenet,mtcnn,yolov3}.py) prove converter
correctness on random weights; this command proves a *specific
checkpoint* round-tripped.

Towers without a checkpoint fall back to random initialization where an
init function exists (resnet152, roberta, vit, yolov3) and are banner-ed
UNVERIFIED (random init); facenet/mtcnn are converter-only (their param
layout is defined by the torch state dict) and report NO CHECKPOINT.

Reference analogue: the reference downloads weights at runtime
(tell/models/resnet.py:120-126 torchvision URLs, torch.hub RoBERTa,
tell/facenet/data/*.pt) and has no conversion validation at all.
"""
from __future__ import annotations

import hashlib
import json
import os

import numpy as np


def _checksum(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        a = np.asarray(a, np.float64)
        h.update(str(a.shape).encode())
        # round so fp32 reassociation noise across backends doesn't flip
        # the digest; 1e-3 absolute is far below any real weight change
        h.update(np.round(a, 3).tobytes())
    return h.hexdigest()[:16]


def _param_count(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree)
               if hasattr(x, "shape"))


def _try_restore(dir_: str, name: str):
    path = os.path.abspath(os.path.join(dir_, name))
    if not os.path.isdir(path):
        return None
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer().restore(path)


def _probe_resnet(params):
    import jax
    from ..models.backbones.resnet import (ResNetConfig, init_resnet,
                                           resnet_forward)
    cfg = ResNetConfig.resnet152()
    status = "CONVERTED"
    if params is None:
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        status = "UNVERIFIED (random init)"
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 224, 224, 3))
    grid = resnet_forward(params, cfg, x, pool=False)
    pooled = resnet_forward(params, cfg, x, pool=True)
    return status, params, {"grid": grid, "pooled": pooled}


def _probe_roberta(params):
    import jax
    from ..models.backbones.roberta import (RobertaConfig, init_roberta,
                                            roberta_encode)
    cfg = RobertaConfig.large()
    status = "CONVERTED"
    if params is None:
        params = init_roberta(jax.random.PRNGKey(0), cfg)
        status = "UNVERIFIED (random init)"
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 4, 1000)
    h = roberta_encode(params, cfg, ids, return_all_hiddens=True)
    return status, params, {"hiddens": h}


def _probe_vit(params):
    import jax
    from ..models.backbones.vit import ViTConfig, init_vit, vit_encode
    cfg = ViTConfig()
    status = "CONVERTED"
    if params is None:
        params = init_vit(jax.random.PRNGKey(0), cfg)
        status = "UNVERIFIED (random init)"
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.image_size, cfg.image_size, 3))
    out = vit_encode(params, cfg, x)
    return status, params, {"features": out}


def _probe_yolov3(params):
    import jax
    from ..models.backbones.yolov3 import (init_yolov3, yolov3_forward,
                                           yolov3_spp_module_defs)
    defs = yolov3_spp_module_defs()
    status = "CONVERTED"
    if params is None:
        params = init_yolov3(jax.random.PRNGKey(0), defs)
        status = "UNVERIFIED (random init)"
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 3))
    preds = yolov3_forward(params, defs, x)
    out = preds[0] if isinstance(preds, (tuple, list)) else preds
    return status, params, {"preds": out}


def _probe_facenet(params):
    import jax
    from ..models.backbones.facenet import FaceNetConfig, facenet_forward
    if params is None:
        return "NO CHECKPOINT (converter-only tower)", None, {}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 160, 160, 3))
    emb = facenet_forward(params, FaceNetConfig(), x)
    return "CONVERTED", params, {"embedding": emb}


def _probe_mtcnn(params):
    import jax
    from ..models.backbones.mtcnn import (onet_forward, pnet_forward,
                                          rnet_forward)
    if params is None:
        return "NO CHECKPOINT (converter-only tower)", None, {}
    k = jax.random.PRNGKey(1)
    outs = {}
    outs["pnet"] = pnet_forward(params["pnet"],
                                jax.random.normal(k, (1, 12, 12, 3)))[0]
    outs["rnet"] = rnet_forward(params["rnet"],
                                jax.random.normal(k, (1, 24, 24, 3)))[0]
    outs["onet"] = onet_forward(params["onet"],
                                jax.random.normal(k, (1, 48, 48, 3)))[0]
    return "CONVERTED", params, outs


PROBES = {
    "resnet152": _probe_resnet,
    "roberta": _probe_roberta,
    "facenet": _probe_facenet,
    "mtcnn": _probe_mtcnn,
    "yolov3": _probe_yolov3,
    "vit": _probe_vit,
}


def verify(dir_: str, towers: list[str] | None = None,
           as_json: bool = False) -> int:
    names = towers or list(PROBES)
    rows = []
    for name in names:
        probe = PROBES[name]
        params = _try_restore(dir_, name)
        try:
            status, params, outs = probe(params)
        except Exception as e:  # a broken checkpoint should not stop others
            rows.append({"tower": name, "status": f"ERROR: {e}"})
            continue
        row = {"tower": name, "status": status}
        if params is not None:
            row["params"] = _param_count(params)
            row["outputs"] = {k: list(np.asarray(v).shape)
                              for k, v in outs.items()}
            row["checksum"] = _checksum(*outs.values())
        rows.append(row)
    if as_json:
        print(json.dumps(rows, indent=1))
    else:
        for r in rows:
            pc = f"{r['params'] / 1e6:8.1f}M" if "params" in r else " " * 9
            shapes = " ".join(f"{k}{tuple(s)}"
                              for k, s in r.get("outputs", {}).items())
            print(f"{r['tower']:<10} {pc} {r.get('checksum', ''):<16} "
                  f"{r['status']}  {shapes}")
        if any("UNVERIFIED" in r["status"] or "NO CHECKPOINT" in r["status"]
               for r in rows):
            print("\nNOTE: towers without a converted checkpoint are NOT "
                  "validated against pretrained weights. Convert with "
                  "tools/convert_towers.py, then compare checksums with "
                  "docs/towers.md.")
    return 0 if all("ERROR" not in r["status"] for r in rows) else 1
