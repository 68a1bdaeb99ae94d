#!/usr/bin/env python
"""Convert the four pretrained frozen towers to orbax checkpoints.

The reference pulls pretrained weights at runtime from torch.hub /
torchvision / facenet-pytorch / pjreddie's darknet binary
(SURVEY.md §2.2). We convert once, offline, into the param-pytree layouts of
tell_tpu.models.backbones and store them under <out>/towers/<name> so the
CLI (`tnt train/serve`) and the serving stack load them with orbax.

Usage:
  python tools/convert_towers.py --out data/towers \
      [--roberta roberta-large-dir-or-hf-name] \
      [--resnet resnet152.pth] [--facenet vggface2.pt] \
      [--yolo-cfg yolov3-spp.cfg --yolo-weights yolov3-spp.weights] \
      [--mtcnn pnet.pt rnet.pt onet.pt]

Each tower is optional — convert what you have. Activation-parity tests for
every converter live in tests/test_{roberta,resnet,facenet,yolov3,mtcnn}.py.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _save(tree, out_dir: str, name: str) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(out_dir, name))
    ocp.PyTreeCheckpointer().save(path, tree, force=True)
    print(f"wrote {path}")


def convert_roberta(src: str, out: str) -> None:
    from tell_tpu.models.backbones.roberta import (RobertaConfig,
                                                   convert_hf_roberta)
    try:
        import transformers
        model = transformers.RobertaModel.from_pretrained(src)
        sd = model.state_dict()
    except Exception:
        import torch
        sd = torch.load(src, map_location="cpu")
    params = convert_hf_roberta({k: v.numpy() for k, v in sd.items()},
                                RobertaConfig.large())
    _save(params, out, "roberta")


def convert_resnet(src: str, out: str) -> None:
    import torch
    from tell_tpu.models.backbones.resnet import (ResNetConfig,
                                                  convert_torchvision_resnet)
    sd = torch.load(src, map_location="cpu")
    params = convert_torchvision_resnet(
        {k: v.numpy() for k, v in sd.items()}, ResNetConfig.resnet152())
    _save(params, out, "resnet152")


def convert_facenet(src: str, out: str) -> None:
    import torch
    from tell_tpu.models.backbones.facenet import (FaceNetConfig,
                                                   convert_facenet)
    sd = torch.load(src, map_location="cpu")
    params = convert_facenet({k: v.numpy() for k, v in sd.items()},
                             FaceNetConfig())
    _save(params, out, "facenet")


def convert_vit(src: str, out: str) -> None:
    from tell_tpu.models.backbones.vit import ViTConfig, convert_hf_vit
    try:
        import transformers
        model = transformers.ViTModel.from_pretrained(src)
        sd = model.state_dict()
    except Exception:
        import torch
        sd = torch.load(src, map_location="cpu")
    params = convert_hf_vit({k: v.numpy() for k, v in sd.items()},
                            ViTConfig.large())
    _save(params, out, "vit")


def convert_yolo(cfg_path: str, weights_path: str, out: str) -> None:
    from tell_tpu.models.backbones.yolov3 import (load_darknet_weights,
                                                  parse_darknet_cfg)
    with open(cfg_path) as f:
        defs = parse_darknet_cfg(f.read())
    params = load_darknet_weights(defs, weights_path)
    _save(params, out, "yolov3")


def convert_mtcnn(paths: list[str], out: str) -> None:
    import torch
    from tell_tpu.models.backbones.mtcnn import convert_mtcnn
    sds = [torch.load(p, map_location="cpu") for p in paths]
    params = convert_mtcnn(*[{k: v.numpy() for k, v in sd.items()}
                             for sd in sds])
    _save(params, out, "mtcnn")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--roberta")
    ap.add_argument("--resnet")
    ap.add_argument("--facenet")
    ap.add_argument("--yolo-cfg")
    ap.add_argument("--yolo-weights")
    ap.add_argument("--mtcnn", nargs=3)
    ap.add_argument("--vit", help="HF name/dir or state-dict .pth "
                    "(google/vit-large-patch16-224)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    if args.roberta:
        convert_roberta(args.roberta, args.out)
    if args.vit:
        convert_vit(args.vit, args.out)
    if args.resnet:
        convert_resnet(args.resnet, args.out)
    if args.facenet:
        convert_facenet(args.facenet, args.out)
    if args.yolo_cfg and args.yolo_weights:
        convert_yolo(args.yolo_cfg, args.yolo_weights, args.out)
    if args.mtcnn:
        convert_mtcnn(args.mtcnn, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
