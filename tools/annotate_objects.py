#!/usr/bin/env python
"""Offline object detection + crop embedding over article images.

Equivalent of /root/reference/scripts/annotate_yolo3.py:50-231: YOLOv3-SPP
detects objects (conf 0.3, NMS IoU 0.6, <=64 boxes), each box is cropped,
resized to 224x224 and embedded with pooled ResNet-152 -> 2048-d vectors,
stored per image hash in an objects JSONL (the reference's `objects` Mongo
collection; the data pipeline's objects_lookup reads this file).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--images", required=True)
    ap.add_argument("--towers", required=True,
                    help="dir with converted yolov3/ + resnet152/")
    ap.add_argument("--out", required=True, help="objects.jsonl")
    ap.add_argument("--conf", type=float, default=0.3)
    ap.add_argument("--iou", type=float, default=0.6)
    ap.add_argument("--max-objects", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from PIL import Image
    from tell_tpu.models.backbones.resnet import (ResNetConfig,
                                                  resnet_forward)
    from tell_tpu.models.backbones.yolov3 import (nms_fixed,
                                                  yolov3_forward,
                                                  yolov3_spp_module_defs)

    yolo = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(args.towers, "yolov3")))
    resnet = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(os.path.join(args.towers, "resnet152")))
    defs = yolov3_spp_module_defs()
    rcfg = ResNetConfig.resnet152()

    @jax.jit
    def detect(img416):
        dets = yolov3_forward(yolo, defs, img416[None])[0]
        return nms_fixed(dets, args.conf, args.iou,
                         max_det=args.max_objects)

    @jax.jit
    def embed(crops):
        return resnet_forward(resnet, rcfg, crops, pool=True)

    def letterbox(img, size=416):
        # the serving stack's letterbox (centered gray-128, area/BOX
        # downscale, reference yolov3/utils/datasets.py:653-680 semantics)
        # so dataset-build detections match serve-time detections
        from tell_tpu.serving.vision import letterbox as lb
        canvas, r = lb(img, size)
        h, w = img.shape[:2]
        nh = max(int(round(h * r)), 1)
        nw = max(int(round(w * r)), 1)
        top, left = (size - nh) // 2, (size - nw) // 2
        return jnp.asarray(canvas) / 255.0, r, top, left

    seen = set()
    n = 0
    with open(args.articles, encoding="utf-8") as fin, \
            open(args.out, "w", encoding="utf-8") as fout:
        for line in fin:
            if not line.strip():
                continue
            art = json.loads(line)
            for pos in art.get("image_positions", []):
                h = art["parsed_section"][pos].get("hash", "")
                if not h or h in seen:
                    continue
                seen.add(h)
                path = os.path.join(args.images, f"{h}.jpg")
                if not os.path.exists(path):
                    continue
                img = np.asarray(Image.open(path).convert("RGB"), np.float32)
                x, r, top, left = letterbox(img)
                boxes, scores, valid = detect(x)
                nv = int(np.sum(np.asarray(valid)))
                if nv == 0:
                    continue
                h, w = img.shape[:2]
                boxes = (np.asarray(boxes)[:nv]
                         - np.array([left, top, left, top])) / r
                # clip BOTH edges to the image — a detection lying in the
                # letterbox padding otherwise yields an empty crop and a
                # divide-by-zero inside resize
                boxes[:, 0::2] = boxes[:, 0::2].clip(0, w - 1)
                boxes[:, 1::2] = boxes[:, 1::2].clip(0, h - 1)
                crops = []
                for b in boxes:
                    x0, y0, x1, y1 = [int(v) for v in b]
                    x1, y1 = max(x1, x0 + 1), max(y1, y0 + 1)
                    crop = jax.image.resize(
                        jnp.asarray(img[y0:y1, x0:x1]) / 255.0,
                        (224, 224, 3), "linear")
                    mean = jnp.array([0.485, 0.456, 0.406])
                    std = jnp.array([0.229, 0.224, 0.225])
                    crops.append((crop - mean) / std)
                feats = embed(jnp.stack(crops))
                fout.write(json.dumps({
                    "_id": h,
                    "object_features": np.asarray(feats).tolist(),
                    "boxes": boxes.tolist(),
                    "scores": np.asarray(scores)[:nv].tolist(),
                }) + "\n")
                n += 1
    print(f"objects written for {n} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
