#!/usr/bin/env python
"""Offline face detection + embedding over article images.

Equivalent of /root/reference/scripts/detect_facenet_nytimes.py:47-97 (and
_goodnews): for every image-bearing section, run the MTCNN cascade, embed
the top-K faces (K=10, by detection size) with InceptionResnetV1, and write
`facenet_details` {n_faces, frame_faces (boxes+probs), embeddings} back into
the section — the field the readers select face embeds from.

Runs the JAX ports on whatever backend is active (TPU when available; the
cascade and the embedder are jitted batched programs, replacing the
reference's per-image GPU loop).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_towers(towers_dir: str) -> dict:
    import orbax.checkpoint as ocp
    out = {}
    for name in ("mtcnn", "facenet"):
        path = os.path.abspath(os.path.join(towers_dir, name))
        out[name] = ocp.PyTreeCheckpointer().restore(path)
    return out


def detect_and_embed(towers: dict, img, max_faces: int = 10):
    """img: [H, W, 3] float 0..255. Returns (boxes, probs, embeds, n)."""
    import jax.numpy as jnp
    import numpy as np
    from tell_tpu.models.backbones.facenet import FaceNetConfig, \
        facenet_forward
    from tell_tpu.models.backbones.mtcnn import (MTCNNConfig, detect_faces,
                                                 extract_faces)
    cfg = MTCNNConfig(max_faces=max_faces)
    boxes, probs, valid = detect_faces(towers["mtcnn"], jnp.asarray(img),
                                       cfg)
    crops = extract_faces(jnp.asarray(img), boxes)
    embeds = facenet_forward(towers["facenet"], FaceNetConfig(), crops)
    n = int(np.sum(np.asarray(valid)))
    return (np.asarray(boxes)[:n], np.asarray(probs)[:n],
            np.asarray(embeds)[:n], n)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--articles", required=True)
    ap.add_argument("--images", required=True,
                    help="processed 224x224 image dir, <hash>.jpg")
    ap.add_argument("--towers", required=True,
                    help="dir with converted mtcnn/ + facenet/ checkpoints")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-faces", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image
    towers = load_towers(args.towers)
    n_img = 0
    with open(args.articles, encoding="utf-8") as fin, \
            open(args.out, "w", encoding="utf-8") as fout:
        for line in fin:
            if not line.strip():
                continue
            art = json.loads(line)
            for pos in art.get("image_positions", []):
                section = art["parsed_section"][pos]
                path = os.path.join(args.images,
                                    f"{section.get('hash', '')}.jpg")
                if not os.path.exists(path):
                    continue
                img = np.asarray(Image.open(path).convert("RGB"), np.float32)
                boxes, probs, embeds, n = detect_and_embed(
                    towers, img, args.max_faces)
                if n == 0:
                    continue
                section["facenet_details"] = {
                    "n_faces": n,
                    "frame_faces": [
                        {"bbox": boxes[i].tolist(),
                         "confidence": float(probs[i])} for i in range(n)],
                    "embeddings": embeds.tolist(),
                }
                n_img += 1
            fout.write(json.dumps(art) + "\n")
    print(f"faces written for {n_img} images")
    return 0


if __name__ == "__main__":
    sys.exit(main())
