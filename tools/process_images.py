#!/usr/bin/env python
"""Resize + center-crop article images to 224x224.

Equivalent of /root/reference/scripts/process_images.py:27-42, matching
its torchvision-functional semantics EXACTLY (any pixel drift moves the
frozen ResNet grid features): shortest side -> 256 with LANCZOS
(torchvision's Image.ANTIALIAS), the scaled long side FLOORED
(``int(size * h / w)``), no-op when the shortest side already equals 256,
center-crop offsets ``int(round((n - 224) / 2))`` (round-half-even), and
JPEG re-encode at PIL defaults (the reference saves with no quality
override).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tell_tpu.data.images import resize_shortest_crop  # noqa: E402


def process_image(src: str, dst: str, resize: int = 256,
                  crop: int = 224) -> bool:
    from PIL import Image
    try:
        img = Image.open(src).convert("RGB")
    except Exception:
        return False
    resize_shortest_crop(img, resize, crop).save(dst)
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="raw image dir")
    ap.add_argument("--out", required=True, help="processed image dir")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    n_ok = n_bad = 0
    for name in sorted(os.listdir(args.images)):
        ok = process_image(os.path.join(args.images, name),
                           os.path.join(args.out, name))
        n_ok += ok
        n_bad += not ok
    print(f"processed {n_ok} images ({n_bad} failed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
