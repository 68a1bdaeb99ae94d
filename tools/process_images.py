#!/usr/bin/env python
"""Resize + center-crop article images to 224x224.

Equivalent of /root/reference/scripts/process_images.py:27-42 (shortest
side -> 256 bicubic, center crop 224), writing JPEGs to --out so the data
pipeline's image_grid_fn / the serving stack can load fixed-size inputs.
"""
from __future__ import annotations

import argparse
import os
import sys


def process_image(src: str, dst: str, resize: int = 256,
                  crop: int = 224) -> bool:
    from PIL import Image
    try:
        img = Image.open(src).convert("RGB")
    except Exception:
        return False
    w, h = img.size
    if w < h:
        nw, nh = resize, int(round(h * resize / w))
    else:
        nw, nh = int(round(w * resize / h)), resize
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - crop) // 2
    top = (nh - crop) // 2
    img = img.crop((left, top, left + crop, top + crop))
    img.save(dst, "JPEG", quality=95)
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
