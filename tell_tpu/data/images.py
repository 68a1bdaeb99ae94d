"""Reference-exact image preprocessing shared by the dataset pipeline
(tools/process_images.py) and the serving stack (serving/vision.py).

Matches /root/reference/scripts/process_images.py:27-42 — torchvision
``F.resize(img, 256, Image.ANTIALIAS)`` + ``F.center_crop(img, (224,
224))`` — pixel-for-pixel: LANCZOS resample (ANTIALIAS is its old PIL
alias), the scaled long side FLOORED (``int(size * h / w)``), a no-op
when the shortest side already equals the target, and center-crop
offsets ``int(round((n - crop) / 2))`` (Python round-half-even). Any
drift here moves the frozen ResNet grid features, and serve-time grids
must match train-time grids.
"""
from __future__ import annotations


def resize_shortest_crop(img, resize: int = 256, crop: int = 224):
    """PIL Image -> PIL Image: shortest side to `resize`, center `crop`."""
    from PIL import Image
    w, h = img.size
    if not ((w <= h and w == resize) or (h <= w and h == resize)):
        if w < h:
            nw, nh = resize, int(resize * h / w)
        else:
            nw, nh = int(resize * w / h), resize
        img = img.resize((nw, nh), Image.Resampling.LANCZOS)
    w, h = img.size
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return img.crop((left, top, left + crop, top + crop))
