"""On-request vision feature extraction for the caption service.

The reference's CaptioningWorker computes, per request image: the
ResNet-152 grid (captioner.py:178-230), the top-4 MTCNN+FaceNet face
embeddings (get_faces, captioner.py:291-303), and up to 64 YOLOv3-detected
object crops embedded with pooled ResNet (get_objects, captioner.py:
305-362). This module is the TPU-native equivalent: each stage is one
jitted fixed-shape program over a letterboxed canvas (XLA-friendly static
shapes; the MTCNN pyramid scales are static per canvas size), composed
from the converted towers in `models/backbones/`.

A stage is active only when its towers are present in the frozen dict
(grid: resnet; faces: mtcnn+facenet; objects: yolov3+resnet) — requests
carrying precomputed features always win.
"""
from __future__ import annotations

import base64
import io

import jax
import jax.numpy as jnp
import numpy as np

DET_CANVAS = 416  # detection canvas (YOLO's letterbox size; MTCNN reuses it)


def decode_request_image(req: dict) -> np.ndarray | None:
    """Pull a raw image out of a request: `image_b64` (encoded JPEG/PNG)
    or `image` (nested [H, W, 3] list / array, uint8 range). Returns
    float32 [H, W, 3] in 0..255, or None."""
    if "image_b64" in req:
        from PIL import Image
        raw = base64.b64decode(req["image_b64"])
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img, np.float32)
    if "image" in req:
        arr = np.asarray(req["image"], np.float32)
        if arr.ndim == 3 and arr.shape[-1] == 3:
            return arr
    return None


def letterbox(img: np.ndarray, size: int) -> tuple[np.ndarray, float]:
    """Aspect-preserving resize onto a size x size gray (128) canvas with
    CENTERED padding, matching the reference's YOLO letterbox
    (yolov3/utils/datasets.py:653-680: cv2.INTER_AREA resize, color 128,
    dw/2 each side) and tools/annotate_objects.py. cv2.INTER_AREA is an
    area average only when shrinking — on upscale it falls back to a
    bilinear-like tap — so we pick PIL's filter per direction: BOX
    (area average) when scale < 1, BILINEAR when enlarging small images
    up to the canvas. We keep the full square canvas where the
    reference's auto=True pads to a 32-multiple rectangle — a
    static-shape requirement under jit; detections are unaffected (the
    extra padding is uniform gray). Returns (canvas float32
    [size, size, 3], scale original->canvas); box coords stay in canvas
    space (crops are cut from the canvas), so offsets need no unmapping
    here."""
    from PIL import Image
    h, w = img.shape[:2]
    scale = size / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    filt = (Image.Resampling.BOX if scale < 1.0
            else Image.Resampling.BILINEAR)
    im = Image.fromarray(img.astype(np.uint8)).resize((nw, nh), filt)
    canvas = np.full((size, size, 3), 128.0, np.float32)
    top, left = (size - nh) // 2, (size - nw) // 2
    canvas[top:top + nh, left:left + nw] = np.asarray(im, np.float32)
    return canvas, scale


def center_crop_224(img: np.ndarray) -> np.ndarray:
    """Resize shortest side to 256 then center-crop 224 with the dataset
    pipeline's EXACT semantics (tools/process_images.py ==
    scripts/process_images.py:27-42): LANCZOS, floored long side,
    round-half-even crop offsets — serve-time grids must match
    train-time grids pixel-for-pixel."""
    from PIL import Image
    from ..data.images import resize_shortest_crop
    im = resize_shortest_crop(Image.fromarray(img.astype(np.uint8)))
    return np.asarray(im, np.float32)


class VisionPipeline:
    """Jitted per-stage feature extraction from raw request images."""

    def __init__(self, frozen: dict, max_faces: int = 4,
                 max_objects: int = 64,
                 wanted: dict | None = None):
        """wanted: the serving model's context capacities ({"image": n,
        "faces": n, "obj": n}); a stage whose context is absent from the
        model (n == 0) is disabled even when its towers are on disk —
        otherwise every raw-image request pays an MTCNN/YOLO jit whose
        output the packer drops."""
        self.frozen = frozen
        self.max_faces = max_faces
        self.max_objects = max_objects

        def want(key):
            return wanted is None or wanted.get(key, 0) > 0

        self.has_grid = "resnet" in frozen and want("image")
        self.has_faces = ("mtcnn" in frozen and "facenet" in frozen
                          and want("faces"))
        self.has_objects = ("yolov3" in frozen and "resnet" in frozen
                            and want("obj"))
        self._grid_fn = None
        self._faces_fn = None
        self._objects_fn = None

    # ---- stages (lazily jitted; static canvas shapes) ----

    def grid(self, img224: np.ndarray) -> np.ndarray:
        """[224, 224, 3] 0..255 -> [49, 2048] ResNet-152 grid."""
        if self._grid_fn is None:
            from ..models.backbones.resnet import (preprocess_image,
                                                   resnet_forward)

            def f(p, img):
                x = preprocess_image(img[None] / 255.0)
                return resnet_forward(p, self.frozen["resnet_cfg"], x,
                                      pool=False)[0]
            self._grid_fn = jax.jit(f)
        return np.asarray(self._grid_fn(self.frozen["resnet"],
                                        jnp.asarray(img224)))

    def faces(self, canvas: np.ndarray) -> np.ndarray:
        """[DET, DET, 3] 0..255 -> [max_faces, 512], NaN rows = absent
        (top-4-by-size semantics of captioner.py:291-303)."""
        if self._faces_fn is None:
            from ..models.backbones.facenet import (FaceNetConfig,
                                                    facenet_forward)
            from ..models.backbones.mtcnn import (MTCNNConfig, detect_faces,
                                                  extract_faces)

            def f(mt, fn, img):
                boxes, probs, valid = detect_faces(
                    mt, img, MTCNNConfig(max_faces=self.max_faces))
                crops = extract_faces(img, boxes)
                emb = facenet_forward(fn, FaceNetConfig(), crops)
                return jnp.where(valid[:, None], emb, jnp.nan)
            self._faces_fn = jax.jit(f)
        return np.asarray(self._faces_fn(self.frozen["mtcnn"],
                                         self.frozen["facenet"],
                                         jnp.asarray(canvas)))

    def objects(self, canvas: np.ndarray) -> np.ndarray:
        """[DET, DET, 3] 0..255 -> [max_objects, 2048], NaN rows = absent
        (YOLO conf 0.3 / IoU 0.6, pooled-ResNet crop embeds,
        captioner.py:305-362)."""
        if self._objects_fn is None:
            from ..models.backbones.resnet import (preprocess_image,
                                                   resnet_forward)
            from ..models.backbones.yolov3 import (nms_fixed,
                                                   yolov3_forward,
                                                   yolov3_spp_module_defs,
                                                   crop_and_resize)
            defs = self.frozen.get("yolov3_defs") or yolov3_spp_module_defs()

            def f(yp, rp, img):
                dets = yolov3_forward(yp, defs, img[None] / 255.0)[0]
                boxes, scores, valid = nms_fixed(
                    dets, 0.3, 0.6, max_det=self.max_objects)
                crops = crop_and_resize(img, boxes, 224)
                x = preprocess_image(crops / 255.0)
                emb = resnet_forward(rp, self.frozen["resnet_cfg"], x,
                                     pool=True)
                return jnp.where(valid[:, None], emb, jnp.nan)
            self._objects_fn = jax.jit(f)
        return np.asarray(self._objects_fn(self.frozen["yolov3"],
                                           self.frozen["resnet"],
                                           jnp.asarray(canvas)))

    # ---- request-level entry ----

    def process(self, req: dict) -> dict:
        """Compute any of image_grid / face_embeds / obj_embeds that the
        request needs and the towers can provide. Returns only the newly
        computed keys."""
        img = decode_request_image(req)
        if img is None:
            return {}
        out = {}
        if self.has_grid and "image_grid" not in req:
            out["image_grid"] = self.grid(center_crop_224(img))
        if (self.has_faces or self.has_objects):
            canvas, _ = letterbox(img, DET_CANVAS)
            if self.has_faces and "face_embeds" not in req:
                out["face_embeds"] = self.faces(canvas)
            if self.has_objects and "obj_embeds" not in req:
                out["obj_embeds"] = self.objects(canvas)
        return out
