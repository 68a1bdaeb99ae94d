"""Serving vision pipeline (serving/vision.py): the reference worker's
on-request ResNet-grid / MTCNN+FaceNet / YOLO+ResNet staging
(captioner.py:178-362) recomposed from the converted towers."""
import base64
import io

import numpy as np
import pytest

import jax

from tell_tpu.serving.vision import (VisionPipeline, center_crop_224,
                                     decode_request_image, letterbox)


def test_decode_request_image_forms():
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    rgb = (np.random.RandomState(0).rand(20, 30, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    out = decode_request_image({"image_b64": b64})
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out, rgb.astype(np.float32))  # PNG lossless

    out = decode_request_image({"image": rgb.tolist()})
    assert out.shape == (20, 30, 3)
    assert decode_request_image({"context": "x"}) is None


def test_letterbox_and_crop_shapes():
    pytest.importorskip("PIL")
    img = np.full((100, 300, 3), 200.0, np.float32)
    canvas, scale = letterbox(img, 416)
    assert canvas.shape == (416, 416, 3)
    assert abs(scale - 416 / 300) < 1e-6
    # reference letterbox semantics (yolov3/utils/datasets.py:653-680):
    # gray-128 padding, content CENTERED vertically
    nh = int(round(100 * scale))
    top = (416 - nh) // 2
    assert canvas[top:top + nh, :, :].mean() > 150  # content
    assert (canvas[:top - 1, :, :] == 128.0).all()  # centered gray pad
    assert (canvas[top + nh + 1:, :, :] == 128.0).all()

    crop = center_crop_224(np.zeros((260, 500, 3), np.float32))
    assert crop.shape == (224, 224, 3)


def test_resize_shortest_crop_matches_torchvision_semantics():
    """Pixel-exact oracle for the dataset image pipeline: torchvision's
    F.resize(img, 256, ANTIALIAS) + F.center_crop(img, (224, 224))
    (scripts/process_images.py:37-39) re-derived step-for-step — floored
    long side, LANCZOS, shortest-side-already-256 early return,
    round-half-even crop offsets."""
    from PIL import Image

    from tell_tpu.data.images import resize_shortest_crop

    def oracle(img, size=256, crop=224):
        w, h = img.size
        if not ((w <= h and w == size) or (h <= w and h == size)):
            if w < h:
                ow, oh = size, int(size * h / w)
            else:
                ow, oh = int(size * w / h), size
            img = img.resize((ow, oh), Image.Resampling.LANCZOS)
        w, h = img.size
        i = int(round((h - crop) / 2.0))
        j = int(round((w - crop) / 2.0))
        return img.crop((j, i, j + crop, i + crop))

    rng = np.random.RandomState(0)
    # adversarial sizes: floor-vs-round on the scaled side (513/512 ->
    # 256.5), odd crop diffs (round-half-even offsets), exact-256
    # shortest side (early return skips the resample entirely), upscale
    for (w, h) in [(512, 513), (513, 512), (333, 500), (500, 333),
                   (256, 401), (401, 256), (257, 449), (120, 300),
                   (224, 224), (640, 480)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        got = np.asarray(resize_shortest_crop(img))
        want = np.asarray(oracle(img))
        assert got.shape == (224, 224, 3), (w, h)
        np.testing.assert_array_equal(got, want, err_msg=f"size {(w, h)}")

    # serve-time center_crop_224 must ride the same code path
    arr = rng.randint(0, 256, (449, 257, 3), dtype=np.uint8)
    got = center_crop_224(arr.astype(np.float32))
    want = np.asarray(oracle(Image.fromarray(arr)), np.float32)
    np.testing.assert_array_equal(got, want)


def test_grid_stage_with_small_resnet():
    pytest.importorskip("PIL")
    from tell_tpu.models.backbones.resnet import ResNetConfig, init_resnet
    rcfg = ResNetConfig(block_counts=(1, 1, 1, 1), width=8)
    frozen = {"resnet": init_resnet(jax.random.PRNGKey(0), rcfg),
              "resnet_cfg": rcfg}
    vp = VisionPipeline(frozen)
    assert vp.has_grid and not vp.has_faces and not vp.has_objects
    img = (np.random.RandomState(1).rand(224, 224, 3) * 255).astype(
        np.float32)
    grid = vp.grid(img)
    assert grid.shape == (49, rcfg.out_dim)
    assert np.isfinite(grid).all()

    out = vp.process({"image": img.tolist()})
    assert set(out) == {"image_grid"}
    # precomputed features win: process must not recompute
    assert vp.process({"image": img.tolist(),
                       "image_grid": [[0.0]]}) == {}


def test_service_uses_vision_features(monkeypatch):
    """A raw-image request flows through VisionPipeline.process and the
    computed grid lands in the packed batch."""
    import dataclasses
    import pathlib
    import tempfile
    import jax.numpy as jnp
    from tell_tpu.config import small_test_config, ContextSpec
    from tell_tpu.models import init_captioner
    from tell_tpu.models.backbones import RobertaConfig, init_roberta
    from tell_tpu.serving.server import CaptionService
    from tell_tpu.data.tokenizer import RobertaTokenizer
    from tests.test_tokenizer import build_synthetic_vocab

    cfg = dataclasses.replace(small_test_config(), gen_len=3)
    dec = dataclasses.replace(cfg.decoder, contexts=(
        ContextSpec("image", 2048, 49), ContextSpec("article", 24, 16)))
    cfg = dataclasses.replace(cfg, decoder=dec)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    rcfg = RobertaConfig(vocab_size=dec.vocab_size, dim=24, num_layers=2,
                         num_heads=4, ffn_dim=32, max_positions=40)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(1), rcfg),
              "roberta_cfg": rcfg}
    vf, mf = build_synthetic_vocab(pathlib.Path(tempfile.mkdtemp()))
    tok = RobertaTokenizer.from_files(vf, mf, max_len=16)
    svc = CaptionService(params, frozen, cfg, tok, max_batch=2,
                         article_len=16)

    sentinel = np.full((49, 2048), 7.0, np.float32)

    class FakeVision:
        def process(self, req):
            return {"image_grid": sentinel} if "image" in req else {}

    monkeypatch.setattr(svc, "vision", FakeVision())
    batch, _ = svc._pack([{"context": "news", "image": [[[0, 0, 0]]]},
                          {"context": "more"}])
    np.testing.assert_array_equal(batch["image_grid"][0], sentinel)
    assert batch["image_grid"][1].max() == 0.0
