"""YAML experiment configs -> typed dataclasses.

Keeps the reference's "one YAML per experiment, plus --overrides JSON merge"
surface (/root/reference/tell/commands/train.py:67-77) but maps onto frozen
dataclasses instead of a string registry: unknown keys fail loudly, and the
configs hash (jit static args).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field

import yaml

from .config import (CaptionerConfig, ContextSpec, DecoderConfig,
                     FACES_CONTEXTS, FACES_OBJECTS_CONTEXTS,
                     FLATTENED_CONTEXTS, NO_IMAGE_CONTEXTS)
from .data.bucketing import BucketingConfig
from .data.readers import ReaderConfig
from .training.trainer import TrainerConfig

CONTEXT_PRESETS = {
    "faces_objects": FACES_OBJECTS_CONTEXTS,
    "faces": FACES_CONTEXTS,
    "flattened": FLATTENED_CONTEXTS,
    "no_image": NO_IMAGE_CONTEXTS,
}


@dataclass
class DataConfig:
    shards_dir: str = "data/shards"
    articles_jsonl: str = ""
    # preprocess image features: a dir of precomputed <hash>.npy grids, or
    # raw <hash>.jpg images embedded through the converted ResNet-152
    # (data/pipeline.py::make_image_grid_fn)
    images_dir: str = ""
    # per-hash object store from tools/annotate_objects.py (the reference's
    # `objects` Mongo collection); empty = no object features in the shards
    objects_jsonl: str = ""
    vocab_file: str = "data/vocab.json"
    merges_file: str = "data/merges.txt"
    seed: int = 1234
    instances_per_epoch: int | None = 65536
    val_limit: int | None = None
    # frozen article tower: "large" (the real model), "base", or "tiny"
    # (2-layer smoke-test tower for CI/CPU runs)
    roberta: str = "large"
    # GloVe vectors file for the glove experiments (expts 1-2); when set,
    # preprocess materializes [S, 300] article features into the shards
    glove_file: str = ""


@dataclass
class ExperimentConfig:
    name: str = "experiment"
    # reference registry name (SURVEY.md §2.3): transformer_faces_objects /
    # transformer_faces / transformer_flattened / transformer_glove /
    # baseline_glove / transformer_pointer / transformer_pointer_2
    model_type: str = "captioner"
    model: CaptionerConfig = field(default_factory=CaptionerConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    data: DataConfig = field(default_factory=DataConfig)
    reader: ReaderConfig = field(default_factory=ReaderConfig)
    bucketing: BucketingConfig = field(default_factory=BucketingConfig)


def _build(cls, spec: dict, path: str):
    if spec is None:
        return cls()
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in spec.items():
        if key not in fields:
            raise KeyError(f"unknown config key {path}.{key} for"
                           f" {cls.__name__}")
        ftype = fields[key].type
        if key == "contexts" and isinstance(value, str):
            value = CONTEXT_PRESETS[value]
        elif key == "contexts" and isinstance(value, list):
            value = tuple(ContextSpec(**c) for c in value)
        elif key == "decoder":
            value = _build(DecoderConfig, value, f"{path}.decoder")
        elif isinstance(value, list):
            value = tuple(tuple(v) if isinstance(v, list) else v
                          for v in value)
        kwargs[key] = value
    return cls(**kwargs)


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_experiment(path: str, overrides: str | dict | None = None
                    ) -> ExperimentConfig:
    with open(path, encoding="utf-8") as f:
        spec = yaml.safe_load(f) or {}
    if overrides:
        if isinstance(overrides, str):
            overrides = json.loads(overrides)
        spec = _deep_merge(spec, overrides)
    model_type = spec.get("model_type", "captioner")
    if model_type.lower() in ("modern", "transformer_modern", "vit_modern"):
        from .models.llm_decoder import LLMConfig
        model_cls = LLMConfig
    else:
        model_cls = CaptionerConfig
    return ExperimentConfig(
        name=spec.get("name", "experiment"),
        model_type=model_type,
        model=_build(model_cls, spec.get("model"), "model"),
        trainer=_build(TrainerConfig, spec.get("trainer"), "trainer"),
        data=_build(DataConfig, spec.get("data"), "data"),
        reader=_build(ReaderConfig, spec.get("reader"), "reader"),
        bucketing=_build(BucketingConfig, spec.get("bucketing"), "bucketing"),
    )
