"""Model-family registry.

The reference dispatches on AllenNLP registry names
(`transformer_faces_objects`, `transformer_pointer`, ..., SURVEY.md §2.3).
We map those names onto (config, init, loss, generate) adapters over the
two underlying config-driven implementations: the multi-context captioner
(context subsets express the faces/flattened/no_image/glove variants) and
the pointer models. The LSTM baseline (baseline_glove / lstm_decoder_
flattened) has its own decoder module.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

from ..config import CaptionerConfig


@dataclasses.dataclass(frozen=True)
class ModelAdapter:
    name: str
    config: Any                       # the model config object
    init: Callable                    # init(rng, cfg) -> params
    loss: Callable                    # loss(params, cfg, batch, rng, det)
    loss_e2e: Callable | None         # incl. frozen towers, or None
    generate: Callable                # generate(params, cfg, batch, ...)


def _captioner(cfg: CaptionerConfig) -> ModelAdapter:
    from .captioner import (captioner_loss, captioner_loss_e2e, generate,
                            init_captioner)
    return ModelAdapter(
        name="captioner", config=cfg, init=init_captioner,
        loss=captioner_loss,
        loss_e2e=captioner_loss_e2e,
        generate=generate)


def _pointer(cfg: CaptionerConfig, version: int) -> ModelAdapter:
    from .pointer import (PointerConfig, init_pointer, pointer_generate,
                          pointer_loss)
    pcfg = PointerConfig(captioner=cfg, copy_loss_version=version)

    def loss(params, c, batch, rng=None, deterministic=True):
        return pointer_loss(params, c, batch, rng, deterministic)

    def loss_e2e(params, frozen, c, batch, rng=None, deterministic=True):
        from .captioner import encode_contexts
        return pointer_loss(params, c, encode_contexts(frozen, c.captioner,
                                                       batch),
                            rng, deterministic)

    return ModelAdapter(
        name=f"pointer_v{version}", config=pcfg, init=init_pointer,
        loss=loss, loss_e2e=loss_e2e, generate=pointer_generate)


def _lstm(cfg: CaptionerConfig) -> ModelAdapter:
    from .lstm_decoder import (init_lstm_captioner, lstm_captioner_loss,
                               lstm_generate)
    return ModelAdapter(
        name="lstm", config=cfg, init=init_lstm_captioner,
        loss=lstm_captioner_loss, loss_e2e=None, generate=lstm_generate)


# reference registry names (tell/models/*.py Model.register calls) →
# adapter factories. The context subset comes from the YAML `contexts`.
def get_model(model_type: str, cfg: CaptionerConfig) -> ModelAdapter:
    mt = model_type.lower()
    if mt in ("captioner", "transformer_faces_objects", "transformer_faces",
              "transformer_flattened", "transformer_glove"):
        return _captioner(cfg)
    if mt in ("pointer", "transformer_pointer"):
        return _pointer(cfg, 1)
    if mt in ("pointer_2", "transformer_pointer_2"):
        return _pointer(cfg, 2)
    if mt in ("lstm", "baseline_glove", "lstm_decoder_flattened"):
        return _lstm(cfg)
    raise KeyError(f"unknown model_type {model_type!r}")
