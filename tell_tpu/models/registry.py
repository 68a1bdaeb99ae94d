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
    # encode(frozen, batch) -> batch with frozen-tower features added
    encode: Callable | None = None
    # beam(params, cfg, batch, beam_size) -> {"token_ids": [B,K,T], ...}
    # None = greedy only (the reference decodes pointer/LSTM greedily too)
    beam: Callable | None = None


def _captioner(cfg: CaptionerConfig) -> ModelAdapter:
    from .captioner import (captioner_loss, captioner_loss_e2e,
                            encode_contexts, generate, init_captioner)
    from .beam import beam_search
    return ModelAdapter(
        name="captioner", config=cfg, init=init_captioner,
        loss=captioner_loss,
        loss_e2e=captioner_loss_e2e,
        generate=generate,
        encode=lambda frozen, batch: encode_contexts(frozen, cfg, batch),
        beam=beam_search)


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

    def encode(frozen, batch):
        from .captioner import encode_contexts
        return encode_contexts(frozen, pcfg.captioner, batch)

    return ModelAdapter(
        name=f"pointer_v{version}", config=pcfg, init=init_pointer,
        loss=loss, loss_e2e=loss_e2e, generate=pointer_generate,
        encode=encode)


def _modern(cfg, vit: bool = False) -> ModelAdapter:
    from .llm_decoder import (LLMConfig, VIT_CONTEXTS, init_llm_decoder,
                              llm_beam_search, llm_generate, llm_loss,
                              llm_loss_e2e, modern_encode_contexts)
    if isinstance(cfg, CaptionerConfig):
        # allow reusing a captioner YAML: carry over the context tuple and
        # every shared token-level hyper-parameter (dropping vocab/pad ids
        # would silently train against a different vocabulary)
        d = cfg.decoder
        contexts = d.contexts
        if vit and any(c.name == "image" and c.kv_dim == 2048
                       for c in contexts):
            # a ViT tower emits 1024-d patch tokens; swap out the flagship
            # ResNet 2048-d grid spec (custom/test context tuples with
            # other dims are left to the caller)
            contexts = VIT_CONTEXTS
        cfg = LLMConfig(contexts=contexts, gen_len=cfg.gen_len,
                        vocab_size=d.vocab_size, pad_id=d.pad_id,
                        bos_id=d.bos_id, eos_id=d.eos_id,
                        max_target_positions=d.max_target_positions)
    return ModelAdapter(
        name="modern", config=cfg, init=init_llm_decoder,
        loss=llm_loss, loss_e2e=llm_loss_e2e, generate=llm_generate,
        encode=lambda frozen, batch: modern_encode_contexts(frozen, cfg,
                                                            batch),
        beam=llm_beam_search)


def _lstm(cfg: CaptionerConfig) -> ModelAdapter:
    from .lstm_decoder import (init_lstm_captioner, lstm_captioner_loss,
                               lstm_generate)
    def encode(frozen, batch):
        from .captioner import encode_contexts
        return encode_contexts(frozen, cfg, batch)

    return ModelAdapter(
        name="lstm", config=cfg, init=init_lstm_captioner,
        loss=lstm_captioner_loss, loss_e2e=None, generate=lstm_generate,
        encode=encode)


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
    if mt in ("modern", "transformer_modern"):
        return _modern(cfg)
    if mt == "vit_modern":
        return _modern(cfg, vit=True)
    raise KeyError(f"unknown model_type {model_type!r}")
