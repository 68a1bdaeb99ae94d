"""Configuration dataclasses.

The reference drives everything through AllenNLP's string registry + YAML
`from_params` (/root/reference/tell/commands/train.py:67-77). We keep the
"one YAML per experiment" surface (tell_tpu/commands) but back it with typed
frozen dataclasses so configs are hashable and can parameterize jitted
functions as static arguments.

Flagship values mirror expt/nytimes/9_transformer_objects/config.yaml.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ContextSpec:
    """One cross-attended context modality (name + raw feature dim)."""
    name: str
    kv_dim: int
    max_len: int  # static sequence capacity (TPU shapes are fixed)


# The four modalities of the flagship model
# (/root/reference/tell/models/decoder_faces_objects.py:224-246; feature dims:
# ResNet grid 2048, RoBERTa 1024, FaceNet 512, object ResNet embeds 2048).
FACES_OBJECTS_CONTEXTS = (
    ContextSpec("image", 2048, 49),
    ContextSpec("article", 1024, 512),
    ContextSpec("faces", 512, 4),
    ContextSpec("obj", 2048, 64),
)
FACES_CONTEXTS = FACES_OBJECTS_CONTEXTS[:3]
FLATTENED_CONTEXTS = FACES_OBJECTS_CONTEXTS[:2]
NO_IMAGE_CONTEXTS = (FACES_OBJECTS_CONTEXTS[1],)


@dataclass(frozen=True)
class DecoderConfig:
    """DynamicConv decoder (dynamic_conv_decoder_* family).

    One config covers all four reference decoder variants — they differ only
    in the `contexts` tuple (SURVEY.md §2.4).
    """
    vocab_size: int = 50265
    embed_dim: int = 1024
    conv_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    kernel_sizes: tuple[int, ...] = (3, 7, 15, 31)
    conv_type: str = "dynamic"  # or "lightweight"
    glu: bool = True
    weight_softmax: bool = True
    normalize_before: bool = False
    final_norm: bool = False
    dropout: float = 0.1
    weight_dropout: float = 0.1
    input_dropout: float = 0.1
    relu_dropout: float = 0.0
    attention_dropout: float = 0.1
    adaptive_cutoffs: tuple[int, ...] = (5000, 20000)
    adaptive_factor: float = 1.0
    adaptive_softmax_dropout: float = 0.0
    scale_embeds: bool = True
    # "sinusoidal" (static table) or "learned" (trainable table, reference's
    # learned_positional embedder, positional.py:12-81)
    positional: str = "sinusoidal"
    embed_padding_idx: int = 0  # pins <s> rows; see ops/adaptive.py
    pad_id: int = 1
    bos_id: int = 0
    eos_id: int = 2
    max_target_positions: int = 512
    contexts: tuple[ContextSpec, ...] = FACES_OBJECTS_CONTEXTS
    # Static per-tail row budgets for the training loss, as a fraction of the
    # batch token count. None = dense tails (used by parity tests).
    tail_capacity_frac: tuple[float, ...] | None = (0.25, 0.125)

    @property
    def num_layers(self) -> int:
        return len(self.kernel_sizes)

    @property
    def full_cutoffs(self) -> tuple[int, ...]:
        if self.adaptive_cutoffs and self.adaptive_cutoffs[-1] == self.vocab_size:
            return self.adaptive_cutoffs
        return self.adaptive_cutoffs + (self.vocab_size,)

    def context(self, name: str) -> ContextSpec:
        for c in self.contexts:
            if c.name == name:
                return c
        raise KeyError(name)


@dataclass(frozen=True)
class CaptionerConfig:
    """Task model (transformer_faces_objects family,
    /root/reference/tell/models/transformer_faces_objects.py:22-141)."""
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    weigh_bert: bool = True
    num_bert_layers: int = 25  # RoBERTa-large: embeddings + 24 layers
    sampling_topk: int = 1
    sampling_temp: float = 1.0
    gen_len: int = 100
    compute_dtype: str = "float32"  # "bfloat16" for TPU training


def small_test_config(**overrides) -> CaptionerConfig:
    """Tiny shapes for CPU tests."""
    dec = DecoderConfig(
        vocab_size=500,
        embed_dim=64,
        conv_dim=64,
        ffn_dim=128,
        num_heads=4,
        kernel_sizes=(3, 5),
        adaptive_cutoffs=(50, 200),
        dropout=0.0, weight_dropout=0.0, input_dropout=0.0,
        attention_dropout=0.0, relu_dropout=0.0,
        max_target_positions=64,
        contexts=(
            ContextSpec("image", 32, 9),
            ContextSpec("article", 24, 16),
            ContextSpec("faces", 16, 4),
            ContextSpec("obj", 32, 8),
        ),
        tail_capacity_frac=None,
    )
    dec = dataclasses.replace(dec, **{k: v for k, v in overrides.items()
                                      if hasattr(DecoderConfig, k)})
    cap_over = {k: v for k, v in overrides.items()
                if hasattr(CaptionerConfig, k) and k != "decoder"}
    return CaptionerConfig(decoder=dec, num_bert_layers=3, **cap_over)
