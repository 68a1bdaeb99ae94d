"""RoBERTa article encoder (frozen tower), JAX-native.

Replaces the reference's torch.hub fairseq 'roberta.large'
(/root/reference/tell/models/transformer_faces_objects.py:49-50) whose
`extract_features(..., return_all_hiddens=True)` yields 25 hidden states
that the captioner mixes with a learned softmax weighting (:352-368).

Post-LN transformer encoder, exact (erf) GELU, pad-aware learned positions
with RoBERTa's +2 offset. `convert_hf_roberta` maps a HuggingFace
RobertaModel state dict onto the param pytree; activation parity vs
transformers is tested in tests/test_roberta.py.

The tower is frozen at train time (config.yaml no_grad ^roberta): its params
live outside the trainable pytree and the encode is wrapped in
jax.lax.stop_gradient by callers.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    max_positions: int = 514  # 512 + pad offset 2
    pad_id: int = 1
    ln_eps: float = 1e-5

    @staticmethod
    def large() -> "RobertaConfig":
        return RobertaConfig()

    @staticmethod
    def base() -> "RobertaConfig":
        return RobertaConfig(dim=768, num_layers=12, num_heads=12,
                             ffn_dim=3072)

    @staticmethod
    def tiny() -> "RobertaConfig":
        """Smoke-test tower: same interface, compile-friendly size. The
        article feature dim stays 1024 so decoder configs are unchanged."""
        return RobertaConfig(dim=1024, num_layers=2, num_heads=16,
                             ffn_dim=1024)



# static pytree leaf: RobertaConfig rides inside jitted args (e.g. the frozen-towers
# dict passed to the train step at call time) without becoming a traced value
jax.tree_util.register_static(RobertaConfig)

def _dense(rng, din, dout):
    std = 0.02
    return {"w": jax.random.normal(rng, (din, dout), jnp.float32) * std,
            "b": jnp.zeros((dout,), jnp.float32)}


def _ln(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_roberta(rng: jax.Array, cfg: RobertaConfig) -> dict:
    ks = iter(jax.random.split(rng, 6 + 6 * cfg.num_layers))
    params = {
        "word_embed": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(
            next(ks), (cfg.max_positions, cfg.dim), jnp.float32) * 0.02,
        "type_embed": jnp.zeros((1, cfg.dim), jnp.float32),
        "embed_ln": _ln(cfg.dim),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "q": _dense(next(ks), cfg.dim, cfg.dim),
            "k": _dense(next(ks), cfg.dim, cfg.dim),
            "v": _dense(next(ks), cfg.dim, cfg.dim),
            "attn_out": _dense(next(ks), cfg.dim, cfg.dim),
            "attn_ln": _ln(cfg.dim),
            "fc1": _dense(next(ks), cfg.dim, cfg.ffn_dim),
            "fc2": _dense(next(ks), cfg.ffn_dim, cfg.dim),
            "ffn_ln": _ln(cfg.dim),
        })
    return params


def _apply_ln(p, x, eps):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)
            * p["scale"] + p["bias"]).astype(x.dtype)


def _lin(p, x):
    if "q8" in p:   # int8-quantized frozen tower (ops/quant.py)
        from ...ops.quant import int8_linear
        return int8_linear(p, x)
    return (jnp.dot(x, p["w"], preferred_element_type=jnp.float32)
            + p["b"]).astype(x.dtype)


def _flash_ok(cfg: RobertaConfig, S: int, dtype) -> bool:
    """Flash attention engages on TPU for block-aligned sequences S >= 512.

    With DEFAULT BlockSizes flash measured slower than einsum at S=512
    (1.90 vs 0.75 ms/layer-fwd, v5e) — the default blocks are tuned for
    much longer sequences. With 512-wide q/k blocks it is 2.6x FASTER
    (0.29 ms/layer: the fp32 S x S score round-trip to HBM disappears and
    the whole tile chain stays in VMEM), so flash is now the default for
    every 512-multiple bucket. Shorter buckets (128/256) keep the einsum
    path — their score matrices are small enough that XLA's fusion wins.
    The einsum path is the semantic reference (flash is an online-softmax
    reformulation; pad queries attend only pads under segment ids, and
    their outputs are masked out downstream). Unlike our own kernels the
    library flash_attention has no interpret mode, so it additionally
    requires a real TPU backend (TELL_TPU_FUSED=1 on CPU falls back to
    einsum here instead of failing to lower)."""
    import jax as _jax
    from ...ops.kernels.dispatch import fused_kernels_enabled
    return (fused_kernels_enabled() and _jax.default_backend() == "tpu"
            and S >= 512 and S % 512 == 0
            and (cfg.dim // cfg.num_heads) % 64 == 0)


def _flash_block_sizes(S: int, B: int = 0, dtype=None):
    """512-wide q/k blocks (measured fastest at S=512..2048 on v5e; the
    library defaults lose 6x at these lengths) and the largest
    power-of-two batch block dividing B (fewer grid cells: 388.6 ->
    377.9 ms for the 128-article encode at block_b=8; the per-cell
    pipeline overhead dominates flash at these small-S shapes). The
    batch-block cap is DTYPE-aware: 8 for <=2-byte inputs, 4 for fp32 —
    fp32 at block_b=8 overflows the 16 MB scoped-VMEM stack (measured:
    16.75M requested in the round-5 quality loop, whose evaluate keeps
    the frozen tower fp32). TELL_TPU_FLASH_BLOCK /
    TELL_TPU_FLASH_BLOCK_B override for A/Bs (tools/enc_variants.py)."""
    import os
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes
    b = int(os.environ.get("TELL_TPU_FLASH_BLOCK", "0")) or min(S, 512)
    b = min(b, S)
    bb = int(os.environ.get("TELL_TPU_FLASH_BLOCK_B", "0"))
    if not bb:
        cap = 8
        if dtype is not None and jnp.dtype(dtype).itemsize > 2:
            cap = 4
        bb = next((c for c in (cap, 4, 2, 1)
                   if c <= cap and B % c == 0), 1) if B else 1
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=bb,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b)


def fast_gelu_mode() -> str:
    """Frozen-encoder GELU variant: "erf" (HF-parity exact erf) or "tanh"
    (tanh approximation). DEFAULT tanh ON TPU, erf elsewhere — the exact
    erf measures 4.0 ms vs tanh's 1.7 ms on the [65536, 4096] FFN
    activation, ~65 ms of a 454 ms 128-article encode
    (tools/enc_profile.py / enc_variants.py, v5e). NOT bit-exact
    (|erf - tanh| ~ 1e-3 relative on activations), so the default is
    gated exactly like the int8 K/V cache: bench.py measures
    teacher-forced decode agreement over tanh-encoded vs erf-encoded
    article features (fast_gelu_token_agreement) with auto-fallback, and
    `tnt serve --numerics-ab` A/Bs it with deployed weights. CPU keeps
    erf so parity tests against HF RoBERTa stay exact.
    TELL_TPU_FAST_GELU=erf|tanh overrides."""
    import os
    mode = os.environ.get("TELL_TPU_FAST_GELU")
    if mode in ("erf", "tanh"):
        return mode
    if mode in ("0", "1"):          # boolean-style spelling
        return "tanh" if mode == "1" else "erf"
    import jax as _jax
    return "tanh" if _jax.default_backend() == "tpu" else "erf"


def roberta_encode(params: dict, cfg: RobertaConfig, ids: jax.Array,
                   return_all_hiddens: bool = True) -> jax.Array:
    """ids: [B, S] -> [B, S, L+1, D] all hidden states (or [B, S, D] final).

    Pad-aware positions: position = pad_id + cumsum(not_pad) (RoBERTa's
    offset-by-2 convention). Padding keys are masked out of attention.
    """
    B, S = ids.shape
    mask = ids != cfg.pad_id
    positions = jnp.where(
        mask, jnp.cumsum(mask.astype(jnp.int32), axis=1) + cfg.pad_id,
        cfg.pad_id)
    x = (jnp.take(params["word_embed"], ids, axis=0)
         + jnp.take(params["pos_embed"], positions, axis=0)
         + params["type_embed"][0])
    x = _apply_ln(params["embed_ln"], x, cfg.ln_eps)

    hiddens = [x]
    H = cfg.num_heads
    hd = cfg.dim // H
    use_flash = _flash_ok(cfg, S, x.dtype)
    neg = jnp.where(mask, 0.0, -1e9)[:, None, None, :]  # [B,1,1,S]
    seg = mask.astype(jnp.int32)  # pads share id 0: they only see pads
    for lp in params["layers"]:
        q = _lin(lp["q"], x).reshape(B, S, H, hd)
        k = _lin(lp["k"], x).reshape(B, S, H, hd)
        v = _lin(lp["v"], x).reshape(B, S, H, hd)
        if use_flash:
            # blockwise (flash) attention: the S x S score matrix never
            # leaves VMEM — the encoder is the long-context surface
            # (SURVEY.md §5), and materialized scores dominate its HBM
            # traffic at S >= 512
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds, flash_attention)
            o = flash_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=SegmentIds(q=seg, kv=seg),
                sm_scale=hd ** -0.5,
                block_sizes=_flash_block_sizes(S, B, x.dtype))
            o = o.transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bthd,bshd->bhts", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores * (hd ** -0.5) + neg
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhts,bshd->bthd", probs, v,
                           preferred_element_type=jnp.float32)
        o = _lin(lp["attn_out"], o.reshape(B, S, cfg.dim).astype(x.dtype))
        x = _apply_ln(lp["attn_ln"], x + o, cfg.ln_eps)
        h = jax.nn.gelu(_lin(lp["fc1"], x).astype(jnp.float32),
                        approximate=fast_gelu_mode() == "tanh"
                        ).astype(x.dtype)
        h = _lin(lp["fc2"], h)
        x = _apply_ln(lp["ffn_ln"], x + h, cfg.ln_eps)
        hiddens.append(x)

    if return_all_hiddens:
        return jnp.stack(hiddens, axis=2)  # [B, S, L+1, D]
    return x


def roberta_encode_windowed(params: dict, cfg: RobertaConfig,
                            ids: jax.Array,
                            return_all_hiddens: bool = True,
                            window: int | None = None) -> jax.Array:
    """Long-article encode: independent non-overlapping windows.

    RoBERTa's learned position table stops at max_positions (514), which is
    why the reference hard-truncates articles at 512 BPE tokens
    (/root/reference/tell/data/token_indexers/roberta_indexer.py:99-101).
    The decoder cross-attends over article features with NO positional
    signal on the KV side, so windowing extends the attended context
    honestly: each <= 512-token window is encoded with positions restarting
    at its start (windows fold into the batch axis — one big encode, MXU
    stays saturated), and the feature streams are re-concatenated. The
    tradeoff is no cross-window self-attention; the alternative — clamped
    position ids past 512 — silently reuses the last position embedding
    and degrades everything after token 512.
    """
    B, S = ids.shape
    W = window or (cfg.max_positions - 2)
    if S <= W:
        return roberta_encode(params, cfg, ids, return_all_hiddens)
    n_w = -(-S // W)
    idsp = jnp.pad(ids, ((0, 0), (0, n_w * W - S)),
                   constant_values=cfg.pad_id)
    out = roberta_encode(params, cfg, idsp.reshape(B * n_w, W),
                         return_all_hiddens)
    return out.reshape((B, n_w * W) + out.shape[2:])[:, :S]


def convert_hf_roberta(state_dict: dict, cfg: RobertaConfig) -> dict:
    """Map a HuggingFace RobertaModel state_dict to our pytree.

    Works with either `roberta.`-prefixed (RobertaForMaskedLM) or bare
    (RobertaModel) key names. Tensors arrive as torch tensors or numpy.
    """
    def get(name):
        for key in (name, "roberta." + name):
            if key in state_dict:
                t = state_dict[key]
                return jnp.asarray(np.asarray(getattr(t, "cpu", lambda: t)()))
        raise KeyError(name)

    def dense(name):
        return {"w": get(name + ".weight").T, "b": get(name + ".bias")}

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    params = {
        "word_embed": get("embeddings.word_embeddings.weight"),
        "pos_embed": get("embeddings.position_embeddings.weight"),
        "type_embed": get("embeddings.token_type_embeddings.weight"),
        "embed_ln": ln("embeddings.LayerNorm"),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}."
        params["layers"].append({
            "q": dense(pre + "attention.self.query"),
            "k": dense(pre + "attention.self.key"),
            "v": dense(pre + "attention.self.value"),
            "attn_out": dense(pre + "attention.output.dense"),
            "attn_ln": ln(pre + "attention.output.LayerNorm"),
            "fc1": dense(pre + "intermediate.dense"),
            "fc2": dense(pre + "output.dense"),
            "ffn_ln": ln(pre + "output.LayerNorm"),
        })
    return params
