"""Modern decoder-only LM behind the same multi-context attention API.

The stretch model family (BASELINE.json configs[4]): where the flagship
decoder mirrors the reference's 2019-era DynamicConv architecture
(/root/reference/tell/models/decoder_faces_objects.py), this is the same
*task* — entity-aware captioning over image/article/faces/object contexts —
on a contemporary LM backbone:

    x = x + self_attn(rms(x))           causal, RoPE, KV-cached in decode
    x = x + ctx_fc(concat_m cross_attn_m(rms(x)))   same multi-context API
    x = x + w2(silu(w1 h) * w3 h)       SwiGLU FFN, h = rms(x)

with a tied full-vocab softmax head (no adaptive clustering — modern LMs
spend the HBM; the loss streams the vocab in chunks so [N, V] logits never
materialize at once).

The multi-context block reuses the SAME machinery as the flagship decoder:
`init_cross_attention` per-modality projections with bias/zero KV columns
(multi_head.py add_bias_kv/add_zero_attn semantics), `precompute_context_kv_cat`
static KV, and the fused segment-masked decode-attention Pallas kernel —
which is what "behind the same multi-context attention API" means: any
context tuple that feeds the flagship feeds this model unchanged.

Decode is a fixed-shape `lax.scan`; beam search plugs into
`beam.beam_search_core` with a self-KV-cache reorder callback.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..config import ContextSpec, FACES_OBJECTS_CONTEXTS
from ..ops.attention import init_cross_attention, precompute_kv
from ..ops.linear import init_linear, linear
from ..ops.moe import init_moe_ffn, moe_ffn
from .decoder import context_groups as _context_groups


VIT_CONTEXTS = (
    ContextSpec("image", 1024, 197),   # ViT-L/16 CLS + 14x14 patch tokens
    ContextSpec("article", 1024, 512),
    ContextSpec("faces", 512, 4),
    ContextSpec("obj", 2048, 64),
)


@dataclass(frozen=True)
class LLMConfig:
    """Modern captioning LM. Defaults size-match the flagship decoder's
    budget (dim 1024) with more layers (self-attention replaces the conv's
    fixed receptive field; 8 layers ≈ the flagship's parameter count since
    there is no adaptive-softmax tail stack)."""
    vocab_size: int = 50265
    dim: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    # grouped-query attention for the causal self-attention (Fast Transformer
    # Decoding / GQA): fewer KV heads shrink the decode self-KV cache and its
    # per-step HBM stream by num_heads/num_kv_heads. None = MHA.
    num_kv_heads: int | None = 4
    ffn_dim: int = 2816          # SwiGLU width ~ (8/3)d rounded to 256
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    dropout: float = 0.1
    attention_dropout: float = 0.1
    pad_id: int = 1
    bos_id: int = 0
    eos_id: int = 2
    max_target_positions: int = 512
    contexts: tuple[ContextSpec, ...] = FACES_OBJECTS_CONTEXTS
    gen_len: int = 100
    # vocab-chunked loss: logits materialize [N, chunk] at a time
    loss_vocab_chunk: int = 8192
    # Mixture-of-Experts FFN (ops/moe.py): None = dense SwiGLU. When set,
    # every layer's FFN becomes `moe_experts` experts with top-k routing;
    # stacked expert weights shard over the "model" mesh axis (ep)
    moe_experts: int | None = None
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_aux_coef: float = 0.01

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    def context(self, name: str) -> ContextSpec:
        for c in self.contexts:
            if c.name == name:
                return c
        raise KeyError(name)


def _rms_params(dim: int) -> dict:
    return {"scale": jnp.ones((dim,), jnp.float32)}


def rms_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * r * p["scale"]).astype(x.dtype)


def init_llm_decoder(rng: jax.Array, cfg: LLMConfig) -> dict:
    ks = iter(jax.random.split(rng, 8 + cfg.num_layers * (8 + len(cfg.contexts))))
    params = {
        "tok_embed": jax.random.normal(
            next(ks), (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02,
        "layers": [],
        "final_norm": _rms_params(cfg.dim),
    }
    for _ in range(cfg.num_layers):
        lp = {
            "attn_norm": _rms_params(cfg.dim),
            "self_attn": {
                "q": init_linear(next(ks), cfg.dim, cfg.dim, bias=False),
                "k": init_linear(next(ks), cfg.dim,
                                 cfg.kv_heads * cfg.head_dim, bias=False),
                "v": init_linear(next(ks), cfg.dim,
                                 cfg.kv_heads * cfg.head_dim, bias=False),
                "o": init_linear(next(ks), cfg.dim, cfg.dim, bias=False),
            },
            "cross_norm": _rms_params(cfg.dim),
            "attn": {},
            "context_fc": init_linear(
                next(ks), cfg.dim * len(cfg.contexts), cfg.dim),
            "ffn_norm": _rms_params(cfg.dim),
            "ffn": (init_moe_ffn(next(ks), cfg.dim, cfg.ffn_dim,
                                 cfg.moe_experts)
                    if cfg.moe_experts else {
                "w1": init_linear(next(ks), cfg.dim, cfg.ffn_dim, bias=False),
                "w3": init_linear(next(ks), cfg.dim, cfg.ffn_dim, bias=False),
                "w2": init_linear(next(ks), cfg.ffn_dim, cfg.dim, bias=False),
            }),
        }
        for spec in cfg.contexts:
            lp["attn"][spec.name] = init_cross_attention(
                next(ks), cfg.dim, cfg.num_heads,
                kdim=spec.kv_dim, vdim=spec.kv_dim)
        params["layers"].append(lp)
    return params


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float
                 ) -> tuple[jax.Array, jax.Array]:
    """positions: [...] int -> cos/sin [..., head_dim//2] fp32."""
    inv = theta ** (-jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    ang = positions.astype(jnp.float32)[..., None] * inv
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: [..., T, H, hd]; cos/sin: [..., T, hd//2] (broadcast over H)."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    c = cos[..., None, :]
    s = sin[..., None, :]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c],
                           axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks (shared math between full forward and decode step)
# ---------------------------------------------------------------------------

def _self_attn_full(sp: dict, cfg: LLMConfig, x: jax.Array,
                    rng: jax.Array | None = None,
                    deterministic: bool = True) -> jax.Array:
    """Causal self-attention over the whole sequence. x: [B, T, E]."""
    from ..ops.common import dropout
    B, T, E = x.shape
    H, hd, KV = cfg.num_heads, cfg.head_dim, cfg.kv_heads
    q = linear(sp["q"], x).reshape(B, T, H, hd)
    k = linear(sp["k"], x).reshape(B, T, KV, hd)
    v = linear(sp["v"], x).reshape(B, T, KV, hd)
    cos, sin = rope_cos_sin(jnp.arange(T), hd, cfg.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if KV != H:
        k = jnp.repeat(k, H // KV, axis=2)
        v = jnp.repeat(v, H // KV, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    causal = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(causal[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    probs = dropout(probs, cfg.attention_dropout, rng, deterministic)
    o = jnp.einsum("bhts,bshd->bthd", probs, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(sp["o"], o.reshape(B, T, E))


def _self_attn_step(sp: dict, cfg: LLMConfig, x: jax.Array, cache: dict,
                    step: jax.Array) -> tuple[jax.Array, dict]:
    """One-token causal self-attention against the KV cache.

    x: [R, E]; cache: {k, v: [R, T_max, H, hd]}. Rows beyond `step` are
    masked (fixed-shape cache, masking instead of dynamic slicing).

    step: scalar (all rows at the same position — generate/beam_search) or
    [R] per-row positions (the continuous-batching engine, where each slot
    admitted at a different time). The scalar path keeps the cheaper
    single-index dynamic_update_slice; the per-row path scatters one row
    per cache line via a vmapped update.
    """
    R, E = x.shape
    H, hd, KV = cfg.num_heads, cfg.head_dim, cfg.kv_heads
    q = linear(sp["q"], x).reshape(R, 1, H, hd)
    k = linear(sp["k"], x).reshape(R, 1, KV, hd)
    v = linear(sp["v"], x).reshape(R, 1, KV, hd)
    per_row = getattr(step, "ndim", 0) == 1
    pos = step[:, None] if per_row else step[None]
    cos, sin = rope_cos_sin(pos, hd, cfg.rope_theta)
    q = apply_rope(q, cos, sin)[:, 0]                       # [R, H, hd]
    k = apply_rope(k, cos, sin)[:, 0]
    if per_row:
        upd = jax.vmap(
            lambda c, row, s: jax.lax.dynamic_update_slice_in_dim(
                c, row[None], s, axis=0))
        ck = upd(cache["k"], k.astype(cache["k"].dtype), step)
        cv = upd(cache["v"], v[:, 0].astype(cache["v"].dtype), step)
    else:
        ck = jax.lax.dynamic_update_slice_in_dim(
            cache["k"], k[:, None].astype(cache["k"].dtype), step, axis=1)
        cv = jax.lax.dynamic_update_slice_in_dim(
            cache["v"], v.astype(cache["v"].dtype), step, axis=1)
    T = ck.shape[1]
    # grouped queries: [R, KV, H/KV, hd] against the [R, T, KV, hd] cache
    qg = q.reshape(R, KV, H // KV, hd)
    scores = jnp.einsum("rkgd,rtkd->rkgt", qg, ck,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    valid = (jnp.arange(T)[None] <= step[:, None])[:, None, None] \
        if per_row else (jnp.arange(T) <= step)[None, None, None]
    scores = jnp.where(valid, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    o = jnp.einsum("rkgt,rtkd->rkgd", probs, cv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(sp["o"], o.reshape(R, E)), {"k": ck, "v": cv}


def _cross_block_full(lp: dict, cfg: LLMConfig, x: jax.Array,
                      contexts: dict, need_weights: bool,
                      rng: jax.Array | None = None,
                      deterministic: bool = True
                      ) -> tuple[jax.Array, dict]:
    """Multi-context cross-attention, full-sequence path. x: [B, T, E]."""
    from ..ops.attention import cross_attention_with_kv
    branches = []
    attns = {}
    for j, spec in enumerate(cfg.contexts):
        feats, mask = contexts[spec.name]
        k, v, kmask = precompute_kv(lp["attn"][spec.name], feats, mask)
        out, attn = cross_attention_with_kv(
            lp["attn"][spec.name], x, k, v, kmask,
            num_heads=cfg.num_heads,
            attn_dropout=cfg.attention_dropout,
            rng=None if rng is None else jax.random.fold_in(rng, j),
            deterministic=deterministic, need_weights=need_weights)
        branches.append(out)
        if attn is not None:
            attns[spec.name] = attn
    return linear(lp["context_fc"], jnp.concatenate(branches, axis=-1)), attns


def _cross_block_step(lp: dict, cfg: LLMConfig, x: jax.Array,
                      cats: list[dict], B: int, need_weights: bool
                      ) -> tuple[jax.Array, list]:
    """Decode-step cross-attention over grouped stacked KV — the SAME
    stacked-attention core as the flagship decoder (int8-K/V aware, fused
    kernel dispatch; decoder.stacked_attention_core) minus its per-branch
    residual+LN: modern blocks put the residual around the whole
    context_fc output instead. x: [R, E]."""
    from .decoder import stacked_attention_core
    R, E = x.shape
    G = R // B
    xg = x.reshape(B, G, E)
    groups = _context_groups(cfg)  # duck-typed on .contexts
    by_index: dict[int, jax.Array] = {}
    attns = []
    for group, cat in zip(groups, cats):
        names = [cfg.contexts[i].name for i in group]
        out, attn = stacked_attention_core(lp["attn"], names, cfg.num_heads,
                                           xg, cat, need_weights)
        for j, idx in enumerate(group):
            by_index[idx] = out[:, j]
        attns.append(attn)
    ordered = [by_index[i] for i in range(len(cfg.contexts))]
    h = jnp.concatenate(ordered, axis=-1).reshape(R, E * len(cfg.contexts))
    return linear(lp["context_fc"], h), attns


def _ffn(lp: dict, cfg: LLMConfig, x: jax.Array, no_drop: bool = False,
         token_mask: jax.Array | None = None
         ) -> tuple[jax.Array, jax.Array]:
    """FFN (dense SwiGLU or MoE per cfg.moe_experts). x may be [B, T, E]
    or [R, E]; returns (out, moe aux loss — 0.0 when dense).

    no_drop=True (decode steps) raises the capacity to N so no token is
    ever dropped: capacity drops are a training-efficiency tradeoff, but at
    inference they would make a caption depend on which other rows share
    its decode batch. The E-wide buffers this implies are fine at decode —
    the step cost there is streaming all E experts' weights from HBM, and
    the extra FLOPs on a few dozen rows are noise next to that.

    token_mask (flattened [N], True = real token) keeps pads from
    consuming expert capacity at train time."""
    if cfg.moe_experts:
        shape = x.shape
        cf = (float(cfg.moe_experts) if no_drop
              else cfg.moe_capacity_factor)
        out, aux = moe_ffn(lp, x.reshape(-1, shape[-1]),
                           top_k=cfg.moe_top_k, capacity_factor=cf,
                           token_mask=(None if token_mask is None
                                       else token_mask.reshape(-1)))
        return out.reshape(shape), aux
    h = jax.nn.silu(linear(lp["w1"], x).astype(jnp.float32)).astype(x.dtype)
    return linear(lp["w2"], h * linear(lp["w3"], x)), jnp.zeros((), jnp.float32)


# ---------------------------------------------------------------------------
# Full forward / loss
# ---------------------------------------------------------------------------

def _layer_full(lp: dict, cfg: LLMConfig, x: jax.Array, contexts: dict,
                need_weights: bool = False, rng: jax.Array | None = None,
                deterministic: bool = True,
                token_mask: jax.Array | None = None
                ) -> tuple[jax.Array, dict]:
    """One decoder layer, full-sequence path. x: [B, T, E]; token_mask
    [B, T] (True = non-pad) gates MoE capacity/aux."""
    from ..ops.common import dropout
    r = rng
    h = rms_norm(lp["attn_norm"], x, cfg.rms_eps)
    x = x + dropout(
        _self_attn_full(lp["self_attn"], cfg, h,
                        None if r is None else jax.random.fold_in(r, 9),
                        deterministic),
        cfg.dropout, r, deterministic)
    h = rms_norm(lp["cross_norm"], x, cfg.rms_eps)
    out, attns = _cross_block_full(
        lp, cfg, h, contexts, need_weights,
        None if r is None else jax.random.fold_in(r, 10), deterministic)
    x = x + dropout(out, cfg.dropout,
                    None if r is None else jax.random.fold_in(r, 1),
                    deterministic)
    h = rms_norm(lp["ffn_norm"], x, cfg.rms_eps)
    f, moe_aux = _ffn(lp["ffn"], cfg, h, token_mask=token_mask)
    x = x + dropout(f, cfg.dropout,
                    None if r is None else jax.random.fold_in(r, 2),
                    deterministic)
    attns = dict(attns)
    attns["moe_aux"] = moe_aux
    return x, attns


def llm_forward(params: dict, cfg: LLMConfig, ids: jax.Array,
                contexts: dict, rng: jax.Array | None = None,
                deterministic: bool = True, need_weights: bool = False
                ) -> tuple[jax.Array, list[dict]]:
    """Teacher-forced forward. ids: [B, T] -> features [B, T, E]."""
    from ..ops.common import dropout
    x = jnp.take(params["tok_embed"], ids, axis=0)
    x = dropout(x, cfg.dropout,
                None if rng is None else jax.random.fold_in(rng, 0),
                deterministic)
    all_attns = []
    token_mask = ids != cfg.pad_id
    for i, lp in enumerate(params["layers"]):
        r = None if rng is None else jax.random.fold_in(rng, 1 + i)
        x, attns = _layer_full(lp, cfg, x, contexts, need_weights, r,
                               deterministic, token_mask=token_mask)
        all_attns.append(attns)
    return rms_norm(params["final_norm"], x, cfg.rms_eps), all_attns


def tied_log_probs(params: dict, cfg: LLMConfig, feats: jax.Array
                   ) -> jax.Array:
    """Full-vocab log-probs [..., V] from features [..., E] (tied head)."""
    logits = jnp.einsum("...e,ve->...v", feats,
                        params["tok_embed"].astype(feats.dtype),
                        preferred_element_type=jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def tied_top_k(params: dict, cfg: LLMConfig, feats: jax.Array, k: int
               ) -> tuple[jax.Array, jax.Array]:
    """Exact top-k next-token log-probs from step features [R, E]."""
    logits = jnp.einsum("re,ve->rv", feats,
                        params["tok_embed"].astype(feats.dtype),
                        preferred_element_type=jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    vals, ids = jax.lax.top_k(logits, k)
    return vals - lse[:, None], ids


def llm_xent(params: dict, cfg: LLMConfig, feats: jax.Array,
             targets: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Vocab-chunked tied-softmax cross entropy.

    feats: [N, E], targets: [N]. Returns (sum loss in nats over non-pad
    targets, sample_size). The [N, V] logit matrix is never materialized:
    each chunk contributes a running max/sumexp (online logsumexp) and the
    target logit is picked up in the chunk that owns it.
    """
    N, E = feats.shape
    V = cfg.vocab_size
    C = min(cfg.loss_vocab_chunk, V)
    n_chunks = -(-V // C)
    pad_v = n_chunks * C
    table = params["tok_embed"].astype(feats.dtype)
    if pad_v != V:
        table = jnp.pad(table, ((0, pad_v - V), (0, 0)))
    chunks = table.reshape(n_chunks, C, E)

    def body(carry, chunk_idx):
        m, s, tgt_logit = carry
        w = chunks[chunk_idx]                               # [C, E]
        logits = jnp.einsum("ne,ce->nc", feats, w,
                            preferred_element_type=jnp.float32)
        base = chunk_idx * C
        col = jnp.arange(C)[None, :] + base                 # [1, C]
        valid = col < V
        logits = jnp.where(valid, logits, -jnp.inf)
        new_m = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=-1)
        here = (targets[:, None] == col)
        tgt_logit = tgt_logit + jnp.sum(jnp.where(here, logits, 0.0), axis=-1)
        return (new_m, s, tgt_logit), None

    m0 = jnp.full((N,), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((N,), jnp.float32)
    t0 = jnp.zeros((N,), jnp.float32)
    (m, s, tgt_logit), _ = jax.lax.scan(body, (m0, s0, t0),
                                        jnp.arange(n_chunks))
    lse = m + jnp.log(s)
    nll = lse - tgt_logit
    keep = targets != cfg.pad_id
    return jnp.sum(jnp.where(keep, nll, 0.0)), jnp.sum(keep)


def llm_loss(params: dict, cfg: LLMConfig, batch: dict,
             rng: jax.Array | None = None, deterministic: bool = True
             ) -> tuple[jax.Array, dict]:
    """Mean per-token loss in BITS (the reference's reporting convention,
    transformer_faces_objects.py:82-90). batch['caption_ids']: [B, T]."""
    contexts = _build_contexts(params, cfg, batch)
    ids = batch["caption_ids"]
    inputs, targets = ids[:, :-1], ids[:, 1:]
    feats, attns = llm_forward(params, cfg, inputs, contexts, rng,
                               deterministic)
    B, T, E = feats.shape
    loss_sum, size = llm_xent(params, cfg, feats.reshape(B * T, E),
                              targets.reshape(-1))
    size = jnp.maximum(size, 1)
    loss = loss_sum / jnp.log(2.0) / size
    aux = {"sample_size": size}
    if cfg.moe_experts:
        moe_aux = sum(a["moe_aux"] for a in attns) / len(attns)
        aux["moe_aux"] = moe_aux
        loss = loss + cfg.moe_aux_coef * moe_aux
    return loss, aux


def _build_contexts(params: dict, cfg: LLMConfig, batch: dict) -> dict:
    """Same context-dict assembly as the flagship captioner (NaN-row face/
    object masking, article padding mask); no learned layer-sum — the
    modern model consumes the article tower's final hidden state."""
    from .captioner import mask_nan_embeds
    contexts = {}
    names = {c.name for c in cfg.contexts}
    if "image" in names:
        grid = batch["image_grid"]
        contexts["image"] = (grid, jnp.zeros(grid.shape[:2], bool))
    if "article" in names:
        contexts["article"] = (batch["article"], batch["article_mask"])
    if "faces" in names:
        contexts["faces"] = mask_nan_embeds(batch["face_embeds"])
    if "obj" in names:
        contexts["obj"] = mask_nan_embeds(batch["obj_embeds"])
    return contexts


def modern_encode_contexts(frozen: dict, cfg: LLMConfig, batch: dict) -> dict:
    """Frozen-tower encodes for the modern model: ViT-L patch tokens as the
    image context (BASELINE.json configs[4]; falls back to a ResNet grid if
    no ViT tower is provided) and the article tower's final hidden state
    (no learned layer-sum — modern taste is the top layer)."""
    out = dict(batch)
    if ("context_ids" in batch and "article" not in batch):
        from .backbones.roberta import roberta_encode_windowed
        rcfg = frozen["roberta_cfg"]
        # windowed past the position table — an unwindowed encode would
        # silently clamp positions for >512-token articles
        hidden = roberta_encode_windowed(frozen["roberta"], rcfg,
                                         batch["context_ids"],
                                         return_all_hiddens=False)
        out["article"] = jax.lax.stop_gradient(hidden)
        out["article_mask"] = batch["context_ids"] == rcfg.pad_id
    if "image" in batch and "image_grid" not in batch:
        if "vit" in frozen:
            from .backbones.vit import vit_encode
            tokens = vit_encode(frozen["vit"], frozen["vit_cfg"],
                                batch["image"])
        else:
            from .backbones.resnet import resnet_forward
            tokens = resnet_forward(frozen["resnet"], frozen["resnet_cfg"],
                                    batch["image"])
        out["image_grid"] = jax.lax.stop_gradient(tokens)
    return out


def llm_loss_e2e(params: dict, frozen: dict, cfg: LLMConfig, batch: dict,
                 rng: jax.Array | None = None, deterministic: bool = True
                 ) -> tuple[jax.Array, dict]:
    return llm_loss(params, cfg, modern_encode_contexts(frozen, cfg, batch),
                    rng, deterministic)


# ---------------------------------------------------------------------------
# Pipeline parallelism (pp axis)
# ---------------------------------------------------------------------------

def stack_llm_layers(params: dict, n_stages: int) -> dict:
    """Rewrite params['layers'] [L dicts] -> one pytree with leading
    [n_stages, L/P] axes (parallel/pipeline.py stage layout). Embeddings and
    final norm stay as-is (replicated). The result is what llm_*_pp expect
    and what pipeline_spec shards over the 'pipe' mesh axis."""
    from ..parallel.pipeline import stack_stages
    p = dict(params)
    p["layers"] = stack_stages(params["layers"], n_stages)
    return p


def llm_pp_sharding(stacked: dict, mesh, axis: str = "pipe"):
    """NamedSharding pytree for stack_llm_layers output: the layer stack
    rides `axis`, everything else is replicated on the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec
    from ..parallel.pipeline import pipeline_spec
    repl = NamedSharding(mesh, PartitionSpec())
    out = jax.tree.map(lambda _: repl, stacked)
    out["layers"] = pipeline_spec(stacked["layers"], mesh, axis)
    return out


def llm_forward_pp(stacked: dict, cfg: LLMConfig, ids: jax.Array,
                   contexts: dict, mesh, n_micro: int, axis: str = "pipe",
                   data_axis: str | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced forward with the layer stack pipelined over `axis`
    (GPipe microbatching; deterministic — pp is a training-scale path, so
    dropout is applied by the caller's choice of loss, not here). Returns
    (features, moe_aux_sum — zero when dense; per-microbatch capacity/aux,
    the GShard per-shard convention). Feature output exactly equals the
    sequential llm_forward (tests/test_pipeline_parallel.py)."""
    from ..parallel.pipeline import pipeline_apply
    x = jnp.take(stacked["tok_embed"], ids, axis=0)
    token_mask = ids != cfg.pad_id

    def layer_fn(lp, h, extras):
        # per-example tensors arrive as the batched extras slice
        ctx_mb, mask_mb = extras[-1]
        out, attns = _layer_full(lp, cfg, h, ctx_mb, token_mask=mask_mb)
        return out, attns["moe_aux"]

    x, aux = pipeline_apply(stacked["layers"], layer_fn, x, mesh, n_micro,
                            axis=axis, batched=(contexts, token_mask),
                            data_axis=data_axis, layer_aux=True)
    return rms_norm(stacked["final_norm"], x, cfg.rms_eps), aux


def llm_loss_pp(stacked: dict, cfg: LLMConfig, batch: dict, mesh,
                n_micro: int, axis: str = "pipe",
                data_axis: str | None = None) -> tuple[jax.Array, dict]:
    """Pipeline-parallel llm_loss (deterministic). Differentiable end to
    end: grads on stacked['layers'] come back stage-sharded over `axis`.
    `data_axis` runs dp x pp: microbatch examples sharded over that axis.

    pp x ep composes: with cfg.moe_experts set, expert capacity and the
    Switch aux loss are per-microbatch (the GShard per-shard convention —
    aux here is the mean over layers and microbatches, so it is an
    estimator of, not bit-identical to, the full-batch llm_loss aux)."""
    contexts = _build_contexts(stacked, cfg, batch)
    ids = batch["caption_ids"]
    inputs, targets = ids[:, :-1], ids[:, 1:]
    feats, moe_aux_sum = llm_forward_pp(stacked, cfg, inputs, contexts,
                                        mesh, n_micro, axis, data_axis)
    B, T, E = feats.shape
    loss_sum, size = llm_xent(stacked, cfg, feats.reshape(B * T, E),
                              targets.reshape(-1))
    size = jnp.maximum(size, 1)
    loss = loss_sum / jnp.log(2.0) / size
    aux = {"sample_size": size}
    if cfg.moe_experts:
        moe_aux = moe_aux_sum / (cfg.num_layers * n_micro)
        aux["moe_aux"] = moe_aux
        loss = loss + cfg.moe_aux_coef * moe_aux
    return loss, aux


# ---------------------------------------------------------------------------
# Incremental decode
# ---------------------------------------------------------------------------

def init_llm_decode_state(params: dict, cfg: LLMConfig, contexts: dict,
                          batch: int, beam: int = 1,
                          dtype=jnp.float32) -> dict:
    """Fixed-shape decode state: per-layer self-KV caches + static cross KV.

    Cross KV reuses the flagship's grouped stacked layout
    (decoder.precompute_context_kv_cat) so the fused decode-attention
    kernel serves both model families.
    """
    from .decoder import precompute_context_kv_cat
    R = batch * beam
    KV, hd = cfg.kv_heads, cfg.head_dim
    T = cfg.gen_len + 1
    return {
        "self_kv": [{"k": jnp.zeros((R, T, KV, hd), dtype),
                     "v": jnp.zeros((R, T, KV, hd), dtype)}
                    for _ in range(cfg.num_layers)],
        "kv": precompute_context_kv_cat(params, cfg, contexts, beam=beam),
        "step": jnp.zeros((), jnp.int32),
    }


def llm_decoder_step(params: dict, cfg: LLMConfig, tokens: jax.Array,
                     state: dict, need_weights: bool = False
                     ) -> tuple[jax.Array, dict, list]:
    """One decode step. tokens: [R] -> (features [R, E], state', attns)."""
    R = tokens.shape[0]
    B = state["kv"][0][0]["k"].shape[0]
    x = jnp.take(params["tok_embed"], tokens, axis=0)
    dtype = state["self_kv"][0]["k"].dtype
    x = x.astype(dtype)
    new_self = []
    all_attns = []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(lp["attn_norm"], x, cfg.rms_eps)
        o, cache = _self_attn_step(lp["self_attn"], cfg, h,
                                   state["self_kv"][i], state["step"])
        new_self.append(cache)
        x = x + o
        h = rms_norm(lp["cross_norm"], x, cfg.rms_eps)
        o, attns = _cross_block_step(lp, cfg, h, state["kv"][i], B,
                                     need_weights)
        x = x + o
        h = rms_norm(lp["ffn_norm"], x, cfg.rms_eps)
        x = x + _ffn(lp["ffn"], cfg, h, no_drop=True)[0]
        all_attns.append(attns)
    feats = rms_norm(params["final_norm"], x, cfg.rms_eps)
    return feats, {"self_kv": new_self, "kv": state["kv"],
                   "step": state["step"] + 1}, all_attns


def llm_generate(params: dict, cfg: LLMConfig, batch: dict,
                 rng: jax.Array | None = None,
                 early_stop: bool = True,
                 need_weights: bool = False) -> dict:
    """Greedy generation. Returns {token_ids [B, gen_len+1], log_probs,
    finished} — the same payload shape as captioner.generate, plus `attns`
    (per-layer per-context head-averaged maps) when need_weights, so the
    modern family serves the demo's attention payload too.
    early_stop: exit the decode loop once every row emitted EOS (exact —
    see captioner.generate); ignored when need_weights (the scan carries
    the maps)."""
    contexts = _build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    state = init_llm_decode_state(params, cfg, contexts, B,
                                  dtype=feat0.dtype)
    kv = state.pop("kv")
    seed = jnp.full((B,), cfg.bos_id, jnp.int32)
    finished0 = (~batch["row_live"] if "row_live" in batch
                 else jnp.zeros((B,), bool))

    def step(carry, _):
        tokens, finished, dyn = carry
        feats, st, attns = llm_decoder_step(params, cfg, tokens,
                                            {**dyn, "kv": kv},
                                            need_weights=need_weights)
        st = {k: v for k, v in st.items() if k != "kv"}
        lp, ids = tied_top_k(params, cfg, feats, 1)
        sampled = ids[:, 0]
        next_tok = jnp.where(finished, cfg.pad_id, sampled)
        sel_lp = jnp.where(finished, 0.0, lp[:, 0])
        return (next_tok, finished | (sampled == cfg.eos_id), st), (
            next_tok, sel_lp, attns if need_weights else ())

    if early_stop and not need_weights:
        toks0 = jnp.full((cfg.gen_len, B), cfg.pad_id, jnp.int32)
        lps0 = jnp.zeros((cfg.gen_len, B), jnp.float32)

        def w_cond(c):
            t, _, finished, _, _, _ = c
            return (t < cfg.gen_len) & ~jnp.all(finished)

        def w_body(c):
            t, tokens, finished, dyn, toks, lps = c
            (tokens, finished, dyn), (tok, lp, _) = step(
                (tokens, finished, dyn), None)
            return (t + 1, tokens, finished, dyn,
                    toks.at[t].set(tok), lps.at[t].set(lp))

        _, _, finished, _, toks, lps = jax.lax.while_loop(
            w_cond, w_body, (0, seed, finished0, state, toks0, lps0))
        attns = ()
    else:
        (_, finished, _), (toks, lps, attns) = jax.lax.scan(
            step, (seed, finished0, state), None, length=cfg.gen_len)
    token_ids = jnp.concatenate([seed[:, None], toks.T], axis=1)
    out = {"token_ids": token_ids, "log_probs": lps.T, "finished": finished}
    if need_weights:
        # same stacked-group format as the flagship (shared KV layout) —
        # split into per-context dicts [gen_len, B, 1, S_m]
        from .decoder import attn_segment_bounds, split_attn_segments
        bounds = attn_segment_bounds(cfg, contexts)
        out["attns"] = [split_attn_segments(bounds, a) for a in attns]
    return out


def llm_beam_search(params: dict, cfg: LLMConfig, batch: dict,
                    beam_size: int = 5, length_penalty: float = 0.0,
                    early_stop: bool = True) -> dict:
    """Beam decode via the generic core (beam.beam_search_core); the
    self-KV caches are the per-row state reordered by parent each step."""
    from .beam import beam_search_core
    contexts = _build_contexts(params, cfg, batch)
    feat0 = next(iter(contexts.values()))[0]
    B = feat0.shape[0]
    K = beam_size
    state = init_llm_decode_state(params, cfg, contexts, B, beam=K,
                                  dtype=feat0.dtype)
    kv = state.pop("kv")

    def step_fn(tokens, dyn):
        feats, st, _ = llm_decoder_step(params, cfg, tokens,
                                        {**dyn, "kv": kv})
        st = {k: v for k, v in st.items() if k != "kv"}
        lp, ids = tied_top_k(params, cfg, feats, K)
        return lp, ids, st

    def reorder_fn(st, flat_parent):
        return {**st,
                "self_kv": [{"k": jnp.take(c["k"], flat_parent, axis=0),
                             "v": jnp.take(c["v"], flat_parent, axis=0)}
                            for c in st["self_kv"]]}

    finished0 = ~batch["row_live"] if "row_live" in batch else None
    return beam_search_core(step_fn, reorder_fn, state, B, K, cfg.gen_len,
                            cfg.bos_id, cfg.eos_id, cfg.pad_id,
                            length_penalty, early_stop=early_stop,
                            finished0=finished0)
