"""Device mesh + sharding rules.

The reference's only parallelism is single-host torch DataParallel plus
ZeroMQ process fan-out (SURVEY.md §2.10). Here parallelism is first-class:
a ("data", "model") `jax.sharding.Mesh`, named-sharding rules over the param
pytree, and XLA-inserted collectives over ICI. Batch dims shard over "data"
(pure DP); the wide matmuls — attention head projections, FFN, adaptive
embedding/softmax vocab bands — shard over "model" (TP).

Rules are expressed on pytree paths, so they apply to any model built from
tell_tpu.ops without per-model sharding code.
"""
from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert n <= len(devices), \
        f"mesh {n_data}x{n_model} needs {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# (path regex, PartitionSpec) — first match wins. Paths look like
# "decoder/layers/0/attn/image/q_proj/w".
_RULES: list[tuple[str, P]] = [
    # attention: split heads over "model": q/k/v output dim, out_proj input dim
    (r".*/attn/[^/]+/(q_proj|k_proj|v_proj)/w$", P(None, "model")),
    (r".*/attn/[^/]+/(q_proj|k_proj|v_proj)/b$", P("model")),
    (r".*/attn/[^/]+/out_proj/w$", P("model", None)),
    # FFN: fc1 column-parallel, fc2 row-parallel
    (r".*/fc1/(v|w)$", P(None, "model")),
    (r".*/fc1/(g|b)$", P("model")),
    (r".*/fc2/(v|w)$", P("model", None)),
    # adaptive embedding bands + softmax: vocab-sharded tables
    (r".*/embed/bands/\d+/embed$", P("model", None)),
    (r".*/embed/bands/\d+/proj$", P(None, None)),
    # modern LM (models/llm_decoder.py): causal self-attention heads and
    # SwiGLU split over "model"; the tied vocab table shards over rows
    # (XLA all-gathers the [N, V] logits for loss/top-k)
    (r".*/self_attn/(q|k|v)/w$", P(None, "model")),
    (r".*/self_attn/o/w$", P("model", None)),
    (r".*/ffn/(w1|w3)/w$", P(None, "model")),
    (r".*/ffn/w2/w$", P("model", None)),
    # MoE (ops/moe.py): stacked [E, ...] expert weights shard over "model"
    # as the expert axis (ep rides the tp axis); router replicated
    (r".*/ffn/(w1|w2|w3)$", P("model", None, None)),
    (r".*/ffn/router/w$", P()),
    (r".*tok_embed$", P("model", None)),
    # everything else replicated
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(params, mesh: Mesh):
    """NamedSharding pytree matching `params` via the rule table."""
    def rule(path, leaf):
        s = _path_str(path)
        for pattern, spec in _RULES:
            if re.fullmatch(pattern, s):
                # drop axes the leaf doesn't have (e.g. 1-D bias rules);
                # compare against the FULL spec length — counting only
                # non-None axes lets a short leaf reach shape[dim] below
                if len(spec) > leaf.ndim:
                    spec = P()
                # replicate when a sharded dim doesn't divide evenly
                # (e.g. an odd vocab size over the "model" axis)
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    if leaf.shape[dim] % mesh.shape[axis] != 0:
                        spec = P()
                        break
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    shardings = param_sharding_rules(params, mesh)
    return jax.device_put(params, shardings)


def batch_sharding(mesh: Mesh, batch):
    """Shard every batch leaf's leading dim over "data" (0-d leaves
    replicate). Every leaf is validated — checking only the first would
    surface later leaves' mismatches as opaque XLA errors."""
    n_data = mesh.shape["data"]
    for path, leaf in jax.tree_util.tree_leaves_with_path(batch):
        if leaf.ndim and leaf.shape[0] % n_data != 0:
            name = jax.tree_util.keystr(path)
            raise ValueError(
                f"batch leaf {name} leading dim {leaf.shape[0]} is not "
                f"divisible by the 'data' mesh axis ({n_data}); set "
                f"bucketing.max_batch (and min_batch) to a multiple of "
                f"trainer.n_data, or shrink n_data")
    def f(leaf):
        if leaf.ndim == 0:
            return NamedSharding(mesh, P())
        spec = P("data", *([None] * (leaf.ndim - 1)))
        return NamedSharding(mesh, spec)
    return jax.tree.map(f, batch)
