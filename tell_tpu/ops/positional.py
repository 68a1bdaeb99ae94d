"""Sinusoidal positional embeddings, tensor2tensor style.

Matches the reference's SinusoidalPositionalEmbedding
(/root/reference/tell/modules/token_embedders/positional.py:84-228): sin and
cos blocks are *concatenated* (not interleaved), positions are pad-aware
(non-pad token i gets position padding_idx + 1 + i, pads get padding_idx whose
table row is zero). We precompute a static table once — no grow-on-demand,
which would be a dynamic shape under jit — and compute positions with a
cumsum over the non-pad mask instead of masked_scatter.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_table(n_positions: int, dim: int,
                     padding_idx: int | None = None) -> np.ndarray:
    """Static [n_positions, dim] table; row padding_idx zeroed.

    Returns host numpy (safe to cache across jit traces; XLA constant-folds
    it at each use site).
    """
    max_ts, min_ts = 10000.0, 1.0
    n_timescales = dim // 2
    increment = math.log(max_ts / min_ts) / max(n_timescales - 1, 1)
    inv_timescales = min_ts * np.exp(np.arange(n_timescales) * -increment)
    scaled = np.arange(n_positions)[:, None] * inv_timescales[None, :]
    signal = np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1)
    if dim % 2 == 1:
        signal = np.concatenate([signal, np.zeros((n_positions, 1))], axis=1)
    if padding_idx is not None:
        signal[padding_idx, :] = 0.0
    return np.asarray(signal, np.float32)


def init_learned_positional(rng: jax.Array, n_positions: int, dim: int,
                            padding_idx: int | None = None) -> dict:
    """Trainable position-embedding table, normal(0, 0.1) init with the
    padding row zeroed — LearnedPositionalEmbedding semantics
    (/root/reference/tell/modules/token_embedders/positional.py:12-81,
    reset_parameters at :29-33). Lookup shares positional_embed(): pad-aware
    positions from make_positions plus a carried start_pos during decode,
    exactly like the sinusoidal path (the reference's incremental branch
    :51-57 carries the last position in incremental_state)."""
    table = 0.1 * jax.random.normal(rng, (n_positions, dim), jnp.float32)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return {"table": table}


def make_positions(ids: jax.Array, padding_idx: int) -> jax.Array:
    """Pad-aware positions: non-pad tokens count up from padding_idx + 1.

    Right-padding only (the framework always right-pads). Equivalent to the
    reference's make_positions with left_pad=False
    (/root/reference/tell/modules/token_embedders/positional.py:231-268).
    """
    mask = ids != padding_idx
    positions = jnp.cumsum(mask.astype(jnp.int32), axis=-1) + padding_idx
    return jnp.where(mask, positions, padding_idx)


def sinusoidal_embed(table: jax.Array, ids: jax.Array, padding_idx: int,
                     start_pos: jax.Array | int = 0) -> jax.Array:
    """Look up positional embeddings for a (possibly padded) id tensor.

    start_pos shifts non-pad positions; used during incremental decode where
    the carried decode state tracks how many tokens were already emitted.
    A scalar shifts every row; a [B] vector shifts per row (continuous
    batching admits requests at different times, so decode rows carry
    independent step counters — serving/engine.py).
    """
    positions = make_positions(ids, padding_idx)
    mask = ids != padding_idx
    start = jnp.asarray(start_pos)
    if start.ndim == 1:
        start = start[:, None]            # per-row: [B] -> [B, 1]
    positions = jnp.where(mask, positions + start, padding_idx)
    return jnp.take(table, positions, axis=0)


# The lookup is table-agnostic: a learned table (init_learned_positional)
# and the static sinusoidal table use identical position semantics.
positional_embed = sinusoidal_embed
