"""Dynamic and lightweight causal convolutions (Wu et al. 2019, "Pay Less
Attention with Lightweight and Dynamic Convolutions").

Replaces the reference's DynamicConv1dTBC / LightweightConv1dTBC
(/root/reference/tell/modules/convolutions/dynamic.py:25-361,
 /root/reference/tell/modules/convolutions/lightweight.py:90-240) with a
TPU-native design:

* batch-major [B, T, C] layout (no TBC transposes; rows map onto the MXU/VPU
  lanes directly),
* the training path is expressed as K static shift-and-FMA terms over a
  zero-padded input, which XLA fuses into one VPU loop — semantically equal
  to the reference's band-matrix "expanded" path (softmax over the full K
  taps, taps that reach before t=0 see zeros),
* the decode path is a single-step function over a fixed-shape ring buffer
  of the last K-1 inputs, carried through `lax.scan` — this replaces the
  reference's dict-based incremental state and is exactly equivalent to its
  grow-then-slice buffer (early steps see zeros, as unfold1d zero-pads).

A fused Pallas kernel (weight-prediction + softmax + banded FMA in VMEM) is
the planned fast path; this jnp implementation is the semantic reference it
will be tested against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import dropout
from .linear import init_linear, linear


def init_dynamic_conv(rng: jax.Array, conv_dim: int, kernel_size: int,
                      num_heads: int, bias: bool = False,
                      conv_bias: bool = False) -> dict:
    """Weight-prediction linear: conv_dim -> num_heads * kernel_size.

    Mirrors the reference defaults used by the decoder layers (xavier init,
    no bias on the predictor, no conv bias;
    /root/reference/tell/models/decoder_faces_objects.py:205-208).
    """
    p = {"weight_linear": init_linear(rng, conv_dim,
                                      num_heads * kernel_size, bias=bias)}
    if conv_bias:
        p["conv_bias"] = jnp.zeros((conv_dim,), jnp.float32)
    return p


def _conv_with_weights(x: jax.Array, w: jax.Array, kernel_size: int,
                       num_heads: int) -> jax.Array:
    """Causal per-head conv: out[b,t,h,:] = sum_k w[b,t,h,k] * x[b,t-K+1+k,h,:].

    x: [B, T, C], w: [B, T, H, K] (already normalized / dropped out).
    """
    B, T, C = x.shape
    K, H = kernel_size, num_heads
    R = C // H
    xh = x.reshape(B, T, H, R)
    out = jnp.zeros((B, T, H, R), x.dtype)
    for k in range(K):
        shift = K - 1 - k  # tap k looks `shift` steps into the past
        if shift == 0:
            xs = xh
        elif shift >= T:
            continue  # entirely out of range: contributes zeros
        else:
            xs = jnp.pad(xh[:, : T - shift], ((0, 0), (shift, 0),
                                              (0, 0), (0, 0)))
        out = out + w[:, :, :, k : k + 1] * xs
    return out.reshape(B, T, C)


def _can_fuse(params: dict, query, weight_dropout: float,
              deterministic: bool, num_heads: int, C: int) -> bool:
    """The fused Pallas path covers the decoder's exact configuration:
    self-predicted weights, no predictor bias, no conv bias, and no active
    weight-dropout (the kernel is deterministic)."""
    from .kernels.dispatch import fused_kernels_enabled
    return (fused_kernels_enabled()
            and query is None
            and "b" not in params["weight_linear"]
            and "conv_bias" not in params
            and (deterministic or weight_dropout == 0.0)
            and C % num_heads == 0
            and C % 128 == 0)


def dynamic_conv(params: dict, x: jax.Array, *, kernel_size: int,
                 num_heads: int, weight_softmax: bool = True,
                 weight_dropout: float = 0.0,
                 rng: jax.Array | None = None,
                 deterministic: bool = True,
                 query: jax.Array | None = None) -> jax.Array:
    """Full-sequence dynamic conv. x: [B, T, C] -> [B, T, C]."""
    B, T, C = x.shape
    if _can_fuse(params, query, weight_dropout, deterministic, num_heads, C):
        from .kernels.dynamic_conv import fused_dynamic_conv
        w = params["weight_linear"]["w"]  # [C, H*K] (h-major)
        w_km = w.reshape(C, num_heads, kernel_size) \
                .transpose(0, 2, 1).reshape(C, kernel_size * num_heads)
        return fused_dynamic_conv(x, w_km.astype(x.dtype), kernel_size,
                                  num_heads, weight_softmax)
    q = x if query is None else query
    w = linear(params["weight_linear"], q)
    w = w.reshape(B, T, num_heads, kernel_size)
    if weight_softmax:
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
    w = dropout(w, weight_dropout, rng, deterministic)
    out = _conv_with_weights(x, w, kernel_size, num_heads)
    if "conv_bias" in params:
        out = out + params["conv_bias"]
    return out


def init_conv_state(batch: int, conv_dim: int, kernel_size: int,
                    dtype=jnp.float32) -> jax.Array:
    """Ring buffer of the last K-1 inputs, zero-initialized: [B, K-1, C]."""
    return jnp.zeros((batch, max(kernel_size - 1, 0), conv_dim), dtype)


# Round-5 negative finding (see models/decoder.py): a one-hot MXU einsum
# variant of the row_gather below measured 272.6 vs 334.7 captions/s at
# the flagship beam shape and was removed — jnp.take stays the one path.


def dynamic_conv_step(params: dict, x_t: jax.Array, state: jax.Array, *,
                      kernel_size: int, num_heads: int,
                      weight_softmax: bool = True,
                      row_gather: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array]:
    """One decode step. x_t: [B, C], state: [B, K-1, C] -> (out [B, C], state').

    Weight dropout is inference-off by construction (decode is deterministic).

    row_gather [B] int32: beam-search parent indices fused into the window
    READ (state rows are permuted while being read) instead of a separate
    gather+rewrite of the whole ring buffer after beam selection.
    Measured NEUTRAL end-to-end on v5e (304 vs 305 captions/s): XLA
    materializes the gathered buffer anyway, so HBM traffic is
    unchanged — kept because it is exact and drops the separate
    reorder_fn dispatch. (A true ring-buffer layout built on it was
    measured SLOWER and removed — see the note below.)
    """
    B, C = x_t.shape
    K, H = kernel_size, num_heads
    R = C // H
    w = linear(params["weight_linear"], x_t).reshape(B, H, K)
    if weight_softmax:
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x_t.dtype)
    if row_gather is not None:
        state = jnp.take(state, row_gather, axis=0)
    window = jnp.concatenate([state, x_t[:, None, :]], axis=1)  # [B, K, C]
    wh = window.reshape(B, K, H, R)
    out = jnp.einsum("bhk,bkhr->bhr", w, wh).reshape(B, C)
    if "conv_bias" in params:
        out = out + params["conv_bias"]
    new_state = window[:, 1:, :]
    return out, new_state


# Negative finding (round 4, measured on v5e-1): a time-slot ring conv
# state (write ONE [B, C] slot per step at phase gstep mod (K-1), resolve
# beam lineage at read time through an ancestor-row table) was built and
# A/B'd against the shifting window above. It LOST both arms — micro-batch
# beam-5 B=128 len=100: 302.9 vs 336.0 captions/s; engine saturated
# capacity slots=16 len=32: 105.0 vs 108.1 captions/s — because the
# per-step [B*(K-1), C] jnp.take lineage gather costs more than the ~68
# MB/step of window rewrites it saves, and the decode roofline shows the
# step is not HBM-write-bound (ARCHITECTURE.md "Decode roofline"). The
# layout was removed (git history: TELL_TPU_CONV_RING) so decode carries
# exactly one conv-state layout.


# ---------------------------------------------------------------------------
# Lightweight conv: same convolution with a fixed learned per-head kernel.
# ---------------------------------------------------------------------------

def init_lightweight_conv(rng: jax.Array, kernel_size: int, num_heads: int,
                          conv_bias: bool = False, conv_dim: int = 0) -> dict:
    bound = (6.0 / (1 + kernel_size)) ** 0.5  # xavier on [H, 1, K]
    p = {"weight": jax.random.uniform(rng, (num_heads, kernel_size),
                                      jnp.float32, -bound, bound)}
    if conv_bias:
        p["conv_bias"] = jnp.zeros((conv_dim,), jnp.float32)
    return p


def _lightweight_weights(params: dict, weight_softmax: bool) -> jax.Array:
    w = params["weight"]
    if weight_softmax:
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
    return w


def lightweight_conv(params: dict, x: jax.Array, *, kernel_size: int,
                     num_heads: int, weight_softmax: bool = True,
                     weight_dropout: float = 0.0,
                     rng: jax.Array | None = None,
                     deterministic: bool = True) -> jax.Array:
    B, T, C = x.shape
    w = _lightweight_weights(params, weight_softmax).astype(x.dtype)
    w = dropout(w, weight_dropout, rng, deterministic)
    wbt = jnp.broadcast_to(w[None, None], (B, T, num_heads, kernel_size))
    out = _conv_with_weights(x, wbt, kernel_size, num_heads)
    if "conv_bias" in params:
        out = out + params["conv_bias"]
    return out


def lightweight_conv_step(params: dict, x_t: jax.Array, state: jax.Array, *,
                          kernel_size: int, num_heads: int,
                          weight_softmax: bool = True,
                          row_gather: jax.Array | None = None
                          ) -> tuple[jax.Array, jax.Array]:
    B, C = x_t.shape
    K, H = kernel_size, num_heads
    R = C // H
    w = _lightweight_weights(params, weight_softmax).astype(x_t.dtype)
    if row_gather is not None:
        state = jnp.take(state, row_gather, axis=0)
    window = jnp.concatenate([state, x_t[:, None, :]], axis=1)
    wh = window.reshape(B, K, H, R)
    out = jnp.einsum("hk,bkhr->bhr", w, wh).reshape(B, C)
    if "conv_bias" in params:
        out = out + params["conv_bias"]
    return out, window[:, 1:, :]
