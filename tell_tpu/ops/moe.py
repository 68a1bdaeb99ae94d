"""Mixture-of-Experts SwiGLU FFN with expert parallelism.

The reference has no MoE anywhere (SURVEY.md §2.10 — no expert parallelism
to port); this exists to complete the mesh taxonomy (dp/tp/sp/pp elsewhere +
ep here) for the modern LM family (models/llm_decoder.py, `moe_experts`).

TPU-native design (GShard/Switch school): routing is expressed as dense
one-hot dispatch/combine einsums over STATIC shapes — no gather/scatter, no
data-dependent shapes — so the whole layer is three big MXU contractions
that XLA partitions cleanly when the stacked expert weights [E, ...] are
sharded over an "expert" mesh axis (parallel/mesh.py adds the rule; the
all-to-all falls out of the einsum partitioning). Capacity is a static cap:
tokens routed past an expert's capacity are dropped for that expert (their
residual path still carries them — standard Switch behavior).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .linear import init_linear


def init_moe_ffn(rng: jax.Array, dim: int, ffn_dim: int, num_experts: int
                 ) -> dict:
    """Stacked-expert SwiGLU params: w1/w3 [E, D, F], w2 [E, F, D] plus a
    router [D, E]. Per-expert fan-in init matches the dense ffn
    (ops/linear.py init scaling) so a 1-expert MoE starts equivalent."""
    ks = jax.random.split(rng, 4)
    def stack(k, din, dout):
        return jnp.stack([
            init_linear(jax.random.fold_in(k, e), din, dout, bias=False)["w"]
            for e in range(num_experts)])
    return {
        "router": init_linear(ks[0], dim, num_experts, bias=False),
        "w1": stack(ks[1], dim, ffn_dim),
        "w3": stack(ks[2], dim, ffn_dim),
        "w2": stack(ks[3], ffn_dim, dim),
    }


def _route(params: dict, x: jax.Array, top_k: int
           ) -> tuple[jax.Array, list, jax.Array]:
    """Shared routing math (single source for moe_ffn AND the dense test
    reference, so they cannot drift): returns (probs [N, E],
    chosen [k x [N] expert ids], gate [N, k]).

    Gates: top-1 keeps the RAW router prob (Switch) — renormalizing a
    single choice would make the gate identically 1 and starve the router
    of task-loss gradient; top-k>1 renormalizes over the chosen k (GShard).
    """
    E = params["w1"].shape[0]
    k = min(top_k, E)
    logits = jnp.einsum("nd,de->ne", x.astype(jnp.float32),
                        params["router"]["w"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)                     # [N, E]
    remaining = probs
    chosen, gatevals = [], []
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)                    # [N]
        chosen.append(idx)
        gatevals.append(jnp.take_along_axis(
            probs, idx[:, None], axis=-1)[:, 0])
        remaining = remaining * (1.0 - jax.nn.one_hot(idx, E))
    gate = jnp.stack(gatevals, axis=-1)                         # [N, k]
    if k > 1:
        gate = gate / jnp.maximum(jnp.sum(gate, axis=-1, keepdims=True),
                                  1e-9)
    return probs, chosen, gate


def moe_ffn(params: dict, x: jax.Array, top_k: int = 2,
            capacity_factor: float = 1.25,
            token_mask: jax.Array | None = None
            ) -> tuple[jax.Array, jax.Array]:
    """MoE SwiGLU. x: [N, D] tokens -> ([N, D], aux_loss scalar).

    token_mask [N] bool (True = real token): masked-out tokens (pads) do
    not consume expert capacity, produce zero output, and are excluded from
    the aux statistics — without it, a padded bucket's identical pad
    embeddings all route together and crowd real tokens out of one
    expert's buffer.

    aux_loss is the Switch load-balancing term E * sum_e(f_e * P_e)
    (f_e = fraction of real tokens whose top-1 choice is e, P_e = mean
    router prob over real tokens) — add it to the task loss scaled by the
    caller's coefficient.
    """
    N, D = x.shape
    E = params["w1"].shape[0]
    k = min(top_k, E)
    cap = max(1, int(-(-N * k // E) * capacity_factor))
    cap = min(cap, N)

    probs, chosen, gate = _route(params, x, top_k)
    live = (jnp.ones((N,), jnp.float32) if token_mask is None
            else token_mask.astype(jnp.float32))

    # position of each (token, choice) in its expert's capacity buffer:
    # cumulative count over the flattened [k, N] priority order (choice 0
    # of every token outranks any choice 1 — GShard's dispatch priority).
    # Pads are zeroed BEFORE the cumsum so they never consume a slot.
    sel = jax.nn.one_hot(jnp.stack(chosen), E) * live[None, :, None]
    flat = sel.reshape(k * N, E)                                # [k*N, E]
    pos = jnp.cumsum(flat, axis=0) - flat
    pos = jnp.sum(pos * flat, axis=-1).reshape(k, N)            # [k, N]
    keep = (pos < cap).astype(jnp.float32)                      # [k, N]

    # dispatch [N, E, cap] (0/1) and combine (gate-weighted dispatch)
    pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap)         # [k, N, cap]
    disp = jnp.einsum("kne,knc,kn->nec", sel, pos_oh, keep)
    comb = jnp.einsum("kne,knc,kn,nk->nec", sel, pos_oh, keep,
                      gate.astype(jnp.float32))

    xin = jnp.einsum("nec,nd->ecd", disp, x.astype(jnp.float32)
                     ).astype(x.dtype)                          # [E, cap, D]
    h = jax.nn.silu(jnp.einsum("ecd,edf->ecf", xin, params["w1"]
                               ).astype(jnp.float32)).astype(x.dtype)
    h = h * jnp.einsum("ecd,edf->ecf", xin, params["w3"])
    out_e = jnp.einsum("ecf,efd->ecd", h, params["w2"])         # [E, cap, D]
    out = jnp.einsum("nec,ecd->nd", comb, out_e.astype(jnp.float32)
                     ).astype(x.dtype)

    # Switch aux loss on the top-1 assignment, over real tokens only
    n_live = jnp.maximum(jnp.sum(live), 1.0)
    f = jnp.sum(sel[0], axis=0) / n_live
    P = jnp.sum(probs * live[:, None], axis=0) / n_live
    aux = E * jnp.sum(f * P)
    return out, aux


def moe_ffn_dense_reference(params: dict, x: jax.Array, top_k: int = 2
                            ) -> jax.Array:
    """Infinite-capacity reference: every token runs its top-k experts
    densely (no capacity drops). Used by tests to validate the einsum
    dispatch path when cap >= all routed tokens. Routing comes from the
    same _route helper as moe_ffn, so the two cannot drift."""
    N, D = x.shape
    E = params["w1"].shape[0]
    k = min(top_k, E)
    probs, chosen, gate = _route(params, x, top_k)
    out = jnp.zeros((N, D), jnp.float32)
    for j in range(k):
        for e in range(E):
            w1, w3, w2 = params["w1"][e], params["w3"][e], params["w2"][e]
            h = jax.nn.silu((x @ w1).astype(jnp.float32)).astype(x.dtype)
            y = (h * (x @ w3)) @ w2
            m = (chosen[j] == e).astype(jnp.float32)[:, None]
            out = out + m * gate[:, j:j + 1] * y.astype(jnp.float32)
    return out.astype(x.dtype)
