"""Pipeline parallelism: a layer stack sharded into stages over a mesh axis.

The reference has no pipeline parallelism of any kind (SURVEY.md §2.10) and
the 4-layer flagship decoder does not need it; this module exists so the
mesh API covers the full taxonomy (dp/tp/sp elsewhere + pp here) for deeper
stacks — the modern LM family (models/llm_decoder.py) is the intended user
once its layer count outgrows one chip.

TPU-native design (the "pipelining" recipe of the scaling-book school, not
a torch-style stage-process fan-out): stage parameters live sharded on a
`"pipe"` mesh axis (leading stage dimension); activations rotate stage to
stage with `jax.lax.ppermute` inside a `lax.scan` over a GPipe schedule of
M microbatches. The scan runs M + P - 1 ticks; at tick t stage s computes
microbatch t - s (edge ticks are the pipeline bubble — computed but
discarded), stage 0 injects microbatch t, and stage P-1's tick-t output is
microbatch t - (P - 1). Everything is differentiable — ppermute's
transpose is the reverse permute — so one `value_and_grad` over the
shard_mapped apply yields correctly stage-sharded gradients.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_stages(layer_params: list, n_stages: int):
    """[L layer pytrees] -> one pytree with leading [n_stages, L/P] axes.

    Layers are assigned contiguously (stage s owns layers
    s*L/P .. (s+1)*L/P - 1), the standard depth split."""
    L = len(layer_params)
    assert L % n_stages == 0, f"{L} layers not divisible by {n_stages} stages"
    per = L // n_stages
    stages = []
    for s in range(n_stages):
        group = layer_params[s * per:(s + 1) * per]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *group))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stages)


def pipeline_spec(stacked, mesh: Mesh, axis: str = "pipe"):
    """NamedSharding pytree: the leading stage axis rides `axis`."""
    def f(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return jax.tree.map(f, stacked)


def pipeline_apply(stacked, layer_fn: Callable, x: jax.Array,
                   mesh: Mesh, n_micro: int, axis: str = "pipe",
                   extras=None, batched=None,
                   data_axis: str | None = None,
                   layer_aux: bool = False):
    """Run x [B, ...] through all stages' layers with GPipe microbatching.

    layer_fn(lparams, x, extras) -> x applies ONE layer; each stage scans
    it over its local [L/P, ...] parameter stack. `extras` (e.g. replicated
    masks or constants) pass through unchanged to every layer. `batched` is
    a pytree of per-example arrays with leading dim B (e.g. cross-attention
    context features): it is split into microbatches and each stage receives
    the slice matching the microbatch it is computing that tick, appended as
    the LAST element of layer_fn's extras tuple.

    `data_axis` composes dp x pp: each microbatch's example dim is sharded
    over that mesh axis (stage params stay replicated across it), so a
    ("pipe", "data") mesh runs D pipelines of P stages side by side with
    ppermute riding only the pipe axis.

    `layer_aux=True` changes layer_fn's contract to return (x, aux_scalar)
    (e.g. a MoE load-balancing term): the function then returns
    (out, aux_sum) where aux_sum totals every real (layer, microbatch)
    contribution — bubble-tick recomputes are excluded — psum'd across
    stages and averaged over the data axis. The caller normalizes (divide
    by n_layers * n_micro for a mean-per-layer-per-microbatch).

    B must divide into n_micro microbatches (each divisible by the data-axis
    size when given). Output equals applying the layers sequentially (exact;
    asserted on the CPU mesh in tests/test_pipeline_parallel.py)."""
    B = x.shape[0]
    Pn = mesh.shape[axis]
    n_stages = jax.tree.leaves(stacked)[0].shape[0]
    assert n_stages == Pn, \
        (f"stacked params have {n_stages} stages but mesh axis "
         f"{axis!r} has {Pn} devices (each stage must map to exactly one "
         f"device slice; a mismatch would silently drop layers)")
    assert B % n_micro == 0, f"batch {B} not divisible by {n_micro}"
    mb = B // n_micro
    if data_axis is not None:
        Dn = mesh.shape[data_axis]
        assert mb % Dn == 0, \
            f"microbatch {mb} not divisible by data axis {Dn}"
    micro = x.reshape((n_micro, mb) + x.shape[1:])
    micro_b = (jax.tree.map(
        lambda a: a.reshape((n_micro, mb) + a.shape[1:]), batched)
        if batched is not None else None)

    def stage_fn(stage_params, h, extras):
        def body(h, lparams):
            out = layer_fn(lparams, h, extras)
            if layer_aux:
                h2, aux = out
                return h2, aux
            return out, ()
        h, auxs = jax.lax.scan(body, h, stage_params)
        aux = jnp.sum(auxs) if layer_aux else jnp.zeros((), jnp.float32)
        return h, aux

    def pipelined(stage_params, micro, extras, micro_b):
        # inside shard_map: stage_params [1, L/P, ...] (this stage's slice),
        # micro [n_micro, mb, ...] (replicated)
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        idx = jax.lax.axis_index(axis)
        last = Pn - 1
        perm = [(i, (i + 1) % Pn) for i in range(Pn)]
        buf0 = jnp.zeros_like(micro[0])
        out0 = jnp.zeros_like(micro)
        aux0 = jnp.zeros((), jnp.float32)

        def tick(carry, t):
            buf, outs, aux_acc = carry
            # stage 0 injects microbatch t (clamped; drain ticks recompute
            # the final microbatch, discarded by the valid gate below)
            inject = micro[jnp.clip(t, 0, n_micro - 1)]
            h = jnp.where(idx == 0, inject, buf)
            # this stage computes microbatch t - idx right now: hand it the
            # matching slice of the batched extras (clamped on bubble ticks
            # whose results are discarded anyway)
            m_raw = t - idx
            ex = extras
            if micro_b is not None:
                m_here = jnp.clip(m_raw, 0, n_micro - 1)
                ex = tuple(extras) + (
                    jax.tree.map(lambda a: a[m_here], micro_b),)
            h, stage_aux = stage_fn(stage_params, h, ex)
            # aux counts only real work: this stage's tick is a bubble when
            # its current microbatch index falls outside [0, n_micro)
            live_here = ((m_raw >= 0) & (m_raw < n_micro)).astype(
                jnp.float32)
            aux_acc = aux_acc + stage_aux * live_here
            # the LAST stage's tick-t result is microbatch m = t - (P-1);
            # bubble ticks (m outside [0, n_micro)) must not touch outs
            m = t - last
            mc = jnp.clip(m, 0, n_micro - 1)
            valid = (idx == last) & (m >= 0) & (m < n_micro)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(valid, h, outs[mc]), mc, 0)
            # rotate activations downstream for the next tick
            buf = jax.lax.ppermute(h, axis, perm)
            return (buf, outs, aux_acc), ()

        (_, outs, aux_acc), _ = jax.lax.scan(tick, (buf0, out0, aux0),
                                             jnp.arange(n_micro + Pn - 1))
        # only the last stage holds real outputs; broadcast to every stage
        # so the result is replicated over the axis (out_specs=P())
        outs = jax.lax.psum(
            jnp.where(idx == last, outs, jnp.zeros_like(outs)), axis)
        aux_acc = jax.lax.psum(aux_acc, axis)  # total over stages' layers
        if data_axis is not None:  # mean over data shards
            aux_acc = jax.lax.pmean(aux_acc, data_axis)
        return outs, aux_acc

    extras = extras if extras is not None else ()
    # microbatch example dim (dim 1 of [n_micro, mb, ...]) rides data_axis
    mb_spec = P() if data_axis is None else P(None, data_axis)
    in_specs = (P(axis), mb_spec, P(), mb_spec)
    out_specs = (mb_spec, P())
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        smap = jax.shard_map(
            pipelined, mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
    else:
        from jax import shard_map
        smap = shard_map(
            pipelined, mesh=mesh,
            in_specs=in_specs,
            out_specs=out_specs,
            check_vma=False,
        )
    out, aux = smap(stacked, micro, extras, micro_b)
    out = out.reshape((B,) + x.shape[1:])
    return (out, aux) if layer_aux else out
