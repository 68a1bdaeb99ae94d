"""A/B experiments on the fused decode-attention kernel (real chip).

Variants (VARIANT env):
  current   — shipped kernel (loop over b,h; per-head softmax)
  batched   — one batched dot_general over heads per batch row + a single
              stacked softmax over [H*MG, S]
  batched4  — batched variant at BB=4
Measures 100 chained kernel calls (slope timing, see bench.py).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", "64"))
H, hd = 16, 64
MG = 20          # 4 modalities x beam 5
S = int(os.environ.get("S", "640"))
VARIANT = os.environ.get("VARIANT", "batched")
dtype = jnp.bfloat16


def _kernel_batched(q_ref, k_ref, v_ref, bias_ref, o_ref, *, H, BB):
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        kt = k_ref[b]                                 # [H, hd, S]
        vt = v_ref[b]                                 # [H, hd, S]
        scores = jax.lax.dot_general(
            q, kt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, S]
        scores = scores + bias_ref[b][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(vt.dtype), vt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)       # [H, MG, hd]
        o_ref[b] = out.astype(o_ref.dtype)


def fused_batched(q, k, v, bias, BB):
    Bn = q.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel_batched, H=H, BB=BB),
        out_shape=jax.ShapeDtypeStruct((Bn, H, MG, hd), q.dtype),
        grid=(Bn // BB,),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H, hd, S), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, H, hd, S), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, MG, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q, k, v, bias)


def _kernel_q4split(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref, *,
                    H, BB, hd2):
    """Concat-free int4 variant: unpack nibbles into two [H, hd/2, S]
    halves and contract each against the matching half of q / write each
    half of the output — no sublane concatenation of a [H, hd, S] tile."""
    for b in range(BB):
        q = q_ref[b]                                  # [H, MG, hd]
        xi = k_ref[b].astype(jnp.int32)               # [H, hd2, S]
        k_lo = ((xi << 28) >> 28).astype(q_ref.dtype)
        k_hi = ((xi << 24) >> 28).astype(q_ref.dtype)
        dn = (((2,), (1,)), ((0,), (0,)))
        scores = (jax.lax.dot_general(q[:, :, :hd2], k_lo, dn,
                                      preferred_element_type=jnp.float32)
                  + jax.lax.dot_general(q[:, :, hd2:], k_hi, dn,
                                        preferred_element_type=jnp.float32))
        scores = scores * ks_ref[b] + bias_ref[b][None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        p = (p * vs_ref[b]).astype(q_ref.dtype)
        yi = v_ref[b].astype(jnp.int32)
        v_lo = ((yi << 28) >> 28).astype(q_ref.dtype)
        v_hi = ((yi << 24) >> 28).astype(q_ref.dtype)
        dv = (((2,), (2,)), ((0,), (0,)))
        out_lo = jax.lax.dot_general(p, v_lo, dv,
                                     preferred_element_type=jnp.float32)
        out_hi = jax.lax.dot_general(p, v_hi, dv,
                                     preferred_element_type=jnp.float32)
        o_ref[b] = jnp.concatenate([out_lo, out_hi],
                                   axis=-1).astype(o_ref.dtype)


def fused_q4split(q, k4, k_s, v4, v_s, bias, BB):
    Bn = q.shape[0]
    hd2 = k4.shape[2]
    kv_spec = pl.BlockSpec((BB, H, hd2, S), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((BB, H, 1, S), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_q4split, H=H, BB=BB, hd2=hd2),
        out_shape=jax.ShapeDtypeStruct((Bn, H, MG, hd), q.dtype),
        grid=(Bn // BB,),
        in_specs=[
            pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((BB, MG, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, H, MG, hd), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q, k4, k_s, v4, v_s, bias)


def main():
    ks = jr.split(jr.PRNGKey(0), 4)
    q = jr.normal(ks[0], (B, H, MG, hd), dtype)
    k = jr.normal(ks[1], (B, H, hd, S), dtype)
    v = jr.normal(ks[2], (B, H, hd, S), dtype)
    bias = jnp.zeros((B, MG, S), jnp.float32)

    if VARIANT in ("q8", "q4", "q4split"):
        import sys as _s
        _s.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tell_tpu.models.decoder import _quantize_kv, _quantize_kv4
        from tell_tpu.ops.kernels.decode_attention import (
            fused_decode_attention_q8, reference_decode_attention_q8)
        quant = _quantize_kv if VARIANT == "q8" else _quantize_kv4
        k8, k_s = quant(k.astype(jnp.float32))
        v8, v_s = quant(v.astype(jnp.float32))
        if VARIANT == "q4split":
            qfn = lambda qq, kk, kks, vv, vvs, bb: fused_q4split(
                qq, kk, kks, vv, vvs, bb, BB=2)
        else:
            qfn = fused_decode_attention_q8
        ref = reference_decode_attention_q8(q, k8, k_s, v8, v_s, bias)
        got = qfn(q, k8, k_s, v8, v_s, bias)
        err = jnp.max(jnp.abs(got.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        print(f"{VARIANT}: max abs err vs jnp twin = {float(err):.4g}")
        import time as _t
        @jax.jit
        def chain_q(qq, bump):
            def body(qc, _):
                o = qfn(qc, k8, k_s, v8, v_s, bias)
                return o + qc * 0, ()
            out, _ = jax.lax.scan(body, qq + bump.astype(qq.dtype), None,
                                  length=100)
            return out.astype(jnp.float32).sum()
        def run_q(n):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                acc = acc + chain_q(q, acc * 0)
            return float(acc)
        run_q(1)
        t0 = _t.perf_counter(); run_q(1); lo = _t.perf_counter() - t0
        t0 = _t.perf_counter(); run_q(5); hi = _t.perf_counter() - t0
        per100 = (hi - lo) / 4
        print(f"{VARIANT}: {per100*1000:.1f} ms per 100 calls "
              f"({per100*10:.3f} ms/call, B={B} S={S})")
        return

    if VARIANT == "current":
        from tell_tpu.ops.kernels.decode_attention import (
            fused_decode_attention)
        fn = fused_decode_attention
    elif VARIANT == "batched":
        fn = lambda *a: fused_batched(*a, BB=2)
    elif VARIANT == "batched4":
        fn = lambda *a: fused_batched(*a, BB=4)
    else:
        raise SystemExit(f"unknown VARIANT {VARIANT}")

    # parity vs jnp math first
    from tell_tpu.ops.kernels.decode_attention import (
        reference_decode_attention)
    ref = reference_decode_attention(q, k, v, bias)
    got = fn(q, k, v, bias)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"{VARIANT}: max abs err vs jnp = {float(err):.4g}")

    @jax.jit
    def chain(q, bump):
        def body(qc, _):
            o = fn(qc, k, v, bias)
            return o + qc * 0, ()
        out, _ = jax.lax.scan(body, q + bump.astype(q.dtype), None,
                              length=100)
        return out.astype(jnp.float32).sum()

    def run_k(n):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            acc = acc + chain(q, acc * 0)
        return float(acc)

    run_k(1)
    t0 = time.perf_counter(); run_k(1); lo = time.perf_counter() - t0
    t0 = time.perf_counter(); run_k(5); hi = time.perf_counter() - t0
    per100 = (hi - lo) / 4
    print(f"{VARIANT}: {per100*1000:.1f} ms per 100 calls "
          f"({per100*10:.3f} ms/call, B={B} S={S})")


if __name__ == "__main__":
    main()
