"""A/B experiments on long-context decode attention (real chip).

Compares, at production head shapes (H=16, hd=64, MG=20) and long S:
  dispatch — fused_decode_attention's policy (single-shot / tiled / jnp)
  single1  — single-shot kernel forced to BB=1 (only if it fits VMEM)
  tiled    — S-tiled online-softmax kernel (BB/TS from _pick_tile or env)
  jnp      — unfused reference math
Slope timing as in tools/kernel_variants.py / bench.py.

  S=1024 VARIANT=tiled python tools/longctx_variants.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

from tell_tpu.ops.kernels import decode_attention as da

B = int(os.environ.get("B", "64"))
H, hd = 16, 64
MG = 20          # 4 modalities x beam 5
S = int(os.environ.get("S", "2048"))
VARIANT = os.environ.get("VARIANT", "tiled")
dtype = jnp.bfloat16


def main():
    ks = jr.split(jr.PRNGKey(0), 4)
    q = jr.normal(ks[0], (B, H, MG, hd), dtype)
    k = jr.normal(ks[1], (B, H, hd, S), dtype)
    v = jr.normal(ks[2], (B, H, hd, S), dtype)
    bias = jnp.zeros((B, MG, S), jnp.float32)

    if VARIANT == "dispatch":
        fn = da.fused_decode_attention
        print("dispatch picks: BB=",
              da._pick_bb(B, H, hd, S, MG, 2), "tile=",
              da._pick_tile(B, H, hd, S, MG, 2))
    elif VARIANT == "single1":
        assert da._pick_bb(B, H, hd, S, MG, 2) is not None
        # single-shot path with BB forced: rebuild the pallas call inline
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def fn(q, k, v, bias):
            return pl.pallas_call(
                functools.partial(da._kernel, H=H, BB=1),
                out_shape=jax.ShapeDtypeStruct((B, H, MG, hd), q.dtype),
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1, H, MG, hd), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, hd, S), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, H, hd, S), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, MG, S), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, H, MG, hd),
                                       lambda b: (b, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(q, k, v, bias)
    elif VARIANT == "tiled":
        tile = da._pick_tile(B, H, hd, S, MG, 2) or (1, 128)
        bb = int(os.environ.get("BB") or tile[0])
        ts = int(os.environ.get("TS") or tile[1])
        print(f"tiled: BB={bb} TS={ts}")
        fn = lambda *a: da._tiled_decode_attention(*a, bb, ts)
    elif VARIANT == "jnp":
        fn = da.reference_decode_attention
    else:
        raise SystemExit(f"unknown VARIANT {VARIANT}")

    ref = da.reference_decode_attention(q, k, v, bias)
    got = fn(q, k, v, bias)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    print(f"{VARIANT}: max abs err vs jnp = {float(err):.4g}")

    @jax.jit
    def chain(q, k, v, bias, bump):
        def body(qc, _):
            o = fn(qc, k, v, bias)
            return o + qc * 0, ()
        out, _ = jax.lax.scan(body, q + bump.astype(q.dtype), None,
                              length=100)
        return out.astype(jnp.float32).sum()

    def run_k(n):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            acc = acc + chain(q, k, v, bias, acc * 0)
        return float(acc)

    run_k(1)
    t0 = time.perf_counter(); run_k(1); lo = time.perf_counter() - t0
    t0 = time.perf_counter(); run_k(5); hi = time.perf_counter() - t0
    per100 = (hi - lo) / 4
    kv_bytes = 2 * B * H * hd * S * 2
    bw = kv_bytes * 100 / (hi - lo) * 4 / 1e9
    print(f"{VARIANT}: {per100*1000:.1f} ms per 100 calls "
          f"({per100*10:.3f} ms/call, B={B} S={S}); "
          f"K/V stream ~{bw:.0f} GB/s")


if __name__ == "__main__":
    main()
