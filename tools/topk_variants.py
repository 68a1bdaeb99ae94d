"""A/B experiments: exact top-k over wide logit rows on the real chip.

The decode loop's adaptive top-k spends most of its time in three
lax.top_k sorts (head 5002 + tails 15000/30265 wide). Variants:

  direct    — lax.top_k([N, V], k)
  twolevel  — per-128-block top-k (cheap width-128 sorts) then a final
              top-k over the nb*k candidates; exact for any k
  iterk     — k iterated argmax+mask passes (exact, k full-array scans)

Each is timed standalone over the tail2-sized array (slope timing).

FINDINGS (v5e-1, N=640 V=30265 K=5): standalone direct=132us,
iterk=97us, twolevel=3249us per call — but wiring iterk into
adaptive_top_k REGRESSED end-to-end beam-5 throughput 258.6 -> 191
captions/s: the five masked full-array copies (`.at[rows, i].set`)
each force a [N, V] fp32 materialization inside the decode scan, which
the standalone chain (one live buffer) hides. lax.top_k stays.

  blockmax  — exact block-max selection:
              max-reduce to V/128 block maxima, top-k over maxima,
              gather k blocks, re-top-k. Measured 637us — 5x SLOWER
              than direct: the pad+reshape copy and the block gather
              cost more than the sort, and direct's 117us already sits
              at the [N, V] fp32 HBM-read bound (77 MB / ~800 GB/s), so
              no sort strategy can beat it by more than ~15%. The
              decode top-k's cost is the logits materialization, not
              the sort — which is why the fused-logits kernel
              (TELL_TPU_TOPK) is the only lever left, and it measured
              slower for other reasons (ops/adaptive.py).

  merged-vocab-table — collapsing the whole decode softmax (head words +
              class logits + both projected tails, pad columns folded in)
              into ONE [N, 1024] x [1024, 50267] matmul via a precomputed
              table (ops/adaptive.py merged_decode_table): 230.4 vs 261.9
              captions/s beam-5 B=128 on an idle host. Same HBM bytes,
              ~5 fewer dispatches, 12% SLOWER — the split chain pipelines
              each tail's MXU matmul under the previous cluster's VPU
              sort; the monolith serializes matmul -> 3 sorts with the
              MXU idle. Kept opt-in: TELL_TPU_MERGED_VOCAB=1
              (models/decoder.py decode_vocab_table; parity tests in
              tests/test_adaptive.py).

  bf16-logits — rounding the logits to bf16 in the matmul epilogue so
              the sort + logsumexp read half the bytes measured SLOWER
              end-to-end too: 258.7 vs 266.9 captions/s beam-5 B=128
              (TPU sort of a bf16 key array loses more than the halved
              stream saves, and the f32 path's matmul+consumer overlap
              is already hiding part of the read). Tried and reverted —
              the fp32 raw-logit path stays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

N = int(os.environ.get("N", "640"))
V = int(os.environ.get("V", "30265"))
K = int(os.environ.get("K", "5"))


def direct(x):
    return jax.lax.top_k(x, K)


def twolevel(x):
    n, v = x.shape
    B = 128
    nb = -(-v // B)
    pad = nb * B - v
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    blocks = xp.reshape(n, nb, B)
    bv, bi = jax.lax.top_k(blocks, K)                  # [n, nb, K]
    base = (jnp.arange(nb) * B)[None, :, None]
    cand_v = bv.reshape(n, nb * K)
    cand_i = (bi + base).reshape(n, nb * K)
    fv, fp_ = jax.lax.top_k(cand_v, K)
    fi = jnp.take_along_axis(cand_i, fp_, axis=-1)
    return fv, fi


def blockmax(x):
    """Exact top-k by block-MAX selection: one cheap max-reduce pass over
    [N, V], a small top-k over the nb block maxima, gather only those k
    128-wide blocks, re-top-k over k*128 candidates. Exact because any
    block containing the j-th ranked value has block max >= v_j, and at
    most j-1 blocks have a larger max (each must hold one of ranks
    1..j-1) — so the top-k-by-max blocks cover all top-k values."""
    n, v = x.shape
    B = 128
    nb = -(-v // B)
    if nb <= K:                                        # narrow rows: direct
        return jax.lax.top_k(x, K)
    pad = nb * B - v
    xp = jnp.pad(x, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    blocks = xp.reshape(n, nb, B)
    bm = jnp.max(blocks, axis=-1)                      # [n, nb] reduce
    _, bsel = jax.lax.top_k(bm, K)                     # [n, K] block ids
    cand = jnp.take_along_axis(blocks, bsel[:, :, None], axis=1)
    fv, fp_ = jax.lax.top_k(cand.reshape(n, K * B), K)
    fi = jnp.take_along_axis(bsel, fp_ // B, axis=-1) * B + fp_ % B
    return fv, fi


def iterk(x):
    vals, ids = [], []
    cur = x
    for _ in range(K):
        i = jnp.argmax(cur, axis=-1)
        v = jnp.take_along_axis(cur, i[:, None], axis=-1)[:, 0]
        vals.append(v)
        ids.append(i)
        cur = cur.at[jnp.arange(cur.shape[0]), i].set(-jnp.inf)
    return jnp.stack(vals, -1), jnp.stack(ids, -1)


def slope_time(fn, x):
    @jax.jit
    def chain(x, bump):
        def body(c, _):
            v, i = fn(c)
            return c + (v[:, :1] * 0 + i[:, :1].astype(c.dtype) * 0
                        + bump * 0), v[:, 0]
        out, vs = jax.lax.scan(body, x, None, length=100)
        return vs.sum()

    def run_k(k):
        acc = jnp.zeros((), jnp.float32)
        for _ in range(k):
            acc = acc + chain(x, acc * 0)
        return float(acc)

    run_k(1)
    t0 = time.perf_counter(); run_k(1); lo = time.perf_counter() - t0
    t0 = time.perf_counter(); run_k(5); hi = time.perf_counter() - t0
    return (hi - lo) / 4 / 100


def main():
    x = jr.normal(jr.PRNGKey(0), (N, V), jnp.float32)
    # exactness check
    dv, di = direct(x)
    for name, fn in (("twolevel", twolevel), ("iterk", iterk),
                     ("blockmax", blockmax)):
        v, i = fn(x)
        ok = (jnp.allclose(v, dv) and (i == di).all())
        print(f"{name}: exact={bool(ok)}")
    for name, fn in (("direct", direct), ("twolevel", twolevel),
                     ("iterk", iterk), ("blockmax", blockmax)):
        t = slope_time(fn, x)
        print(f"{name:10s} {t*1e6:8.1f} us/call  (N={N} V={V} K={K})")


if __name__ == "__main__":
    main()
