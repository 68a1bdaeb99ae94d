"""Adaptive embedding / softmax tests (SURVEY.md §4 invariant 2)."""
import jax
import jax.numpy as jnp
import numpy as np

from tell_tpu.ops import (
    adaptive_embed, adaptive_log_probs, adaptive_softmax_loss,
    init_adaptive_embedding, init_adaptive_softmax,
)

CUTOFFS = (50, 200, 500)  # small-vocab analogue of (5000, 20000, 50265)
D = 32


def make_params(factor=1.0):
    emb = init_adaptive_embedding(jax.random.PRNGKey(0), CUTOFFS,
                                  initial_dim=D, factor=factor, output_dim=D)
    sm = init_adaptive_softmax(jax.random.PRNGKey(1), CUTOFFS, D,
                               factor=factor)
    return emb, sm


def test_log_probs_normalized():
    emb, sm = make_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (7, D))
    lp = adaptive_log_probs(sm, emb, x, CUTOFFS)
    assert lp.shape == (7, CUTOFFS[-1])
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(lp, axis=-1)), 0.0, atol=1e-4)


def test_loss_equals_negative_log_prob():
    """Cluster-factored CE loss == -log p from the factored distribution."""
    emb, sm = make_params()
    N = 16
    x = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    targets = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, CUTOFFS[-1])
    targets = targets.at[0].set(1)  # one pad token
    loss, n, _ = adaptive_softmax_loss(sm, emb, x, targets, CUTOFFS, pad_id=1)
    lp = adaptive_log_probs(sm, emb, x, CUTOFFS)
    picked = jnp.take_along_axis(lp, targets[:, None], axis=-1)[:, 0]
    expected = -jnp.sum(picked * (targets != 1))
    np.testing.assert_allclose(float(loss), float(expected), rtol=1e-5)
    assert int(n) == int(jnp.sum(targets != 1))


def test_capacity_compaction_matches_dense():
    emb, sm = make_params()
    N = 32
    x = jax.random.normal(jax.random.PRNGKey(2), (N, D))
    targets = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, CUTOFFS[-1])
    dense, n1, _ = adaptive_softmax_loss(sm, emb, x, targets, CUTOFFS)
    capped, n2, aux = adaptive_softmax_loss(sm, emb, x, targets, CUTOFFS,
                                            tail_capacity=(N, N))
    np.testing.assert_allclose(float(dense), float(capped), rtol=1e-5)
    assert int(aux["tail_dropped"]) == 0
    # Tiny capacity drops tail rows -> loss strictly smaller, dropped counted
    tiny, _, aux2 = adaptive_softmax_loss(sm, emb, x, targets, CUTOFFS,
                                          tail_capacity=(1, 1))
    assert float(tiny) < float(dense)
    n_tail = int(jnp.sum(targets >= CUTOFFS[0]))
    assert int(aux2["tail_dropped"]) == max(n_tail - 2, 0)


def test_top_k_matches_full_log_probs():
    from tell_tpu.ops.adaptive import adaptive_top_k
    emb, sm = make_params()
    x = jax.random.normal(jax.random.PRNGKey(7), (9, D))
    lp = adaptive_log_probs(sm, emb, x, CUTOFFS)
    for k in (1, 5, 17):
        vals, ids = adaptive_top_k(sm, emb, x, CUTOFFS, k)
        ref_vals, ref_ids = jax.lax.top_k(lp, k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_top_k_merged_vocab_table_matches_plain():
    """Decode fast path: the collapsed one-matmul table reproduces the
    per-cluster head/tail chain (values to float-reassociation tolerance,
    ids exactly) — for factor 1 AND projected tails (factor 2)."""
    from tell_tpu.ops.adaptive import adaptive_top_k, merged_decode_table
    for factor in (1.0, 2.0):
        emb, sm = make_params(factor=factor)
        x = jax.random.normal(jax.random.PRNGKey(8), (9, D))
        table = merged_decode_table(sm, emb, CUTOFFS)
        n_tails = len(CUTOFFS) - 1
        assert table.shape == (D, CUTOFFS[-1] + n_tails)
        for k in (1, 5):
            vals, ids = adaptive_top_k(sm, emb, x, CUTOFFS, k)
            mv, mi = adaptive_top_k(sm, emb, x, CUTOFFS, k,
                                    vocab_table=table)
            np.testing.assert_array_equal(np.asarray(mi), np.asarray(ids))
            np.testing.assert_allclose(np.asarray(mv), np.asarray(vals),
                                       atol=1e-5)


def test_merged_vocab_table_padding_columns_zeroed():
    """padding_idx column of the head-word block and of each tail band
    yields logit exactly 0 (the _pad_col_mask contract), so the merged
    path keeps the tied pad row inert."""
    from tell_tpu.ops.adaptive import (adaptive_log_probs,
                                       adaptive_top_k, merged_decode_table)
    emb, sm = make_params()
    x = jax.random.normal(jax.random.PRNGKey(9), (4, D))
    table = merged_decode_table(sm, emb, CUTOFFS, padding_idx=0)
    logits = np.asarray(jnp.dot(x, table))
    c0 = CUTOFFS[0]
    n_tails = len(CUTOFFS) - 1
    np.testing.assert_array_equal(logits[:, 0], 0.0)          # head pad col
    off = c0 + n_tails
    for lo, hi in zip(CUTOFFS[:-1], CUTOFFS[1:]):
        np.testing.assert_array_equal(logits[:, off], 0.0)    # tail pad col
        off += hi - lo
    # and the end-to-end log-probs still agree with the dense reference
    lp = adaptive_log_probs(sm, emb, x, CUTOFFS)
    mv, mi = adaptive_top_k(sm, emb, x, CUTOFFS, 3, vocab_table=table)
    rv, ri = jax.lax.top_k(lp, 3)
    np.testing.assert_array_equal(np.asarray(mi), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(mv), np.asarray(rv), atol=1e-5)


def test_embedding_bands_and_pinned_rows():
    emb, _ = make_params()
    ids = jnp.array([[0, 1, 49, 50, 199, 200, 499]])
    out = adaptive_embed(emb, ids, CUTOFFS, D)
    assert out.shape == (1, 7, D)
    # padding_idx=0 pins band rows: global ids 0, 50, 200 embed to zero
    np.testing.assert_allclose(np.asarray(out[0, 0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out[0, 3]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out[0, 5]), 0.0, atol=1e-7)
    assert np.abs(np.asarray(out[0, 1])).sum() > 0

    # pinned rows receive zero gradient
    def f(e):
        return jnp.sum(adaptive_embed(e, ids, CUTOFFS, D) ** 2)
    g = jax.grad(f)(emb)
    np.testing.assert_allclose(np.asarray(g["bands"][0]["embed"][0]), 0.0)
    np.testing.assert_allclose(np.asarray(g["bands"][1]["embed"][0]), 0.0)
    assert np.abs(np.asarray(g["bands"][0]["embed"][1])).sum() > 0


def test_tied_weights_get_gradients_from_loss():
    """Tying: the embedding tables receive gradients through the softmax."""
    emb, sm = make_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (8, D))
    targets = jnp.array([3, 60, 250, 7, 499, 51, 2, 180])

    def f(e):
        loss, n, _ = adaptive_softmax_loss(sm, e, x, targets, CUTOFFS)
        return loss / n
    g = jax.grad(f)(emb)
    for b in range(3):
        assert np.abs(np.asarray(g["bands"][b]["embed"])).sum() > 0


def test_factor_reduces_tail_dims():
    emb = init_adaptive_embedding(jax.random.PRNGKey(0), CUTOFFS,
                                  initial_dim=D, factor=2.0, output_dim=D)
    assert emb["bands"][0]["embed"].shape[1] == D
    assert emb["bands"][1]["embed"].shape[1] == D // 2
    assert emb["bands"][2]["embed"].shape[1] == D // 4
    sm = init_adaptive_softmax(jax.random.PRNGKey(1), CUTOFFS, D, factor=2.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, D))
    lp = adaptive_log_probs(sm, emb, x, CUTOFFS)
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(lp, axis=-1)), 0.0, atol=1e-4)


def test_adaptive_top_k_fused_matches_plain(monkeypatch):
    """The Pallas fused top-k path (interpret on CPU) must agree with the
    pure-XLA path on the full factored distribution."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tell_tpu.ops.adaptive import (adaptive_top_k,
                                       init_adaptive_embedding,
                                       init_adaptive_softmax)
    cutoffs = (50, 200, 500)
    rng = jax.random.PRNGKey(0)
    emb = init_adaptive_embedding(rng, cutoffs, initial_dim=32, factor=1.0,
                                  output_dim=32)
    sm = init_adaptive_softmax(jax.random.fold_in(rng, 1), cutoffs, 32)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 32))
    monkeypatch.delenv("TELL_TPU_TOPK", raising=False)
    rv, ri = adaptive_top_k(sm, emb, x, cutoffs, 5)
    monkeypatch.setenv("TELL_TPU_TOPK", "1")
    monkeypatch.setenv("TELL_TPU_FUSED", "1")  # interpret mode off-TPU
    fv, fi = adaptive_top_k(sm, emb, x, cutoffs, 5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ri))


def test_fast_top_k_exact_vs_lax():
    """Block-max prefilter top-k must be EXACT (values and ids) on
    continuous inputs, including clustered layouts where all winners
    share one block, and must fall back cleanly on narrow rows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tell_tpu.ops.adaptive import fast_top_k

    rng = np.random.RandomState(0)
    for cols in (512, 700, 5021, 30265):
        x = jnp.asarray(rng.randn(64, cols).astype(np.float32))
        for k in (1, 5, 8):
            want_v, want_i = jax.lax.top_k(x, k)
            got_v, got_i = fast_top_k(x, k)
            np.testing.assert_array_equal(np.asarray(got_v),
                                          np.asarray(want_v))
            np.testing.assert_array_equal(np.asarray(got_i),
                                          np.asarray(want_i))
    # adversarial: all top-5 values inside ONE 128-lane block
    x = rng.randn(8, 4096).astype(np.float32)
    x[:, 256:261] += 100.0
    got_v, got_i = fast_top_k(jnp.asarray(x), 5)
    want_v, want_i = jax.lax.top_k(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    # bf16 path
    xb = jnp.asarray(rng.randn(16, 2048), jnp.bfloat16)
    gv, gi = fast_top_k(xb, 5)
    wv, wi = jax.lax.top_k(xb, 5)
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))
    # ragged width + -inf masked logits: the ragged tail pads with true
    # -inf (not finfo.min), so masked columns still outrank pad lanes and
    # ids never leave [0, n)
    n = 1500  # not a multiple of the 128 block
    xm = rng.randn(16, n).astype(np.float32)
    xm[:, 40:] = -np.inf  # fewer finite values than one block
    gv, gi = fast_top_k(jnp.asarray(xm), 8)
    wv, wi = jax.lax.top_k(jnp.asarray(xm), 8)
    assert int(np.asarray(gi).max()) < n
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(wv))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(wi))


def test_topk_mode_defaults(monkeypatch):
    """Off-TPU the exact sort is the default (parity tests stay exact);
    TELL_TPU_APPROX_TOPK=1/0 forces approx/exact regardless of backend.
    On TPU approx is the default (measured +10% beam-5 throughput with
    caption-level agreement 1.0 at trained margins — QUALITY_r03.json)."""
    import jax

    from tell_tpu.ops.adaptive import topk_mode

    monkeypatch.delenv("TELL_TPU_APPROX_TOPK", raising=False)
    expected = "approx" if jax.default_backend() == "tpu" else "exact"
    assert topk_mode() == expected
    monkeypatch.setenv("TELL_TPU_APPROX_TOPK", "1")
    assert topk_mode() == "approx"
    monkeypatch.setenv("TELL_TPU_APPROX_TOPK", "0")
    assert topk_mode() == "exact"


def test_approx_topk_optin_close_to_exact(monkeypatch):
    """TELL_TPU_APPROX_TOPK=1 swaps the cluster sorts for
    jax.lax.approx_max_k (recall ~0.99/element on TPU; exact fallback off
    TPU). The opt-in must keep the same API and near-identical results."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tell_tpu.ops.adaptive import (adaptive_top_k,
                                       init_adaptive_embedding,
                                       init_adaptive_softmax)

    cutoffs = (40, 120, 300)
    emb = init_adaptive_embedding(jax.random.PRNGKey(0), cutoffs,
                                  initial_dim=32, factor=1.0, output_dim=32)
    sm = init_adaptive_softmax(jax.random.PRNGKey(1), cutoffs, 32,
                               factor=1.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 32))
    monkeypatch.delenv("TELL_TPU_APPROX_TOPK", raising=False)
    v0, i0 = adaptive_top_k(sm, emb, x, cutoffs, 5)
    monkeypatch.setenv("TELL_TPU_APPROX_TOPK", "1")
    v1, i1 = adaptive_top_k(sm, emb, x, cutoffs, 5)
    # top-1 must agree; the full top-5 set overlap must be >= 4/5 per row
    np.testing.assert_array_equal(np.asarray(i0[:, 0]), np.asarray(i1[:, 0]))
    overlap = np.mean([len(set(a) & set(b)) / 5.0
                       for a, b in zip(np.asarray(i0), np.asarray(i1))])
    assert overlap >= 0.8
