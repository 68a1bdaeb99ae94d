"""int8 (w8a8) frozen-tower quantization: ops/quant.py + the RoBERTa
encode dispatch. The decode-level agreement gate runs on the real chip in
bench.py (enc8_token_agreement); these tests pin the numerics contract
the gate relies on."""
import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr

from tell_tpu.ops.quant import (int8_linear, is_quantized_dense,
                                maybe_quantize_frozen, quantize_act_int8,
                                quantize_dense, quantize_roberta,
                                quantize_weight_int8)


def test_weight_quant_roundtrip_error_bound():
    w = jr.normal(jr.PRNGKey(0), (64, 32)) * 0.1
    q = quantize_weight_int8(w)
    deq = q["q8"].astype(jnp.float32) * q["scale"]
    # symmetric int8: per-column error bounded by scale/2 = amax/254
    amax = jnp.max(jnp.abs(w), axis=0)
    assert float(jnp.max(jnp.abs(deq - w) / (amax / 254.0 + 1e-12))) <= 1.01


def test_act_quant_per_row_scales():
    x = jr.normal(jr.PRNGKey(1), (8, 16))
    x = x.at[3].mul(100.0)     # one outlier row must not wreck the others
    q, s = quantize_act_int8(x)
    deq = q.astype(jnp.float32) * s
    err = np.asarray(jnp.abs(deq - x))
    row_amax = np.asarray(jnp.max(jnp.abs(x), axis=-1))
    assert (err.max(axis=-1) <= row_amax / 254.0 * 1.01).all()


def test_int8_linear_close_to_fp():
    p = {"w": jr.normal(jr.PRNGKey(2), (128, 64)) * 0.05,
         "b": jr.normal(jr.PRNGKey(3), (64,)) * 0.01}
    x = jr.normal(jr.PRNGKey(4), (32, 128))
    ref = jnp.dot(x, p["w"]) + p["b"]
    out = int8_linear(quantize_dense(p), x)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel      # ~1e-2 relative is the documented contract


def test_quantize_dense_idempotent():
    p = {"w": jr.normal(jr.PRNGKey(5), (16, 8)), "b": jnp.zeros((8,))}
    q1 = quantize_dense(p)
    q2 = quantize_dense(q1)
    assert q2 is q1
    assert is_quantized_dense(q1) and not is_quantized_dense(p)


def test_quantized_roberta_encode_close_and_idempotent():
    from tell_tpu.models.backbones.roberta import (RobertaConfig,
                                                   init_roberta,
                                                   roberta_encode_windowed)
    cfg = RobertaConfig(vocab_size=120, dim=64, num_layers=2, num_heads=4,
                        ffn_dim=128, max_positions=20)
    params = init_roberta(jr.PRNGKey(6), cfg)
    ids = jr.randint(jr.PRNGKey(7), (2, 30), 4, 120)  # windowed: 30 > 18
    ref = roberta_encode_windowed(params, cfg, ids, return_all_hiddens=False)
    q = quantize_roberta(params)
    assert quantize_roberta(q)["layers"][0]["q"] is q["layers"][0]["q"]
    out = roberta_encode_windowed(q, cfg, ids, return_all_hiddens=False)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    # 2 layers of ~1e-2-relative matmuls + LN renormalization
    assert rel < 0.1, rel
    # embeddings / LN leaves untouched
    assert "w" not in q["layers"][0]["q"]
    assert q["word_embed"] is params["word_embed"]
    assert q["layers"][0]["attn_ln"] is params["layers"][0]["attn_ln"]


def test_maybe_quantize_frozen_lever(monkeypatch):
    from tell_tpu.models.backbones.roberta import RobertaConfig, init_roberta
    cfg = RobertaConfig.tiny()
    frozen = {"roberta": init_roberta(jr.PRNGKey(8), cfg),
              "roberta_cfg": cfg}
    monkeypatch.delenv("TELL_TPU_ENC8", raising=False)
    assert maybe_quantize_frozen(frozen) is frozen
    monkeypatch.setenv("TELL_TPU_ENC8", "1")
    out = maybe_quantize_frozen(frozen)
    assert is_quantized_dense(out["roberta"]["layers"][0]["q"])
    assert out["roberta_cfg"] is cfg


def test_fast_gelu_lever(monkeypatch):
    """CPU default stays erf (HF parity); tanh stays close (the TPU
    default is gated on-chip by bench.py's forced-agreement gate)."""
    from tell_tpu.models.backbones.roberta import (RobertaConfig,
                                                   fast_gelu_mode,
                                                   init_roberta,
                                                   roberta_encode)
    monkeypatch.delenv("TELL_TPU_FAST_GELU", raising=False)
    assert fast_gelu_mode() == "erf"        # CPU backend
    monkeypatch.setenv("TELL_TPU_FAST_GELU", "tanh")
    assert fast_gelu_mode() == "tanh"
    monkeypatch.setenv("TELL_TPU_FAST_GELU", "0")
    assert fast_gelu_mode() == "erf"

    cfg = RobertaConfig(vocab_size=120, dim=32, num_layers=2, num_heads=4,
                        ffn_dim=64, max_positions=20)
    params = init_roberta(jr.PRNGKey(11), cfg)
    ids = jr.randint(jr.PRNGKey(12), (2, 10), 4, 120)
    monkeypatch.setenv("TELL_TPU_FAST_GELU", "erf")
    ref = roberta_encode(params, cfg, ids, return_all_hiddens=False)
    monkeypatch.setenv("TELL_TPU_FAST_GELU", "tanh")
    out = roberta_encode(params, cfg, ids, return_all_hiddens=False)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert 0 < rel < 0.02, rel


def test_int8_linear_jit_grad_free_under_stop_gradient():
    """The tower is frozen (stop_gradient at the call sites): the int8
    path must be jittable and not blow up under a surrounding grad."""
    p = quantize_dense({"w": jr.normal(jr.PRNGKey(9), (8, 8)) * 0.1,
                        "b": jnp.zeros((8,))})
    x = jr.normal(jr.PRNGKey(10), (4, 8))

    def loss(t):
        feats = jax.lax.stop_gradient(int8_linear(p, x * 1.0))
        return jnp.sum((feats * t) ** 2)

    g = jax.jit(jax.grad(loss))(jnp.ones(()))
    assert np.isfinite(float(g))
