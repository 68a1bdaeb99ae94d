"""Batched article encode in front of the engine (serving/encode_batcher).

The contract: coalescing concurrent requests' encodes into one padded
tower pass must be INVISIBLE in the results — same captions as the
per-request encode — while the stacked batch actually forms under
concurrency and pads up the power-of-two ladder."""
import threading
import time
from concurrent.futures import Future

import numpy as np

from tell_tpu.serving.encode_batcher import EncodeBatcher, _ladder


def test_ladder():
    assert [_ladder(n, 8) for n in (1, 2, 3, 4, 5, 8, 9)] == \
        [1, 2, 4, 4, 8, 8, 8]
    assert _ladder(3, 1) == 1


def _echo_downstream(enc1):
    fut = Future()
    fut.set_result(enc1)
    return fut


def test_batcher_coalesces_and_pads():
    seen_batches = []

    def encode_many(batch):
        seen_batches.append(batch["x"].shape[0])
        return {"y": batch["x"] * 2.0}

    eb = EncodeBatcher(encode_many, _echo_downstream, max_batch=4,
                       max_wait_ms=200.0)
    try:
        payloads = [{"x": np.full((1, 3), float(i))} for i in range(3)]
        results = [None] * 3

        def call(i):
            results[i] = eb(payloads[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, r in enumerate(results):
            down_fut, enc1 = r
            np.testing.assert_array_equal(enc1["y"], np.full((1, 3),
                                                             2.0 * i))
            assert down_fut.result(timeout=1)["y"].shape == (1, 3)
        # 3 concurrent callers -> one (or at worst two) stacked encodes,
        # each padded to a ladder rung
        assert sum(seen_batches) >= 3
        assert all(b in (1, 2, 4) for b in seen_batches)
        assert len(seen_batches) < 3, seen_batches  # coalescing happened
    finally:
        eb.shutdown()


def test_batcher_shutdown_fails_queued():
    ev = threading.Event()

    def encode_many(batch):
        ev.wait(5)
        return batch

    eb = EncodeBatcher(encode_many, _echo_downstream, max_batch=2,
                       max_wait_ms=1.0)
    fut = eb.submit({"x": np.zeros((1, 2))})
    time.sleep(0.05)
    late = eb.submit({"x": np.zeros((1, 2))})
    ev.set()
    eb.shutdown()
    import concurrent.futures
    # the first may have completed; the late one must not hang forever
    try:
        late.result(timeout=5)
    except (RuntimeError, concurrent.futures.CancelledError):
        pass
    assert fut.done() or True  # no deadline blow-up is the real assertion


def test_engine_serving_batched_encode_matches_per_request(tmp_path):
    """Captions through encode_batch=4 under concurrent load must equal
    the encode_batch=1 (per-request, round-4 semantics) captions."""
    import dataclasses

    import jax
    from tell_tpu.config import ContextSpec, small_test_config
    from tell_tpu.data.tokenizer import RobertaTokenizer
    from tell_tpu.models import init_captioner
    from tell_tpu.models.backbones.roberta import RobertaConfig, init_roberta
    from tell_tpu.serving.server import CaptionService
    from tests.test_tokenizer import build_synthetic_vocab

    cfg = dataclasses.replace(small_test_config(), gen_len=6)
    dec = dataclasses.replace(
        cfg.decoder,
        contexts=(ContextSpec("image", 2048, 49),
                  ContextSpec("article", 24, 16),
                  ContextSpec("faces", 512, 2),
                  ContextSpec("obj", 2048, 4)))
    cfg = dataclasses.replace(cfg, decoder=dec)
    params = init_captioner(jax.random.PRNGKey(0), cfg)
    rcfg = RobertaConfig(vocab_size=cfg.decoder.vocab_size, dim=24,
                         num_layers=2, num_heads=4, ffn_dim=32,
                         max_positions=40)
    frozen = {"roberta": init_roberta(jax.random.PRNGKey(1), rcfg),
              "roberta_cfg": rcfg}
    vf, mf = build_synthetic_vocab(tmp_path)
    tok = RobertaTokenizer.from_files(vf, mf, max_len=16)

    texts = [f"city news item number {i}" for i in range(5)]

    def run(encode_batch):
        svc = CaptionService(params, frozen, cfg, tok, max_batch=4,
                             article_len=16, engine_slots=2, engine_beam=2,
                             encode_batch=encode_batch)
        try:
            results = [None] * len(texts)

            def call(i):
                results[i] = svc.caption({"context": texts[i]})

            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(len(texts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            return results
        finally:
            svc.close()

    per_req = run(1)
    batched = run(4)
    for a, b in zip(per_req, batched):
        assert a is not None and b is not None
        assert "error" not in a and "error" not in b
        assert a["token_ids"] == b["token_ids"], (a, b)
        assert a["caption"] == b["caption"]
