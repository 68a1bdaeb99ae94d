"""End-to-end CLI pipeline test (SURVEY.md §4 invariant 6).

Synthetic articles -> `tnt preprocess` -> `tnt train` (loss decreases,
checkpoints written) -> `tnt evaluate` (generations.jsonl + metrics) ->
`tnt score`, all through the real argparse entry point on tiny shapes.
"""
import json
import os

import pytest

from tell_tpu.commands.__main__ import main
from tests.test_tokenizer import build_synthetic_vocab


def _articles(path, n=10):
    arts = []
    for i in range(n):
        arts.append({
            "web_url": f"https://example.com/{i}",
            "headline": {"main": f"Anna Smith in the news {i}"},
            "image_positions": [1],
            "parsed_section": [
                {"type": "paragraph",
                 "text": f"Anna Smith went to Milan on day {i}. " * 5,
                 "named_entities": [
                     {"text": "Anna Smith", "label": "PERSON"},
                     {"text": "Milan", "label": "GPE"}]},
                {"type": "caption", "text": f"Anna Smith in Milan {i}.",
                 "hash": f"h{i}",
                 "named_entities": [
                     {"text": "Anna Smith", "label": "PERSON"}],
                 "facenet_details": {"embeddings": [[0.1] * 512]}},
            ]})
    with open(path, "w") as f:
        for a in arts:
            f.write(json.dumps(a) + "\n")


@pytest.fixture(scope="module")
def exp_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    vf, mf = build_synthetic_vocab(root)
    _articles(root / "articles.jsonl")
    cfg = f"""
name: e2e
model_type: transformer_faces
model:
  weigh_bert: false
  gen_len: 6
  decoder:
    vocab_size: 300
    embed_dim: 64
    conv_dim: 64
    ffn_dim: 128
    num_heads: 4
    kernel_sizes: [3, 5]
    adaptive_cutoffs: [50, 200]
    dropout: 0.0
    weight_dropout: 0.0
    input_dropout: 0.0
    attention_dropout: 0.0
    max_target_positions: 128
    tail_capacity_frac: null
    contexts:
      - {{name: article, kv_dim: 1024, max_len: 128}}
      - {{name: faces, kv_dim: 512, max_len: 4}}
reader:
  strategy: location_aware
  use_faces: true
  use_objects: false
  token_budget: 40
trainer:
  serialization_dir: {root}/run
  num_epochs: 2
  t_total: 100
  warmup: 0.0
  log_every: 100
  n_data: 1

bucketing:
  article_lengths: [128]
  caption_lengths: [16]
  max_batch: 4
data:
  shards_dir: {root}/shards
  articles_jsonl: {root}/articles.jsonl
  vocab_file: {vf}
  merges_file: {mf}
  instances_per_epoch: null
  val_limit: 4
  roberta: tiny
"""
    path = root / "cfg.yaml"
    path.write_text(cfg)
    return str(path), str(root)


@pytest.fixture(scope="module")
def modern_yaml(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_modern")
    vf, mf = build_synthetic_vocab(root)
    _articles(root / "articles.jsonl")
    cfg = f"""
name: e2e-modern
model_type: transformer_modern
model:
  vocab_size: 300
  dim: 64
  num_layers: 2
  num_heads: 4
  ffn_dim: 96
  dropout: 0.0
  attention_dropout: 0.0
  max_target_positions: 128
  gen_len: 6
  loss_vocab_chunk: 128
  contexts:
    - {{name: article, kv_dim: 1024, max_len: 128}}
    - {{name: faces, kv_dim: 512, max_len: 4}}
reader:
  strategy: location_aware
  use_faces: true
  use_objects: false
  token_budget: 40
trainer:
  serialization_dir: {root}/run
  num_epochs: 2
  t_total: 100
  warmup: 0.0
  log_every: 100
  n_data: 1

bucketing:
  article_lengths: [128]
  caption_lengths: [16]
  max_batch: 4
data:
  shards_dir: {root}/shards
  articles_jsonl: {root}/articles.jsonl
  vocab_file: {vf}
  merges_file: {mf}
  instances_per_epoch: null
  val_limit: 4
  roberta: tiny
"""
    path = root / "cfg.yaml"
    path.write_text(cfg)
    return str(path), str(root)


def test_modern_model_cli_pipeline(modern_yaml, capsys):
    """The stretch model family (transformer_modern) through the same CLI:
    preprocess -> train (loss decreases) -> beam-2 evaluate."""
    cfg, root = modern_yaml
    assert main(["preprocess", cfg, "-s", "train"]) == 0
    assert main(["preprocess", cfg, "-s", "valid"]) == 0
    capsys.readouterr()

    assert main(["train", cfg]) == 0
    capsys.readouterr()
    with open(os.path.join(root, "run", "metrics.jsonl")) as f:
        hist = [json.loads(l) for l in f]
    assert hist[-1]["loss"] < hist[0]["loss"]

    assert main(["evaluate", cfg, "-s", "valid", "--beam", "2"]) == 0
    metrics = json.loads(capsys.readouterr().out)
    assert metrics["n_samples"] == 10
    with open(os.path.join(root, "run", "generations-valid.jsonl")) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 10 and "generation" in rows[0]


def test_moe_modern_cli_train(modern_yaml, capsys, tmp_path):
    """expt-12-style MoE through the CLI: -o overrides switch the modern
    model to 2 experts; train runs and the loss decreases."""
    cfg, root = modern_yaml
    # shards exist from the modern pipeline test (module-scoped fixture);
    # (re)preprocess defensively in case of test-order isolation
    assert main(["preprocess", cfg, "-s", "train"]) == 0
    assert main(["preprocess", cfg, "-s", "valid"]) == 0
    capsys.readouterr()
    ov = json.dumps({"model": {"moe_experts": 2, "moe_top_k": 2},
                     "trainer": {"serialization_dir": str(tmp_path)}})
    assert main(["train", cfg, "-o", ov]) == 0
    capsys.readouterr()
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
        hist = [json.loads(l) for l in f]
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_preprocess_train_evaluate_score(exp_yaml, capsys):
    cfg, root = exp_yaml
    assert main(["preprocess", cfg, "-s", "train"]) == 0
    assert main(["preprocess", cfg, "-s", "valid"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["examples"] == 10

    assert main(["train", cfg]) == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["epochs"] == 2
    assert os.path.isdir(os.path.join(root, "run", "checkpoints", "best"))
    # loss decreased across the two epochs
    with open(os.path.join(root, "run", "metrics.jsonl")) as f:
        hist = [json.loads(l) for l in f]
    assert hist[-1]["loss"] < hist[0]["loss"]

    assert main(["evaluate", cfg, "-s", "valid"]) == 0
    metrics = json.loads(capsys.readouterr().out)
    assert metrics["n_samples"] == 10
    # steady-state throughput (compile attributed to the first batch) is
    # reported alongside total-wall throughput. It is usually faster but
    # NOT strictly so: later bucketed batch shapes compile inside the
    # steady window, so only assert presence and sanity here
    assert metrics["captions_per_sec_steady"] > 0
    assert (metrics["captions_per_sec_steady"]
            >= metrics["captions_per_sec"] * 0.5)
    gen_path = os.path.join(root, "run", "generations-valid.jsonl")
    with open(gen_path) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == 10
    assert {"caption", "generation", "caption_readability",
            "gen_np"} <= set(rows[0])

    assert main(["score", gen_path]) == 0
    scored = json.loads(capsys.readouterr().out)
    assert set(scored) >= {"bleu-1", "rouge-l", "meteor_exact_stem",
                           "cider"}


def test_train_recover_fails_fast_without_checkpoint(exp_yaml, tmp_path,
                                                     capsys):
    """`tnt train -r` with nothing to recover must error, not silently
    start a fresh run mislabeled as a resume (the reference's allennlp
    train --recover likewise errors; round-3 ADVICE finding)."""
    cfg, root = exp_yaml
    assert main(["preprocess", cfg, "-s", "train"]) == 0
    assert main(["preprocess", cfg, "-s", "valid"]) == 0
    capsys.readouterr()
    ov = json.dumps({"trainer": {"serialization_dir":
                                 str(tmp_path / "empty_run")}})
    assert main(["train", cfg, "-r", "-o", ov]) == 1
