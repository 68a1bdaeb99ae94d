"""CLI + config tests: every shipped experiment YAML parses into valid
dataclasses; overrides merge; score subcommand round-trips."""
import dataclasses
import glob
import json
import os

import pytest

from tell_tpu.config_io import load_experiment

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("path", sorted(
    glob.glob(os.path.join(REPO, "expt", "*", "*.yaml"))))
def test_experiment_configs_parse(path):
    exp = load_experiment(path)
    assert exp.trainer.t_total > 0
    if os.sep + "quality" + os.sep in path:
        # the offline quality-loop configs ride the committed synthetic
        # corpus vocabulary, not the real RoBERTa one
        assert exp.model.decoder.vocab_size == 708
        names = [c.name for c in exp.model.decoder.contexts]
        assert names == ["image", "article", "faces", "obj"]
        return
    if exp.model_type == "transformer_modern":
        assert exp.model.vocab_size == 50265
        names = [c.name for c in exp.model.contexts]
        assert names == ["image", "article", "faces", "obj"]
        return
    assert exp.model.decoder.vocab_size == 50265
    assert exp.model.decoder.full_cutoffs[-1] == 50265
    names = [c.name for c in exp.model.decoder.contexts]
    if "9_" in path:
        assert names == ["image", "article", "faces", "obj"]
    if "4_" in path:
        assert names == ["article"]


def test_overrides_merge(tmp_path):
    path = os.path.join(REPO, "expt", "nytimes", "9_transformer_objects.yaml")
    exp = load_experiment(path, overrides=json.dumps(
        {"trainer": {"lr": 0.5}, "model": {"decoder": {"dropout": 0.0}}}))
    assert exp.trainer.lr == 0.5
    assert exp.model.decoder.dropout == 0.0
    assert exp.model.decoder.embed_dim == 1024  # untouched


def test_unknown_key_fails(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("model:\n  decoder:\n    not_a_field: 3\n")
    with pytest.raises(KeyError):
        load_experiment(str(bad))


def test_score_command(tmp_path, capsys):
    from tell_tpu.commands.__main__ import main
    gen = tmp_path / "g.jsonl"
    with open(gen, "w") as f:
        f.write(json.dumps({"caption": "the cat sat",
                            "generation": "the cat sat"}) + "\n")
    assert main(["score", str(gen)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["bleu-1"] > 99


def test_all_expt_yamls_parse():
    """Every shipped experiment YAML must load against the dataclass
    schema (unknown keys fail loudly — config_io._build), so schema drift
    in any of the expt/ grid breaks here, not at train time."""
    import glob
    import os
    from tell_tpu.config_io import load_experiment

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    yamls = sorted(glob.glob(os.path.join(root, "expt", "*", "*.yaml")))
    assert len(yamls) >= 26   # 11 goodnews + 15 nytimes
    for path in yamls:
        exp = load_experiment(path)
        assert exp.model_type, path
        dcfg = getattr(exp.model, "decoder", exp.model)
        assert dcfg.contexts or exp.model_type.startswith(("baseline",
                                                           "lstm")), path


def test_compile_cache_flag(tmp_path):
    """--compile-cache wires the persistent XLA compilation cache."""
    import jax

    from tell_tpu.commands.__main__ import (_enable_compile_cache,
                                            build_parser)
    args = build_parser().parse_args(
        ["train", "cfg.yaml", "--compile-cache", str(tmp_path / "cc")])
    assert args.compile_cache == str(tmp_path / "cc")
    old = jax.config.jax_compilation_cache_dir
    try:
        _enable_compile_cache(args)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_abstract_template_matches_concrete_init():
    """evaluate/serve restore checkpoints against an eval_shape-traced
    template (zero device allocation — a concrete flagship init next to
    a trained param set OOMs a 16 GB chip). The template must agree with
    the concrete init in tree structure, shapes, and dtypes or orbax
    restore silently produces a mis-shaped tree."""
    import jax

    from tell_tpu.commands.__main__ import _abstract_template
    from tell_tpu.config import CaptionerConfig
    from tell_tpu.models.registry import get_model

    adapter = get_model("transformer_faces_objects",
                        CaptionerConfig(decoder=dataclasses.replace(
                            CaptionerConfig().decoder,
                            vocab_size=64, embed_dim=32, conv_dim=32,
                            ffn_dim=64, num_heads=2, kernel_sizes=(3,),
                            adaptive_cutoffs=(16, 32))))
    abstract = _abstract_template(adapter)
    concrete = adapter.init(jax.random.PRNGKey(0), adapter.config)
    flat_a, tree_a = jax.tree.flatten(abstract)
    flat_c, tree_c = jax.tree.flatten(concrete)
    assert tree_a == tree_c
    for a, c in zip(flat_a, flat_c):
        assert a.shape == c.shape and a.dtype == c.dtype
