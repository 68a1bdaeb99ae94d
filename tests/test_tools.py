"""Dataset-construction tool tests (tools/ — reference scripts/ ports)."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_process_images_resize_crop(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image
    pi = _load("process_images")
    src = tmp_path / "in.jpg"
    Image.new("RGB", (640, 360), (200, 30, 30)).save(src)
    dst = tmp_path / "out.jpg"
    assert pi.process_image(str(src), str(dst))
    out = Image.open(dst)
    assert out.size == (224, 224)
    # landscape input: shortest side (360) -> 256, center crop
    assert not pi.process_image(str(tmp_path / "missing.jpg"),
                                str(tmp_path / "x.jpg"))


def test_goodnews_import_schema(tmp_path):
    gi = _load("goodnews_import")
    captioning = {
        "art1": {
            "article": {"0": "First paragraph.", "1": "Second one."},
            "images": {"0": "A caption here."},
            "article_url": "https://example.com/a",
            "headline": "Big News",
        },
        "no_image": {"article": {"0": "text"}, "images": {}},
    }
    arts = gi.convert(captioning, {"train": ["https://example.com/a"]})
    assert len(arts) == 1  # image-less article dropped
    a = arts[0]
    assert a["image_positions"] == [2]
    assert a["parsed_section"][2]["type"] == "caption"
    assert a["parsed_section"][2]["hash"] == "art1_0"
    assert a["split"] == "train"


def test_generate_tables_renders(tmp_path):
    gt = _load("generate_tables")
    run = tmp_path / "9_transformer_objects"
    run.mkdir()
    (run / "evaluate-metrics-test.json").write_text(json.dumps({
        "bleu-4": 6.05, "rouge-l": 21.4, "meteor": 10.3, "cider": 53.8,
        "entity_precision": 24.6, "entity_recall": 22.2}))
    rows = gt.collect(str(tmp_path))
    tex = gt.render("nytimes", rows)
    assert "9\\_transformer\\_objects" in tex
    assert "53.8" in tex and "\\begin{table}" in tex


def test_compute_statistics_counters(tmp_path):
    cs = _load("compute_statistics")
    arts = [{
        "parsed_section": [
            {"type": "paragraph", "text": "Anna Smith spoke.",
             "named_entities": [{"text": "Anna Smith",
                                 "label": "PERSON"}]},
            {"type": "caption", "text": "Anna Smith in Milan.",
             "named_entities": [
                 {"text": "Anna Smith", "label": "PERSON"},
                 {"text": "Milan", "label": "GPE"}]},
        ],
        "image_positions": [1],
    }]
    cap, ctx, stats = cs.compute(iter(arts))
    assert cap["Anna Smith"] == 1 and cap["Milan"] == 1
    assert ctx["Anna Smith"] == 1 and "Milan" not in ctx
    assert stats["images"] == 1 and stats["articles"] == 1


def test_unknown_caption_names(tmp_path, capsys):
    un = _load("get_unknown_caption_names")
    path = tmp_path / "a.jsonl"
    path.write_text(json.dumps({
        "parsed_section": [
            {"type": "paragraph", "text": "x",
             "named_entities": [{"text": "Milan", "label": "GPE"}]},
            {"type": "caption", "text": "y",
             "named_entities": [
                 {"text": "Milan", "label": "GPE"},
                 {"text": "Nobody Known", "label": "PERSON"}]},
        ],
        "image_positions": [1]}) + "\n")
    sys.argv = ["x", "--articles", str(path)]
    assert un.main() == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_caption_names"] == 2
    assert out["n_unknown"] == 1
    assert out["top_unknown"][0][0] == "Nobody Known"


def test_dump_dataset_projection_and_filter(tmp_path, capsys):
    dd = _load("dump_dataset")
    src = tmp_path / "articles.jsonl"
    rows = [
        {"_id": "a", "web_url": "u1", "pub_date": "2020-01-02",
         "type_of_material": "News",
         "headline": {"main": "H1", "kicker": "drop-me"},
         "parsed_section": [
             {"type": "paragraph", "text": "body",
              "named_entities": [{"text": "X"}],
              "facenet_details": {"embeddings": [[0.0] * 512]}}]},
        {"_id": "b", "web_url": "u2", "pub_date": "2020-01-03",
         "type_of_material": "Review",  # filtered out
         "parsed_section": []},
    ]
    src.write_text("\n".join(json.dumps(r) for r in rows))
    out = tmp_path / "dump.jsonl"
    assert dd.main([str(src), str(out)]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["exported"] == 1
    dumped = [json.loads(l) for l in out.read_text().splitlines()]
    assert dumped[0]["_id"] == "a"
    assert dumped[0]["headline"] == {"main": "H1"}
    # embeddings/entities stripped from sections
    assert dumped[0]["sections"] == [{"type": "paragraph", "text": "body"}]

    assert dd.main([str(src), str(out), "--keep-all"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["exported"] == 2
    dumped = [json.loads(l) for l in out.read_text().splitlines()]
    assert [d["_id"] for d in dumped] == ["b", "a"]  # newest first


def test_build_meteor_tables(tmp_path):
    """The exporter produces tables that MeteorConfig.from_data_dir loads
    (synonyms via a stub wordnet; paraphrases from a '|||' file; function
    words from a tiny corpus)."""
    bt = _load("build_meteor_tables")

    class _Lemma:
        def __init__(self, n): self._n = n
        def name(self): return self._n

    class _Synset:
        def __init__(self, names): self._l = [_Lemma(n) for n in names]
        def lemmas(self): return self._l

    class _WN:
        def all_synsets(self):
            return [_Synset(["cat", "feline", "big_cat"]),
                    _Synset(["dog", "canine"])]

    out = tmp_path / "meteor"
    out.mkdir()
    n = bt.export_synonyms(str(out / "synonyms.tsv"), 1000, wordnet=_WN())
    assert n == 4  # cat/feline/dog/canine (big_cat dropped: multiword)

    gz = tmp_path / "para.txt"
    gz.write_text("passed away ||| died ||| 0.9\nbad line\n")
    assert bt.export_paraphrases(str(gz), str(out / "paraphrases.tsv")) == 1

    corpus = tmp_path / "corpus.txt"
    corpus.write_text(("the cat sat " * 1000) + "rareword\n")
    assert bt.export_function_words(str(corpus),
                                    str(out / "function_words.txt")) == 3

    from tell_tpu.evalm.meteor import MeteorConfig
    cfg = MeteorConfig.from_data_dir(str(out))
    assert cfg.full_stages and cfg.metric_key == "meteor"
    assert "feline" in cfg.synonyms["cat"]
    assert ("passed", "away") in cfg.paraphrases
    assert "the" in cfg.function_words and "rareword" not in cfg.function_words


def test_engine_capacity_tool_tiny(tmp_path):
    """tools/engine_capacity.py wiring smoke (TINY shapes on CPU): the
    sweep produces capacity / 80%-load / overload numbers for each
    (slots, gen_len) config. Keeps the capacity-curve tool (the source of
    docs/serving.md's table) from rotting."""
    import subprocess
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env.update(JAX_PLATFORMS="cpu", TINY="1", SLOTS="2", GEN_LENS="4",
               BEAM="2", N_MULT="2", CHUNK="2", CACHE_DIR="")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "engine_capacity.py")],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    sweep = json.loads(r.stdout.strip().splitlines()[-1])["sweep"]
    assert len(sweep) == 1
    row = sweep[0]
    assert row["slots"] == 2 and row["gen_len"] == 4
    for k in ("capacity_captions_per_sec", "load80_captions_per_sec",
              "load80_p95_ms", "overload_captions_per_sec"):
        assert row[k] > 0, row
