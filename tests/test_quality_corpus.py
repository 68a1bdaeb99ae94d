"""Quality-corpus fixtures: committed text matches the generator (drift
guard), the corpus-trained BPE round-trips every caption, and the
gazetteer NER used for offline entity P/R respects boundaries/overlaps."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(ROOT, "tests", "fixtures", "quality")


def test_generator_reproduces_committed_corpus(tmp_path):
    """The committed articles.jsonl/vocab/merges/entities are a pure
    function of the generator's default seed — regeneration must be
    byte-identical (the uncommitted float blobs are covered by
    --features-only determinism inside the tool itself)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools",
                                      "gen_quality_corpus.py"),
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=300, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    for name in ("articles.jsonl", "vocab.json", "merges.txt",
                 "entities.json"):
        got = (tmp_path / name).read_bytes()
        want = open(os.path.join(FIXTURES, name), "rb").read()
        assert got == want, f"{name} drifted from the committed fixture"


def test_corpus_vocab_roundtrips_captions():
    from tell_tpu.data.tokenizer import RobertaTokenizer
    tok = RobertaTokenizer.from_files(
        os.path.join(FIXTURES, "vocab.json"),
        os.path.join(FIXTURES, "merges.txt"))
    n = 0
    with open(os.path.join(FIXTURES, "articles.jsonl")) as f:
        for line in f:
            a = json.loads(line)
            for s in a["parsed_section"]:
                if s["type"] == "caption":
                    cap = s["text"]
                    assert tok.decode(tok.encode(cap)) == cap
                    assert len(tok.encode(cap)) < 40
                    n += 1
    assert n == 32


def test_gazetteer_ner_boundaries_and_overlap():
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from quality_loop import gazetteer_ner
    gaz = {"Zainab Weber": "PERSON", "Weber": "PERSON", "Lisbon": "GPE"}
    ner = gazetteer_ner(gaz)
    # the longer span subsumes the shorter alias at the same position
    assert ner("Zainab Weber spoke in Lisbon") == [
        ("Zainab Weber", "PERSON"), ("Lisbon", "GPE")]
    # word boundaries: no match inside a longer word
    assert ner("Lisbonne is not Lisbon city") == [("Lisbon", "GPE")]
    # a standalone short alias still matches
    assert ("Weber", "PERSON") in ner("Weber arrived early")
