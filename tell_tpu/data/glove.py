"""GloVe word vectors for the glove-variant experiments.

The reference's GloVe models embed article tokens with spaCy's 300-d
vectors at read time (baseline_glove.py:63-65, readers nytimes_glove /
goodnews_flattened_glove). Here the preprocessing pipeline materializes the
[S, 300] article feature matrix into the shards (ReaderConfig
article_features="glove"), so training streams fixed-shape features like
every other context — no per-batch embedding lookup on the host.
"""
from __future__ import annotations

import numpy as np


class GloveVectors:
    """Whitespace-token lookup over a standard glove.*.300d.txt file.
    Unknown tokens get the zero vector (spaCy OOV semantics)."""

    def __init__(self, vectors: dict[str, np.ndarray], dim: int = 300):
        self.vectors = vectors
        self.dim = dim

    @classmethod
    def from_file(cls, path: str, dim: int = 300,
                  max_words: int | None = None) -> "GloveVectors":
        vecs: dict[str, np.ndarray] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                if max_words is not None and i >= max_words:
                    break
                parts = line.rstrip().split(" ")
                if len(parts) != dim + 1:
                    continue
                vecs[parts[0]] = np.asarray(parts[1:], np.float32)
        return cls(vecs, dim)

    def embed_text(self, text: str, max_tokens: int = 512) -> np.ndarray:
        """[S, dim] features for the first max_tokens whitespace tokens,
        lowercased lookup with raw-token fallback."""
        toks = text.split()[:max_tokens]
        out = np.zeros((len(toks), self.dim), np.float32)
        for i, t in enumerate(toks):
            v = self.vectors.get(t)
            if v is None:
                v = self.vectors.get(t.lower())
            if v is not None:
                out[i] = v
        return out
