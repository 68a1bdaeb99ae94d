"""Entity precision/recall over generated captions.

Replaces the spaCy-based entity scoring of
/root/reference/scripts/compute_metrics.py:61-289 (all / PERSON / GPE / ORG
and rare-name variants). The NER backend is pluggable: pass any callable
text -> [(text, label)]; `spacy_ner()` returns one when spaCy + a model are
installed, else the caller falls back to the stored `named_entities` that
the dataset construction pipeline wrote into the records.
"""
from __future__ import annotations

from typing import Callable, Iterable

NerFn = Callable[[str], list[tuple[str, str]]]


def spacy_ner(model: str = "en_core_web_lg") -> NerFn | None:
    try:
        import spacy
        nlp = spacy.load(model)
    except Exception:
        return None

    def ner(text: str):
        return [(ent.text, ent.label_) for ent in nlp(text).ents]
    return ner


def entity_precision_recall(
        gen_entities: Iterable[Iterable[str]],
        ref_entities: Iterable[Iterable[str]]) -> dict:
    """Micro-averaged P/R: a generated entity counts as correct if its exact
    text appears among the reference caption's entities (compute_metrics.py
    semantics)."""
    n_gen = n_ref = n_correct_gen = n_correct_ref = 0
    for gens, refs in zip(gen_entities, ref_entities):
        gens = list(gens)
        refs = list(refs)
        ref_set = set(refs)
        gen_set = set(gens)
        n_gen += len(gens)
        n_ref += len(refs)
        n_correct_gen += sum(1 for g in gens if g in ref_set)
        n_correct_ref += sum(1 for r in refs if r in gen_set)
    return {
        "precision": n_correct_gen / n_gen if n_gen else 0.0,
        "recall": n_correct_ref / n_ref if n_ref else 0.0,
        "n_generated": n_gen,
        "n_reference": n_ref,
    }


def filter_by_label(entities: list[tuple[str, str]],
                    labels: tuple[str, ...]) -> list[str]:
    return [t for t, lab in entities if lab in labels]
