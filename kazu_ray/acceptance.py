"""Acceptance scoring harness.

Re-realizes the reference's acceptance test methodology
(/root/reference/kazu/annotation/acceptance_test.py:78-104, 136-262):

- NER matches are scored softly: a gold entity is matched by a test
  entity with identical (span_idx, start, end) — or partially
  overlapping spans — of the same entity class;
- linking matches on the mapping id set;
- precision/recall are aggregated per entity class and asserted against
  per-class thresholds (the reference ships these in the model pack's
  acceptance_criteria.json).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass


@dataclass(frozen=True)
class Ann:
    doc_id: str
    span_idx: int
    start: int
    end: int
    entity_class: str
    mapping_id: str = ""


def _overlaps(a: Ann, b: Ann) -> bool:
    return (
        a.doc_id == b.doc_id
        and a.span_idx == b.span_idx
        and a.entity_class == b.entity_class
        and a.start < b.end
        and b.start < a.end
    )


def score_ner(test: list[Ann], gold: list[Ann]) -> dict[str, dict[str, float]]:
    """Per-entity-class precision/recall with soft span matching."""
    by_doc_test: dict[tuple[str, int], list[Ann]] = defaultdict(list)
    for t in test:
        by_doc_test[(t.doc_id, t.span_idx)].append(t)
    tp_by_class: dict[str, int] = defaultdict(int)
    fn_by_class: dict[str, int] = defaultdict(int)
    matched_test: set[int] = set()
    for g in gold:
        hit = None
        for t in by_doc_test.get((g.doc_id, g.span_idx), ()):
            if _overlaps(g, t):
                hit = t
                break
        if hit is not None:
            tp_by_class[g.entity_class] += 1
            matched_test.add(id(hit))
        else:
            fn_by_class[g.entity_class] += 1
    fp_by_class: dict[str, int] = defaultdict(int)
    for t in test:
        if id(t) not in matched_test:
            fp_by_class[t.entity_class] += 1
    out = {}
    for cls in set(tp_by_class) | set(fn_by_class) | set(fp_by_class):
        tp, fp, fn = tp_by_class[cls], fp_by_class[cls], fn_by_class[cls]
        out[cls] = {
            "precision": tp / max(tp + fp, 1),
            "recall": tp / max(tp + fn, 1),
            "tp": tp, "fp": fp, "fn": fn,
        }
    return out


def score_linking(test: list[Ann], gold: list[Ann]) -> dict[str, dict[str, float]]:
    """Per-source precision/recall on (doc, mapping_id) sets
    (reference :88-104)."""
    def source_of(mid: str) -> str:
        from .ontology.synth import find_kb

        return find_kb(mid)

    gold_sets: dict[str, set] = defaultdict(set)
    test_sets: dict[str, set] = defaultdict(set)
    for g in gold:
        if g.mapping_id:
            gold_sets[source_of(g.mapping_id)].add((g.doc_id, g.mapping_id))
    for t in test:
        if t.mapping_id:
            test_sets[source_of(t.mapping_id)].add((t.doc_id, t.mapping_id))
    out = {}
    for src in set(gold_sets) | set(test_sets):
        tp = len(gold_sets[src] & test_sets[src])
        fp = len(test_sets[src] - gold_sets[src])
        fn = len(gold_sets[src] - test_sets[src])
        out[src] = {
            "precision": tp / max(tp + fp, 1),
            "recall": tp / max(tp + fn, 1),
            "tp": tp, "fp": fp, "fn": fn,
        }
    return out


def assert_thresholds(scores: dict[str, dict[str, float]], criteria: dict[str, dict[str, float]]):
    """Raise AssertionError listing every class/source below threshold
    (reference :233-262)."""
    failures = []
    for key, thresh in criteria.items():
        got = scores.get(key)
        if got is None:
            failures.append(f"{key}: no results")
            continue
        for metric, minimum in thresh.items():
            if got[metric] < minimum:
                failures.append(f"{key}.{metric}: {got[metric]:.3f} < {minimum}")
    assert not failures, "; ".join(failures)
