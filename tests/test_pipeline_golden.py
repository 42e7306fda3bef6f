"""End-to-end: the flagship pipeline on sf0.001 vs the golden oracle.

The golden triples encode the reference cascade semantics (generator
knows where every mention was planted and what it must ground to); the
north-rule gate is triple P/R >= 0.95."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def annotated(ray_session, compiled_dicts):
    from kazu_ray.pipelines.kg import annotate
    from kazu_ray.sources.interleave import interleaved_docs

    ds = annotate(interleaved_docs(SF), compiled_dicts,
                  ner_concurrency=2, post_concurrency=2)
    return ds.materialize()


def test_triple_precision_recall(annotated, compiled_dicts):
    from kazu_ray.pipelines.kg import build_graph
    from kazu_ray.sources.interleave import golden_triples_table

    edges, nodes = build_graph(annotated, compiled_dicts)
    e = edges.to_pandas()
    golden = golden_triples_table(SF).to_pandas()
    got = set(zip(e.subj, e.pred, e.obj))
    exp = set(zip(golden.subj, golden.pred, golden.obj))
    tp = len(got & exp)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(exp))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    assert nodes.count() > 0


def test_entity_annotations_vs_golden(annotated):
    """Soft-span acceptance scoring (reference acceptance_test.py:78-104):
    an expected entity matches if spans are identical (or overlap with the
    same class) and the mapping id agrees."""
    import pandas as pd

    from kazu_ray.sources.interleave import golden_annotations

    got_rows = []
    for row in annotated.take_all():
        for e in row["entities"]:
            for m in e["mappings"] or [{}]:
                got_rows.append(
                    (row["doc_id"], e["span_idx"], e["start"], e["end"],
                     e["entity_class"], m.get("idx", ""))
                )
    got = set(got_rows)
    exp = []
    for row in golden_annotations(SF).take_all():
        exp.append((row["doc_id"], row["span_idx"], row["start"], row["end"],
                    row["entity_class"], row["mapping_id"]))
    matched = sum(1 for g in exp if g in got or (g[5] == "" and any(
        x[:5] == g[:5] for x in got)))
    recall = matched / max(1, len(exp))
    assert recall >= 0.95, f"annotation recall {recall}"


def test_span_sequence_invariant(annotated, ray_session):
    """The per-row invariant: (kind, text, media_ref, order) of every
    document's spans must survive the whole pipeline verbatim."""
    import ray.data as rd

    from kazu_ray.sources.interleave import interleaved_docs

    original = {r["doc_id"]: r["spans"] for r in interleaved_docs(SF).take_all()}
    for row in annotated.take_all():
        spans = row["spans"]
        orig = original[row["doc_id"]]
        assert len(spans) == len(orig)
        for s, o in zip(spans, orig):
            assert (s["kind"], s["text"], s["media_ref"]) == (
                o["kind"], o["text"], o["media_ref"]
            )


def test_partitioned_run_resumes(ray_session, compiled_dicts, tmp_path):
    from kazu_ray.pipelines.kg import run_partitioned

    out = str(tmp_path / "kg_out")
    r1 = run_partitioned(SF, out, compiled_dicts, num_partitions=2,
                         ner_concurrency=1, post_concurrency=1)
    assert all(rec["status"] == "complete" for rec in r1.values())
    assert os.path.exists(os.path.join(out, "_lineage", "part=0.json"))
    # second run must skip every partition (lineage validates)
    r2 = run_partitioned(SF, out, compiled_dicts, num_partitions=2)
    assert r2 == r1
