"""Resumability (crash mid-run) and skew-bounding semantics."""

import json
import os

import pyarrow as pa
import pytest


def test_crash_mid_run_resumes(ray_session, compiled_dicts, tmp_path, monkeypatch):
    """Kill the job after partition 0; the rerun must skip partition 0
    (lineage validates) and produce identical total output."""
    import kazu_ray.pipelines.kg as kg

    out = str(tmp_path / "kg_out")
    real = kg.edges_pipeline
    calls = {"n": 0}

    def crashing(*args, **kw):
        if calls["n"] >= 1:
            raise RuntimeError("simulated crash before partition 1")
        calls["n"] += 1
        return real(*args, **kw)

    monkeypatch.setattr(kg, "edges_pipeline", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        kg.run_partitioned("/root/testdata/sf0.001", out, compiled_dicts,
                           num_partitions=2, ner_concurrency=1)
    # partition 0 completed and has lineage; partition 1 does not
    assert os.path.exists(os.path.join(out, "_lineage", "part=0.json"))
    assert not os.path.exists(os.path.join(out, "_lineage", "part=1.json"))
    part0 = json.load(open(os.path.join(out, "_lineage", "part=0.json")))
    assert part0["status"] == "complete"

    # resume with the real pipeline: partition 0 skipped, 1 computed
    monkeypatch.setattr(kg, "edges_pipeline", real)
    results = kg.run_partitioned("/root/testdata/sf0.001", out, compiled_dicts,
                                 num_partitions=2, ner_concurrency=1)
    assert results[0] == part0  # reused, not recomputed
    assert results[1]["status"] == "complete"
    # full edge output present for both partitions
    assert os.path.isdir(os.path.join(out, "edges", "part=0"))
    assert os.path.isdir(os.path.join(out, "edges", "part=1"))


def test_combiner_bounds_hot_key():
    """The per-batch combiner guarantees a hot key ('cancer') contributes
    at most ONE partial row per batch, regardless of how many documents
    in the batch mention it — the structural skew bound."""
    from kazu_ray.stages.triples import partial_edge_agg

    rows = []
    for i in range(500):  # 500 docs all mentioning the same hot CURIE
        rows.append({"subj": f"MENTION:CANCER", "pred": "maps-to",
                     "obj": "MONDO_0004992", "doc_id": f"doc-{i}", "confidence": 100})
    batch = pa.Table.from_pylist(rows)
    out = partial_edge_agg(batch)
    assert len(out) == 1
    assert out.column("n_docs").to_pylist() == [500]


def _disk_edge_rows(out: str) -> int:
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out, "edges", "part=*", "*.parquet"))
    )


def test_resume_invalidated_by_input_change(ray_session, compiled_dicts, tmp_path):
    """A regenerated input at the same path (different content) must NOT
    be served from stale staging or stale partition lineage, and the
    recompute must not append into leftover output files."""
    import pyarrow.parquet as pq

    import kazu_ray.pipelines.kg as kg

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(src, sf / "documents.parquet")
    out = str(tmp_path / "kg_out")
    r1 = kg.run_partitioned(str(sf), out, compiled_dicts, num_partitions=2,
                            ner_concurrency=1)
    assert all(r["status"] == "complete" for r in r1.values())
    disk1 = _disk_edge_rows(out)
    assert disk1 == sum(r["n_edges"] for r in r1.values())

    # identical rerun: everything reused, nothing appended on disk
    r2 = kg.run_partitioned(str(sf), out, compiled_dicts, num_partitions=2,
                            ner_concurrency=1)
    assert r2 == r1
    assert _disk_edge_rows(out) == disk1

    # REGENERATE the corpus with different content (half the docs):
    # outputs must reflect the new data, not stale staging/lineage
    pq.write_table(src.slice(0, src.num_rows // 2), sf / "documents.parquet")
    r3 = kg.run_partitioned(str(sf), out, compiled_dicts, num_partitions=2,
                            ner_concurrency=1)
    assert all(r["status"] == "complete" for r in r3.values())
    assert all(r3[p]["input_fp"] != r1[p]["input_fp"] for p in r3)
    disk3 = _disk_edge_rows(out)
    # on-disk rows match the new run's lineage exactly (no append
    # duplication into leftover files) and differ from the full corpus
    assert disk3 == sum(r["n_edges"] for r in r3.values())
    assert disk3 < disk1
