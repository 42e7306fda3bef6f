"""Snapshot diff: exact cross-engine parity with a DuckDB FULL OUTER
JOIN over md5 fingerprints, partition invariance, and the incremental
filter contract."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kazu_ray.extras.snapshot import changed_keys, snapshot_diff

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def new_snapshot(tmp_path_factory):
    """Deterministic second snapshot: doc_id % 7 == 0 removed,
    doc_id % 5 == 0 rewritten, 10 fresh ids appended."""
    t = pq.read_table(DOCS, columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out_ids, out_texts = [], []
    for i, txt in zip(ids, texts):
        if i % 7 == 0:
            continue
        out_ids.append(i)
        out_texts.append(f"rewritten {i}" if i % 5 == 0 else txt)
    top = max(ids)
    for j in range(1, 11):
        out_ids.append(top + j)
        out_texts.append(f"brand new document {j}")
    path = tmp_path_factory.mktemp("snap") / "new.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(out_ids, pa.int64()), "text": out_texts}),
        path,
    )
    return str(path)


def _sql_diff(new_path):
    con = duckdb.connect()
    return {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   CASE WHEN o.doc_id IS NULL THEN 'added'
                        WHEN n.doc_id IS NULL THEN 'removed'
                        WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   CASE WHEN o.doc_id IS NULL THEN NULL ELSE md5(o.text) END AS fp_old,
                   CASE WHEN n.doc_id IS NULL THEN NULL ELSE md5(n.text) END AS fp_new
            FROM read_parquet('{DOCS}') o
            FULL OUTER JOIN read_parquet('{new_path}') n USING (doc_id)
            """
        ).fetchall()
    }


def test_snapshot_diff_matches_sql(ray_session, new_snapshot):
    import ray.data as rd

    old = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    new = rd.read_parquet(new_snapshot)
    got = {
        r["doc_id"]: (r["status"], r["fp_old"], r["fp_new"])
        for r in snapshot_diff(old, new).take_all()
    }
    exp = _sql_diff(new_snapshot)
    assert got == exp
    statuses = {s for s, _, _ in got.values()}
    assert statuses == {"added", "removed", "changed", "unchanged"}


def test_snapshot_diff_partition_invariance(ray_session, new_snapshot):
    import ray.data as rd

    old = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    new = rd.read_parquet(new_snapshot)
    a = sorted(
        (r["doc_id"], r["status"]) for r in snapshot_diff(old, new, num_partitions=3).take_all()
    )
    b = sorted(
        (r["doc_id"], r["status"])
        for r in snapshot_diff(
            old.repartition(7), new.repartition(4), num_partitions=11
        ).take_all()
    )
    assert a == b


def test_changed_keys_filter(ray_session, new_snapshot):
    import ray.data as rd

    old = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    new = rd.read_parquet(new_snapshot)
    diff = snapshot_diff(old, new)
    work = {r["doc_id"]: r["status"] for r in changed_keys(diff).take_all()}
    assert set(work.values()) == {"added", "changed"}
    # identical snapshots → nothing to reprocess
    same = snapshot_diff(
        rd.read_parquet(DOCS, columns=["doc_id", "text"]),
        rd.read_parquet(DOCS, columns=["doc_id", "text"]),
    )
    assert changed_keys(same).count() == 0
    assert all(r["status"] == "unchanged" for r in same.take_all())
