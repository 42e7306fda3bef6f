"""Lexical retrieval: cross-engine parity with DuckDB (posting lists
bit-equal, BM25 scores equal to float64 round-off under the identical
Okapi formula) plus the partition-invariance the operators promise."""

import duckdb
import numpy as np
import pytest

from kazu_ray.extras.retrieval import bm25_duckdb, bm25_topk, build_inverted_index

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"

TOK = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return con


def test_inverted_index_matches_sql(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    got = {
        r["token"]: (r["df"], list(r["doc_ids"]))
        for r in build_inverted_index(ds).take_all()
    }
    exp = {
        tok: (df, ids)
        for tok, df, ids in _con().execute(
            f"""
            WITH pairs AS (
              SELECT DISTINCT doc_id, token FROM (
                SELECT doc_id, unnest({TOK}) AS token FROM documents)
            )
            SELECT token, COUNT(*) AS df, list_sort(list(doc_id)) AS doc_ids
            FROM pairs GROUP BY token
            """
        ).fetchall()
    }
    assert got == exp


def test_inverted_index_max_df_and_partitioning(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    full = {r["token"] for r in build_inverted_index(ds).take_all()}
    n_docs = ds.count()
    pruned_rows = build_inverted_index(ds, max_df_ratio=0.5).take_all()
    pruned = {r["token"] for r in pruned_rows}
    assert pruned < full  # stopword-frequency tokens dropped
    assert all(r["df"] <= 0.5 * n_docs for r in pruned_rows)

    # same postings regardless of input blocking
    a = sorted(
        (r["token"], tuple(r["doc_ids"]))
        for r in build_inverted_index(ds, num_partitions=3).take_all()
    )
    b = sorted(
        (r["token"], tuple(r["doc_ids"]))
        for r in build_inverted_index(ds.repartition(11), num_partitions=9).take_all()
    )
    assert a == b


QUERIES = ["neural network training data", "the gene expression", "zzzznotaword"]
K = 12


def test_bm25_matches_sql(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    got = sorted(
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in bm25_topk(ds, QUERIES, k=K).take_all()
    )
    exp = sorted((q, r, d, s) for q, d, s, r in bm25_duckdb(_con(), QUERIES, K))
    assert [(g[0], g[1], g[2]) for g in got] == [(e[0], e[1], e[2]) for e in exp]
    assert np.allclose([g[3] for g in got], [e[3] for e in exp], atol=1e-9)
    # the no-hit query must emit nothing
    assert not any(q == 2 for q, _, _, _ in got)


def test_bm25_partition_invariance_and_edges(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in bm25_topk(ds, QUERIES, k=5).take_all()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in bm25_topk(ds.repartition(13), QUERIES, k=5).take_all()
    )
    assert a == b
    with pytest.raises(ValueError):
        bm25_topk(ds, ["!!!"], k=3)
