"""Positional phrase search (extras/phrase.py): intersection semantics
on crafted docs (adjacency required, multi-hit counting, zero-hit
phrase absent) plus corpus-level SQL position-join parity."""

import duckdb
import pandas as pd

from kazu_ray.extras.phrase import (
    PHRASES,
    _match_batch,
    phrase_search_oracle_sql,
    q_phrase_search,
)

SF = "/root/testdata/sf0.001"


def test_intersection_semantics():
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a table scan then another table scan here",  # 2 hits
                "table then scan",  # words present but NOT adjacent
                "merge sort agg pipeline",  # 3-word phrase, 1 hit
                "TABLE SCAN uppercase",  # case-folded, 1 hit
            ],
        }
    )
    got = _match_batch(t).to_pylist()
    by = {(r["phrase"], r["doc_id"]): r["n_hits"] for r in got}
    assert by[("table scan", 1)] == 2
    assert ("table scan", 2) not in by
    assert by[("merge sort agg", 3)] == 1
    assert by[("table scan", 4)] == 1
    assert not any(p == "zebra quasar" for p, _ in by)


def test_oracle_parity_and_zero_hit_phrase(ray_session):
    got = q_phrase_search(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(phrase_search_oracle_sql()).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the planted never-occurring phrase is absent on both engines
    assert "zebra quasar" not in set(got["phrase"])
    assert any(len(p) == 3 for p in PHRASES)  # 3-word arity exercised


def test_bool_retrieval_semantics_and_parity(ray_session):
    import os
    import tempfile

    import pyarrow as pa

    from kazu_ray.extras.phrase import (
        bool_retrieval_oracle_sql,
        q_bool_retrieval,
    )

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "table then merge later",  # matches table AND merge
                "table only here",  # missing merge
                "merge sort hash join table",  # matches both AND queries
            ],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = q_bool_retrieval(d).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        exp = con.execute(bool_retrieval_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    hits = set(zip(got["query"], got["doc_id"]))
    assert ("table AND merge", 1) in hits
    assert ("table AND merge", 3) in hits
    assert ("table AND merge", 2) not in hits
    assert ("hash AND join AND sort", 3) in hits
    assert not any(q == "zebra" for q, _ in hits)
