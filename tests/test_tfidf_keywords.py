"""Per-doc TF-IDF keyword extraction: exact SQL parity (incl. the
ln-based scores), partition invariance, and tie-break determinism."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _oracle(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    from kazu_ray.extras.text_analysis import tfidf_keywords_oracle_sql

    con = duckdb.connect()
    con.register("documents", docs)
    return con.execute(tfidf_keywords_oracle_sql(k)).df()


def _run(docs: pd.DataFrame, k: int, nparts: int) -> pd.DataFrame:
    import ray.data as rd

    from kazu_ray.extras.text_analysis import tfidf_keywords

    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    return (
        tfidf_keywords(ds, k=k, num_partitions=nparts)
        .sort(["doc_id", "rank"])
        .to_pandas()
        .reset_index(drop=True)
    )


def _assert_equal(got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp)
    for c in ("doc_id", "term", "tf", "rank"):
        assert (got[c].values == exp[c].values).all(), c
    assert (got["score"].values == exp["score"].values).all()


def test_tfidf_oracle_parity_corpus(ray_session):
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    got = _run(docs, k=5, nparts=8)
    _assert_equal(got, _oracle(docs, k=5))
    assert (got.groupby("doc_id")["rank"].max() <= 5).all()


def test_tfidf_partition_invariance(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(f"w{(i * 3 + j) % 17}" for j in range(4 + i % 9))
                for i in range(30)
            ],
        }
    )
    a = _run(docs, k=3, nparts=2)
    b = _run(docs, k=3, nparts=13)
    _assert_equal(a, b)
    _assert_equal(a, _oracle(docs, k=3))


def test_tfidf_tie_break_and_casefold(ray_session):
    # equal (tf, df) scores tie -> term ASC decides; tokens casefold
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["Zeta alpha Zeta alpha beta", "gamma delta"],
        }
    )
    got = _run(docs, k=4, nparts=3)
    _assert_equal(got, _oracle(docs, k=4))
    d0 = got[got["doc_id"] == 0]
    # alpha and zeta both (tf=2, df=1): alpha ranks first alphabetically
    assert d0.iloc[0]["term"] == "alpha" and d0.iloc[1]["term"] == "zeta"
