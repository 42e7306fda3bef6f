"""PMI collocation mining: exact cross-engine parity with DuckDB,
partition invariance, semantics on a corpus with a known collocation,
and degenerate inputs."""

import duckdb
import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.collocations import (
    pmi_bigrams,
    pmi_oracle_sql,
    q_pmi_collocations,
)

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = con.execute(pmi_oracle_sql()).fetchdf().reset_index(drop=True)
    for c in ("n12", "n1", "n2"):
        exp[c] = exp[c].astype("int64")
    return exp


def test_exact_parity_with_duckdb(ray_session):
    got = q_pmi_collocations(SF).reset_index(drop=True)
    exp = _oracle(SF)
    assert len(got) == len(exp) and len(got) > 0
    assert got.equals(exp)


def test_partition_invariance(ray_session):
    ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ds9 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).repartition(9)
    assert pmi_bigrams(ds1).equals(pmi_bigrams(ds9))


def test_collocation_semantics(ray_session):
    """A pair that always co-occurs scores far above an equally frequent
    pair of independent words; bigrams spanning document boundaries are
    never counted."""
    docs = (
        ["strong coffee please"] * 10
        + ["strong tea please", "weak coffee please"] * 5
        + ["filler words here okay"] * 10
    )
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)}))
    df = pmi_bigrams(ds, min_count=5).set_index(["w1", "w2"])
    assert df.loc[("strong", "coffee"), "n12"] == 10
    # "please strong" never occurs inside one doc even though "please"
    # ends doc i and "strong" starts doc i+1
    assert ("please", "strong") not in df.index
    assert (
        df.loc[("filler", "words"), "pmi"] > df.loc[("coffee", "please"), "pmi"]
    )


def test_empty_and_single_token_docs(ray_session):
    ds = rd.from_arrow(
        pa.table({"text": pa.array(["", None, "one", "one", "one two"])})
    )
    df = pmi_bigrams(ds, min_count=1)
    assert list(df.itertuples(index=False, name=None)) == [
        ("one", "two", 1, 3, 1, round(__import__("math").log((1 / 1) / ((3 / 4) * (1 / 4))), 6))
    ]
