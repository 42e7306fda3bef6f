"""Kneser-Ney bigram LM: hand-computed probabilities, exact DuckDB
full-pipeline parity, partition invariance."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kazu_ray.extras.kn_lm import (
    KN_D,
    kn_bigram_scores,
    kn_perplexity_oracle_sql,
    q_kn_perplexity,
)

SF = "/root/testdata/sf0.001"


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_hand_computed(ray_session):
    """Two tiny docs, vocab covers everything; verify P(b|a) by hand.

    corpus: "a b a b", "a c" -> bigrams (with <s>):
      (<s>,a):2 (a,b):2 (b,a):1 (a,c):1
    c(a)=3, N1+(a,.)=2; N1+(.,b)=1; N1+(..)=4 bigram types; V_eff=3.
    P(b|a) = (2-.75)/3 + .75*2/3 * (1+1)/(4+3+2)
    """
    rows = kn_bigram_scores(_docs(["a b a b", "a c"]), vocab_size=10).take_all()
    by_id = {r["doc_id"]: r for r in rows}
    p_b_a = (2 - KN_D) / 3 + KN_D * 2 / 3 * ((1 + 1) / (4 + 3 + 2))
    p_a_s = (2 - KN_D) / 2 + KN_D * 1 / 2 * ((2 + 1) / (4 + 3 + 2))
    p_a_b = (1 - KN_D) / 1 + KN_D * 1 / 1 * ((2 + 1) / (4 + 3 + 2))
    expect0 = -(np.log(p_a_s) + np.log(p_b_a) + np.log(p_a_b) + np.log(p_b_a)) / 4
    assert by_id[0]["n_tokens"] == 4
    assert abs(by_id[0]["neg_logprob_per_token"] - round(expect0, 4)) < 1e-9
    # probabilities are strictly positive and docs with no tokens vanish
    assert all(r["ppl"] > 0 for r in rows)


def test_matches_duckdb_exactly(ray_session):
    got = q_kn_perplexity(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(kn_perplexity_oracle_sql()).df()
    assert len(got) == len(exp) == 500
    assert (got["doc_id"].values == exp["doc_id"].values).all()
    assert (got["n_tokens"].values == exp["n_tokens"].values).all()
    assert (
        got["neg_logprob_per_token"].values
        == exp["neg_logprob_per_token"].values
    ).all()
    assert (got["ppl"].values == exp["ppl"].values).all()


def test_partition_invariance(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = sorted(
        (r["doc_id"], r["neg_logprob_per_token"])
        for r in kn_bigram_scores(ds, num_partitions=4).take_all()
    )
    b = sorted(
        (r["doc_id"], r["neg_logprob_per_token"])
        for r in kn_bigram_scores(ds.repartition(17), num_partitions=13).take_all()
    )
    assert a == b


def test_unk_mapping(ray_session):
    """vocab_size=1 forces every non-top token through <unk>; scores
    still well-defined and DuckDB (same V) still matches."""
    rows = kn_bigram_scores(
        _docs(["x y z", "x x x"]), vocab_size=1
    ).take_all()
    assert len(rows) == 2
    assert all(np.isfinite(r["neg_logprob_per_token"]) for r in rows)
