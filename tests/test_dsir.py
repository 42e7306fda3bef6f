"""DSIR importance resampling (Xie et al. 2023): exact cross-engine
parity with the DuckDB oracle, selection semantics on a corpus with a
distinguishable target domain, and determinism."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.dsir import (
    dsir_oracle_sql,
    dsir_scores,
    dsir_select,
    fit_log_ratio,
    q_dsir_sample,
)

SF = "/root/testdata/sf0.001"


def test_exact_parity_with_duckdb(ray_session):
    got = q_dsir_sample(SF).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(dsir_oracle_sql()).fetchdf().sort_values("doc_id")
    exp = exp.reset_index(drop=True)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert (got["score"] - exp["score"]).abs().max() == 0.0
    assert (got["key"] - exp["key"]).abs().max() == 0.0


def test_selects_target_like_documents(ray_session):
    """Target-domain docs (ids % 10 == 0) use a disjoint vocabulary;
    DSIR must overwhelmingly select the docs that share it."""
    texts, ids = [], []
    for i in range(200):
        if i % 10 == 0:
            texts.append("genome protein enzyme pathway receptor kinase " * 5)
        elif i % 10 == 1:
            # non-target docs written in the target's vocabulary
            texts.append("protein pathway kinase receptor genome enzyme " * 5)
        else:
            texts.append("market price trade stock index bond yield " * 5)
        ids.append(i)
    tab = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    ds = rd.from_arrow(tab)
    lam = fit_log_ratio(ds)
    sel = dsir_select(dsir_scores(ds, lam), k=30)
    chosen = set(sel.column("doc_id").to_pylist())
    # the 40 biomedical-vocabulary docs dominate the selection
    bio = {i for i in ids if i % 10 in (0, 1)}
    assert len(chosen & bio) >= 25
    # scores separate the two vocabularies cleanly
    scored = {r["doc_id"]: r["score"] for r in dsir_scores(ds, lam).take_all()}
    bio_mean = np.mean([scored[i] for i in sorted(bio)])
    fin_mean = np.mean([scored[i] for i in ids if i % 10 not in (0, 1)])
    assert bio_mean > fin_mean + 1.0


def test_deterministic_across_runs(ray_session):
    a = q_dsir_sample(SF)
    b = q_dsir_sample(SF)
    assert a.equals(b)


def test_empty_and_degenerate(ray_session):
    tab = pa.table({"doc_id": pa.array([0, 5], type=pa.int64()),
                    "text": pa.array(["", None], type=pa.string())})
    ds = rd.from_arrow(tab)
    lam = fit_log_ratio(ds)
    assert lam.shape == (4096,)
    rows = dsir_scores(ds, lam).take_all()
    assert all(r["score"] == 0.0 for r in rows)
    sel = dsir_select(dsir_scores(ds, lam), k=1)
    assert sel.num_rows == 1
