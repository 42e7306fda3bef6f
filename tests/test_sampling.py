"""Deterministic sampling/splitting: cross-engine parity with DuckDB
(the salted md5 decisions are reproducible as md5_number_upper SQL),
plus the invariances the operators promise (partition independence,
append stability, per-stratum counts)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from kazu_ray.extras.sampling import (
    _SCALE,
    _key_hash64,
    bernoulli_sample,
    epoch_mix,
    split_column,
    stratified_sample_k,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _docs_view():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return con


def test_key_hash_matches_duckdb_md5_number_upper():
    keys = [0, 1, 42, 999999, -7]
    got = _key_hash64(keys, "s1")
    con = duckdb.connect()
    for k, h in zip(keys, got):
        exp = con.execute(
            "SELECT md5_number_upper('s1:' || CAST(? AS VARCHAR))", [k]
        ).fetchone()[0]
        assert int(h) == exp


def test_bernoulli_matches_sql(ray_session):
    import ray.data as rd

    frac, salt = 0.25, "sample-v1"
    ds = rd.read_parquet(DOCS, columns=["doc_id"])
    got = sorted(r["doc_id"] for r in bernoulli_sample(ds, frac, salt=salt).take_all())
    thr = min(int(frac * _SCALE), (1 << 64) - 1)
    exp = [
        r[0]
        for r in _docs_view().execute(
            f"SELECT doc_id FROM documents "
            f"WHERE md5_number_upper('{salt}:' || CAST(doc_id AS VARCHAR)) < {thr} "
            f"ORDER BY doc_id"
        ).fetchall()
    ]
    assert got == exp
    assert 0.15 < len(got) / 500 < 0.35  # sane hit rate at n=500


def test_split_matches_sql_and_partitioning(ray_session):
    import ray.data as rd

    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    ds = rd.read_parquet(DOCS, columns=["doc_id"])
    got = {
        r["doc_id"]: r["split"]
        for r in split_column(ds, weights).take_all()
    }
    # same decisions when the input arrives in different blocks
    got_repart = {
        r["doc_id"]: r["split"]
        for r in split_column(
            rd.read_parquet(DOCS, columns=["doc_id"]).repartition(7), weights
        ).take_all()
    }
    assert got == got_repart

    names = list(weights)
    cuts = np.cumsum([weights[n] for n in names])
    cuts[-1] = 1.0 + 1e-9
    cases = " ".join(
        f"WHEN u < {c!r} THEN '{n}'" for n, c in zip(names, cuts)
    )
    exp = dict(
        _docs_view().execute(
            f"SELECT doc_id, CASE {cases} END AS split FROM ("
            f"  SELECT doc_id,"
            f"         md5_number_upper('split-v1:' || CAST(doc_id AS VARCHAR))"
            f"           / 18446744073709551616.0 AS u"
            f"  FROM documents)"
        ).fetchall()
    )
    assert got == exp
    counts = pd.Series(list(got.values())).value_counts()
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_stratified_k_matches_sql(ray_session):
    import ray.data as rd

    k, salt = 5, "strat-v1"
    ds = rd.read_parquet(DOCS, columns=["doc_id", "lang"])
    out = stratified_sample_k(ds, "lang", k, salt=salt).take_all()
    got = sorted((r["lang"], r["doc_id"]) for r in out)
    exp = sorted(
        _docs_view().execute(
            f"""
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5_number_upper('{salt}:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rn
              FROM documents)
            WHERE rn <= {k}
            """
        ).fetchall()
    )
    assert got == exp
    # exactly k per stratum (every stratum in this corpus has >= k rows)
    per = pd.Series([g for g, _ in got]).value_counts()
    assert (per == k).all()


def test_stratified_k_partition_invariance(ray_session):
    import ray.data as rd

    a = stratified_sample_k(
        rd.read_parquet(DOCS, columns=["doc_id", "lang"]), "lang", 3
    ).take_all()
    b = stratified_sample_k(
        rd.read_parquet(DOCS, columns=["doc_id", "lang"]).repartition(11), "lang", 3
    ).take_all()
    key = lambda rows: sorted((r["lang"], r["doc_id"]) for r in rows)
    assert key(a) == key(b)


def test_epoch_mix_matches_sql(ray_session):
    import ray.data as rd

    weights = {"src0": 2.3, "src1": 0.4, "src2": 1.0, "src3": 0.0}
    ds = rd.read_parquet(DOCS, columns=["doc_id", "source"])
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in epoch_mix(ds, weights, default_weight=1.5).take_all()
    )
    w_rows = ", ".join(f"('{s}', {w})" for s, w in weights.items())
    exp = sorted(
        _docs_view().execute(
            f"""
            WITH w(source, wt) AS (VALUES {w_rows}),
            base AS (
              -- CAST: VALUES literals are DECIMAL; the engine computes
              -- the fractional part in IEEE double, so the oracle must too
              SELECT doc_id, CAST(COALESCE(wt, 1.5) AS DOUBLE) AS wt,
                     md5_number_upper('mix-v1:' || CAST(doc_id AS VARCHAR))
                       / 18446744073709551616.0 AS u
              FROM documents LEFT JOIN w USING (source))
            SELECT doc_id,
                   unnest(range(CAST(floor(wt) AS BIGINT)
                                + CASE WHEN u < wt - floor(wt) THEN 1 ELSE 0 END)) AS epoch
            FROM base
            """
        ).fetchall()
    )
    assert got == exp
    # zero-weight source fully dropped; >1 weights produce epoch >= 1 copies
    srcs = dict(
        _docs_view().execute("SELECT doc_id, source FROM documents").fetchall()
    )
    assert not any(srcs[d] == "src3" for d, _ in got)
    assert any(srcs[d] == "src0" and e == 2 for d, e in got)


def test_epoch_mix_partition_invariance(ray_session):
    import ray.data as rd

    weights = {"src0": 2.5}
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in epoch_mix(
            rd.read_parquet(DOCS, columns=["doc_id", "source"]), weights
        ).take_all()
    )
    b = sorted(
        (r["doc_id"], r["epoch"])
        for r in epoch_mix(
            rd.read_parquet(DOCS, columns=["doc_id", "source"]).repartition(9),
            weights,
        ).take_all()
    )
    assert a == b


# --- A-ES weighted sampling ------------------------------------------------


def test_weighted_sample_sql_parity_and_invariance(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sampling import (
        weighted_sample_n,
        weighted_sample_oracle_sql,
    )

    docs = pd.DataFrame(
        {
            "doc_id": range(1000),
            "n_chars": [10 + (i * 37) % 500 for i in range(1000)],
        }
    )

    def run(nblocks):
        ds = rd.from_arrow(
            pa.Table.from_pandas(docs, preserve_index=False)
        ).repartition(nblocks)
        return (
            weighted_sample_n(ds, n=120, weight_col="n_chars")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run(2)
    b = run(17)
    assert a.equals(b)  # partition-invariant selection
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(weighted_sample_oracle_sql(120)).df()
    assert set(a["doc_id"]) == set(exp["doc_id"])


def test_weighted_sample_bias_and_zero_weights(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sampling import weighted_sample_n

    # half the corpus has 20x the weight; zero-weight rows never win
    docs = pd.DataFrame(
        {
            "doc_id": range(2000),
            "w": [0 if i % 10 == 9 else (200 if i % 2 else 10) for i in range(2000)],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(5)
    got = weighted_sample_n(ds, n=300, weight_col="w").to_pandas()
    assert len(got) == 300
    assert (got["w"] > 0).all()
    heavy_frac = (got["w"] == 200).mean()
    assert heavy_frac > 0.8  # 20x weight dominates the draw


def test_weighted_sample_n_larger_than_corpus(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sampling import weighted_sample_n

    docs = pd.DataFrame({"doc_id": range(7), "w": [1] * 7})
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = weighted_sample_n(ds, n=50, weight_col="w").to_pandas()
    assert sorted(got["doc_id"]) == list(range(7))
