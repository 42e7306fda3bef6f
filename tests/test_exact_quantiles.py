"""Exact distributed order statistics: PERCENTILE_DISC semantics,
duplicate-heavy short-circuit, constant columns, numpy ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa

from kazu_ray.extras.exact_quantiles import exact_percentiles

SF = "/root/testdata/sf0.001"


def _disc(values: np.ndarray, p: float) -> float:
    """PERCENTILE_DISC ground truth: smallest value whose cumulative
    frequency reaches p (the ceil(p*n)-th order statistic)."""
    s = np.sort(values)
    return float(s[max(1, int(np.ceil(p * len(s)))) - 1])


def _ds(values: np.ndarray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"v": pa.array(values, pa.float64())})
    ).repartition(8)


def test_matches_numpy_disc_semantics(ray_session):
    rng = np.random.default_rng(3)
    vals = np.round(rng.lognormal(3, 1, 5000), 2)
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.1, 0.5, 0.9, 0.99))
    for _, row in got.iterrows():
        assert row["value"] == _disc(vals, row["p"]), row["p"]
        assert row["value"] in vals  # DISC returns a member of the input


def test_duplicate_heavy_short_circuit(ray_session):
    """90% of rows share one value: the median's bucket is a single
    repeated value and resolves WITHOUT pulling rows."""
    rng = np.random.default_rng(4)
    vals = np.concatenate([np.full(9000, 42.5), rng.uniform(0, 100, 1000)])
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.5,))
    assert got["value"].iloc[0] == 42.5 == _disc(vals, 0.5)


def test_constant_column(ray_session):
    vals = np.full(1000, 7.25)
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.5, 0.99))
    assert (got["value"] == 7.25).all()


def test_tiny_input_ranks(ray_session):
    vals = np.array([10.0, 20.0, 30.0, 40.0])
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.25, 0.5, 0.75, 1.0))
    assert got["value"].tolist() == [10.0, 20.0, 30.0, 40.0]


def test_ntile_oracle_parity_and_sizes(ray_session):
    import duckdb

    from kazu_ray.extras.exact_quantiles import (
        orders_ntile_oracle_sql,
        q_orders_ntile,
    )

    got = q_orders_ntile(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(orders_ntile_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    sizes = got["bucket"].value_counts()
    assert sizes.max() - sizes.min() <= 1  # NTILE's equal-split law


def test_ntile_nondivisible_and_heavy_ties(ray_session):
    """n % k != 0 puts the extra rows in the FIRST buckets, and a
    column that is one giant tie group resolves entirely through the
    tiebreak pass."""
    import duckdb
    import numpy as np
    import ray.data as rd

    n, k = 103, 7
    df = pd.DataFrame(
        {
            "key": np.arange(n, dtype=np.int64),
            # three distinct values, one of them covering half the rows
            "val": np.where(np.arange(n) % 2 == 0, 5.0,
                            np.where(np.arange(n) % 3 == 0, 1.0, 9.0)),
        }
    )
    from kazu_ray.extras.exact_quantiles import exact_ntile

    ds = rd.from_pandas(df).repartition(8).materialize()
    got = (
        exact_ntile(ds, k, "val", "key")
        .select_columns(["key", "bucket"])
        .sort("key")
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        f"SELECT key, CAST(NTILE({k}) OVER (ORDER BY val, key) AS BIGINT)"
        f" AS bucket FROM t ORDER BY key"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_mad_oracle_parity(ray_session):
    import duckdb

    from kazu_ray.extras.exact_quantiles import (
        orders_mad_oracle_sql,
        q_orders_mad,
    )

    got = q_orders_mad(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    exp = con.execute(orders_mad_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    mad = got.loc[got["stat"] == "mad", "value"].iloc[0]
    assert mad > 0


def test_weighted_percentiles_parity_and_semantics(ray_session):
    import duckdb
    import numpy as np

    from kazu_ray.extras.exact_quantiles import (
        lineitem_weighted_percentiles_oracle_sql,
        q_lineitem_weighted_percentiles,
    )

    got = q_lineitem_weighted_percentiles(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    exp = con.execute(lineitem_weighted_percentiles_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    # semantics vs a brute-force weighted quantile on the full column
    df = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_extendedprice", "l_quantity"])
    v = df["l_extendedprice"].to_numpy()
    w = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
    order = np.argsort(v, kind="stable")
    cw = np.cumsum(w[order])
    W = int(w.sum())
    for p_row in got.itertuples():
        num, den = {0.5: (1, 2), 0.9: (9, 10), 0.99: (99, 100)}[p_row.p]
        i = int(np.argmax(den * cw >= num * W))
        assert p_row.value == float(v[order][i])


def test_weighted_percentile_recursion_path(ray_session):
    """PULL_CAP exceeded in the target bucket forces recursion; rows
    OUTSIDE the refined range must not contaminate the sub-histogram
    (regression: _w_bucket_sums used to clip them into edge buckets)."""
    import numpy as np
    import ray.data as rd

    from kazu_ray.extras import exact_quantiles as eq

    rng = np.random.default_rng(11)
    below = np.full(2000, 10.0)
    cluster = rng.choice(np.linspace(100.0, 100.9, 50), size=400)
    above = np.full(2000, 500.0)
    v = np.concatenate([below, cluster, above])
    w = np.ones(len(v), dtype=np.int64)
    df = pd.DataFrame({"v": v, "w": w})
    ds = rd.from_pandas(df).repartition(4).materialize()

    old_cap = eq.PULL_CAP
    eq.PULL_CAP = 100  # force the cluster bucket past the cap
    try:
        lo, hi, W = eq._w_minmax_tot(ds, "v", "w")
        got = eq._resolve_wrank(ds, "v", "w", lo, hi, 1, 2, 0, W)
    finally:
        eq.PULL_CAP = old_cap
    order = np.argsort(v, kind="stable")
    cw = np.cumsum(w[order])
    expect = float(v[order][int(np.argmax(2 * cw >= W))])
    assert got == expect


def test_ntile_constant_column(ray_session):
    """A constant value column is valid input (the tiebreak key is the
    total order); regression: used to crash on width == 0."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from kazu_ray.extras.exact_quantiles import exact_ntile

    df = pd.DataFrame(
        {"key": np.arange(50, dtype=np.int64), "val": np.full(50, 7.0)}
    )
    ds = rd.from_pandas(df).repartition(4).materialize()
    got = (
        exact_ntile(ds, 5, "val", "key")
        .select_columns(["key", "bucket"])
        .sort("key")
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT key, CAST(NTILE(5) OVER (ORDER BY val, key) AS BIGINT)"
        " AS bucket FROM t ORDER BY key"
    ).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
