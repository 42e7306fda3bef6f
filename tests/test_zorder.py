"""Z-order layout: Morton code vs a bit-by-bit reference, SQL-ladder
parity, locality of the scaled bucketing, and the full stats query vs
its DuckDB oracle."""

import duckdb
import numpy as np

from kazu_ray.extras.zorder import (
    _spread16,
    _spread_sql,
    morton32,
    q_zorder_stats,
    zorder_oracle_sql,
    zorder_sort,
)


def _morton_ref(x: int, y: int) -> int:
    out = 0
    for b in range(16):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton_matches_bitwise_reference():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 65536, 500).astype(np.int64)
    ys = rng.integers(0, 65536, 500).astype(np.int64)
    got = morton32(xs, ys)
    for x, y, g in zip(xs, ys, got):
        assert int(g) == _morton_ref(int(x), int(y))


def test_spread_sql_ladder_matches_numpy():
    con = duckdb.connect()
    vals = [0, 1, 255, 256, 65535, 12345]
    sql = ", ".join(f"({_spread_sql(str(v))})" for v in vals)
    row = con.execute(f"SELECT {sql}").fetchone()
    exp = _spread16(np.array(vals, dtype=np.int64))
    assert list(row) == [int(v) for v in exp]


def test_morton_locality():
    """Adjacent points differ in few Morton bits; the key orders a 2x2
    quad contiguously (the property min/max pruning relies on)."""
    quad = sorted(
        int(morton32(np.array([x]), np.array([y]))[0])
        for x in (10, 11)
        for y in (20, 21)
    )
    assert quad[-1] - quad[0] == 3  # the quad occupies one Z cell


def test_zorder_stats_oracle_parity(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (
        q_zorder_stats(sf)
        .to_pandas()
        .sort_values("layout")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    )
    exp = con.execute(zorder_oracle_sql()).df()
    assert got[exp.columns.tolist()].astype(str).equals(exp.astype(str))
    # the layout claim itself: z-order bounds BOTH spans, the 1-D
    # layout leaves the non-clustered columns near full span
    z = got[got.layout == "zorder"].iloc[0]
    r = got[got.layout == "rowid"].iloc[0]
    assert z.sum_part_span * 10 < r.sum_part_span
    assert z.sum_supp_span * 2 < r.sum_supp_span


def test_zorder_sort_orders_by_key(ray_session):
    import ray.data as rd

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(
        f"{sf}/lineitem.parquet", columns=["l_orderkey", "l_partkey", "l_suppkey"]
    )
    out = zorder_sort(ds, "l_partkey", "l_suppkey").take(1000)
    keys = [r["zkey"] for r in out]
    assert keys == sorted(keys)
    pk = np.array([r["l_partkey"] for r in out])
    sk = np.array([r["l_suppkey"] for r in out])
    assert int(morton32(pk[:1], sk[:1])[0]) == keys[0]
