"""PageRank: cross-engine parity with DuckDB replaying the identical
fixed-iteration recurrence, conservation of rank mass, and edge cases."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kazu_ray.extras.graph import pagerank, pagerank_duckdb

SF = "/root/testdata/sf0.001"
LINEITEM = f"{SF}/lineitem.parquet"

# layered graph with cycles (the modulo ranges overlap) and dangling
# sinks, derived identically in both engines
EDGES_SQL = f"""
    SELECT l_orderkey % 211 AS src, l_partkey % 193 AS dst
    FROM read_parquet('{LINEITEM}')
    UNION ALL
    SELECT l_partkey % 193 AS src, l_suppkey % 97 + 300 AS dst
    FROM read_parquet('{LINEITEM}')
"""


def _edges_ds():
    import ray.data as rd

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np

        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        src = np.concatenate([ok % 211, pk % 193])
        dst = np.concatenate([pk % 193, sk % 97 + 300])
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return rd.read_parquet(
        LINEITEM, columns=["l_orderkey", "l_partkey", "l_suppkey"]
    ).map_batches(derive, batch_format="pyarrow")


def test_pagerank_matches_duckdb(ray_session):
    got = sorted(
        (r["node"], r["rank"]) for r in pagerank(_edges_ds(), n_iter=10).take_all()
    )
    exp = pagerank_duckdb(duckdb.connect(), EDGES_SQL, n_iter=10)
    assert [g[0] for g in got] == [e[0] for e in exp]
    assert np.allclose([g[1] for g in got], [e[1] for e in exp], atol=1e-9)
    # rank mass is conserved exactly (dangling redistribution)
    assert abs(sum(g[1] for g in got) - 1.0) < 1e-9


def test_pagerank_hand_graph(ray_session):
    import ray.data as rd

    # star: many sources pointing at node 0, node 0 dangling
    edges = pa.table(
        {
            "src": pa.array([1, 2, 3, 4, 5, 1], pa.int64()),
            "dst": pa.array([0, 0, 0, 0, 0, 2], pa.int64()),
        }
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(rd.from_arrow(edges), n_iter=20).take_all()
    }
    assert set(ranks) == {0, 1, 2, 3, 4, 5}
    assert ranks[0] == max(ranks.values())  # the hub dominates
    assert ranks[2] > ranks[3]  # 2 has an extra in-link
    assert abs(sum(ranks.values()) - 1.0) < 1e-12


def test_pagerank_paths_equivalent(ray_session):
    """Dataset-native power iteration == bounded driver recurrence."""
    a = sorted(
        (r["node"], r["rank"])
        for r in pagerank(_edges_ds(), n_iter=3).take_all()
    )
    b = sorted(
        (r["node"], r["rank"])
        for r in pagerank(_edges_ds(), n_iter=3, driver_threshold=0).take_all()
    )
    assert [x[0] for x in a] == [x[0] for x in b]
    assert np.allclose([x[1] for x in a], [x[1] for x in b], atol=1e-12)


def test_pagerank_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert pagerank(empty).count() == 0
