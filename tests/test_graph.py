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


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------

from kazu_ray.extras.graph import (  # noqa: E402
    cooccur_edges,
    cooccur_edges_sql,
    triangle_counts,
    triangles_duckdb,
)


def _tri_rows(ds):
    return sorted((r["node"], r["degree"], r["triangles"]) for r in ds.take_all())


def test_triangles_hand_graphs(ray_session):
    import ray.data as rd

    # K3 plus a pendant, a self-loop and a parallel edge (both ignored)
    edges = pa.table(
        {
            "src": pa.array([1, 2, 3, 3, 1, 4, 2], pa.int64()),
            "dst": pa.array([2, 3, 1, 3, 2, 1, 1], pa.int64()),
        }
    )
    got = _tri_rows(triangle_counts(rd.from_arrow(edges)))
    assert got == [(1, 3, 1), (2, 2, 1), (3, 2, 1), (4, 1, 0)]

    # square with one diagonal: two triangles sharing edge (1,3)
    sq = pa.table(
        {
            "src": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "dst": pa.array([2, 3, 4, 1, 3], pa.int64()),
        }
    )
    got = _tri_rows(triangle_counts(rd.from_arrow(sq)))
    assert got == [(1, 3, 2), (2, 2, 1), (3, 3, 2), (4, 2, 1)]


def test_triangles_matches_duckdb(ray_session):
    got = _tri_rows(triangle_counts(cooccur_edges(SF)))
    exp = triangles_duckdb(duckdb.connect(), cooccur_edges_sql(SF))
    assert got == exp
    assert sum(t for _, _, t in got) % 3 == 0
    assert sum(t for _, _, t in got) > 0


def test_triangles_paths_equivalent(ray_session):
    """Distributed wedge-count pipeline == exact driver intersection
    path, bit-for-bit (integer counts)."""
    a = _tri_rows(triangle_counts(cooccur_edges(SF)))
    b = _tri_rows(triangle_counts(cooccur_edges(SF), driver_threshold=0))
    assert a == b


def test_triangles_random_vs_bruteforce(ray_session):
    import itertools

    import ray.data as rd

    rng = np.random.RandomState(7)
    n, m = 40, 220
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    got = _tri_rows(
        triangle_counts(
            rd.from_arrow(
                pa.table(
                    {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
                )
            ),
            driver_threshold=0,
        )
    )
    adj = set()
    for s, d in zip(src, dst):
        if s != d:
            adj.add((min(s, d), max(s, d)))
    nodes = sorted({x for e in adj for x in e})
    deg = {v: sum(1 for e in adj if v in e) for v in nodes}
    tri = {v: 0 for v in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in adj and (b, c) in adj and (a, c) in adj:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    assert got == [(v, deg[v], tri[v]) for v in nodes]


def test_triangles_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    assert triangle_counts(empty).count() == 0
    # self-loops only -> empty result
    loops = rd.from_arrow(
        pa.table({"src": pa.array([5, 6], pa.int64()), "dst": pa.array([5, 6], pa.int64())})
    )
    assert triangle_counts(loops).count() == 0


# ---------------------------------------------------------------------------
# k-hop reachability
# ---------------------------------------------------------------------------

from kazu_ray.extras.graph import (  # noqa: E402
    khop_distances,
    khop_duckdb,
    layered_edges,
    layered_edges_sql,
)


def _dist_rows(ds):
    return sorted((r["node"], r["dist"]) for r in ds.take_all())


def test_khop_hand_graph(ray_session):
    import ray.data as rd

    # 1 -> 2 -> 3 -> 4 -> 5, plus shortcut 1 -> 3 and a back-edge 3 -> 1
    edges = pa.table(
        {
            "src": pa.array([1, 2, 3, 4, 1, 3], pa.int64()),
            "dst": pa.array([2, 3, 4, 5, 3, 1], pa.int64()),
        }
    )
    got = _dist_rows(khop_distances(rd.from_arrow(edges), seeds=[1], k=2))
    assert got == [(1, 0), (2, 1), (3, 1), (4, 2)]
    # seed not in the graph -> just itself
    got = _dist_rows(khop_distances(rd.from_arrow(edges), seeds=[99], k=2))
    assert got == [(99, 0)]


def test_khop_matches_duckdb(ray_session):
    seeds = list(range(0, 400, 50))
    got = _dist_rows(khop_distances(layered_edges(SF), seeds=seeds, k=3))
    exp = khop_duckdb(
        duckdb.connect(),
        layered_edges_sql(SF),
        "SELECT UNNEST(" + str(seeds) + ") AS node",
        k=3,
    )
    assert got == exp
    assert {d for _, d in got} >= {0, 1}


def test_khop_paths_equivalent(ray_session):
    seeds = [0, 7, 100]
    a = _dist_rows(khop_distances(layered_edges(SF), seeds=seeds, k=2))
    b = _dist_rows(
        khop_distances(layered_edges(SF), seeds=seeds, k=2, driver_threshold=0)
    )
    assert a == b


def test_khop_early_exit(ray_session):
    import ray.data as rd

    # isolated seed: frontier empties after hop 1; k=5 must not loop
    edges = pa.table(
        {"src": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())}
    )
    got = _dist_rows(
        khop_distances(rd.from_arrow(edges), seeds=[1], k=5, driver_threshold=0)
    )
    assert got == [(1, 0), (2, 1)]


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def test_hits_matches_duckdb(ray_session):
    from kazu_ray.extras.graph import hits, hits_duckdb

    got = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits(_edges_ds(), n_iter=5).take_all()
    )
    exp = hits_duckdb(duckdb.connect(), EDGES_SQL, n_iter=5)
    assert [g[0] for g in got] == [e[0] for e in exp]
    assert np.allclose(
        [[g[1], g[2]] for g in got], [[e[1], e[2]] for e in exp], atol=1e-9
    )
    # both vectors are unit L2 after the final normalization
    assert abs(sum(g[1] ** 2 for g in got) - 1.0) < 1e-9
    assert abs(sum(g[2] ** 2 for g in got) - 1.0) < 1e-9


def test_hits_hand_graph(ray_session):
    import ray.data as rd
    from kazu_ray.extras.graph import hits

    # bipartite star: 1..4 all point at 0; 1 also points at 5
    edges = pa.table(
        {
            "src": pa.array([1, 2, 3, 4, 1], pa.int64()),
            "dst": pa.array([0, 0, 0, 0, 5], pa.int64()),
        }
    )
    rows = {r["node"]: r for r in hits(rd.from_arrow(edges), n_iter=20).take_all()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    # node 0 is the dominant authority, node 1 the dominant hub
    assert rows[0]["authority"] == max(r["authority"] for r in rows.values())
    assert rows[1]["hub"] == max(r["hub"] for r in rows.values())
    # pure sources have zero authority, pure sinks zero hub
    assert rows[1]["authority"] == 0.0 and rows[0]["hub"] == 0.0


def test_hits_paths_equivalent(ray_session):
    """Dataset-native sparse iteration == bounded driver recurrence."""
    from kazu_ray.extras.graph import hits

    a = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits(_edges_ds(), n_iter=2).take_all()
    )
    b = sorted(
        (r["node"], r["hub"], r["authority"])
        for r in hits(
            _edges_ds(), n_iter=2, driver_threshold=0, num_partitions=4
        ).take_all()
    )
    assert [x[0] for x in a] == [x[0] for x in b]
    assert np.allclose(
        [[x[1], x[2]] for x in a], [[x[1], x[2]] for x in b], atol=1e-12
    )


def test_hits_empty(ray_session):
    import ray.data as rd
    from kazu_ray.extras.graph import HITS_SCHEMA, hits

    out = hits(rd.from_arrow(HITS_SCHEMA.empty_table().select(["node"]).rename_columns(["src"]).append_column("dst", pa.array([], pa.int64()))))
    assert out.count() == 0
