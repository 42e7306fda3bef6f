"""Graph analytics over materialized KG edge tables.

The KG pipeline materializes (subj, pred, obj) edge tables
(stages/triples.py); ranking the resulting graph is the canonical
downstream consumer — entity importance for disambiguation priors,
crawl scheduling, and corpus-curriculum weighting all reduce to
PageRank over a node/edge table.

Ray-Data-first power iteration (node and edge tables are Datasets
end-to-end; the driver sees one scalar per iteration):

- out-degrees: one ``groupby(src).count()``;
- each iteration joins the rank table to the edge table partition-wise
  (:func:`kazu_ray.joins.hash_join` — the rank table is the small,
  changing side; the edge table is scanned per iteration but at cluster
  scale would be hash-partitioned by src ONCE and cached, so only the
  rank vector moves);
- contributions aggregate with ``groupby(dst).sum``; nodes with no
  in-edges rejoin via a left join against the node table;
- dangling mass (rank parked on sink nodes) is a scalar ``sum()``
  redistributed uniformly, keeping ||rank||_1 = 1 exactly.

Cross-engine: DuckDB replays the identical fixed-iteration recurrence
(:func:`pagerank_duckdb`); scores match to float64 round-off (summation
order is the only divergence), gated at 1e-9 in tests/test_graph.py and
the driver-recorded pagerank gate in extras/metrics.py.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from kazu_ray.joins import hash_join

RANK_SCHEMA = pa.schema([("node", pa.int64()), ("rank", pa.float64())])


def _pagerank_driver(edges: pa.Table, damping: float, n_iter: int) -> pa.Table:
    """Exact bounded-input path: the identical recurrence vectorized in
    numpy on the driver (the sanctioned small path, as in
    cluster.connected_components)."""
    import numpy as np

    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes, idx = np.unique(np.concatenate([src, dst]), return_inverse=True)
    src_i, dst_i = idx[: len(src)], idx[len(src):]
    n = len(nodes)
    deg = np.bincount(src_i, minlength=n)
    rank = np.full(n, 1.0 / n)
    sending = deg > 0
    safe_deg = np.where(sending, deg, 1).astype(np.float64)
    for _ in range(n_iter):
        dangling = float(rank[~sending].sum())
        teleport = (1.0 - damping) / n + damping * dangling / n
        share = np.where(sending, rank / safe_deg, 0.0)
        contrib = np.bincount(dst_i, weights=share[src_i], minlength=n)
        rank = damping * contrib + teleport
    return pa.table(
        {"node": pa.array(nodes, pa.int64()), "rank": pa.array(rank, pa.float64())}
    )


def pagerank(
    edges_ds,
    damping: float = 0.85,
    n_iter: int = 10,
    num_partitions: int = 16,
    driver_threshold: int = 100_000,
):
    """PageRank over an (src, dst) int64 edge Dataset → (node, rank).

    Fixed ``n_iter`` power iterations (deterministic, cross-engine
    reproducible); parallel edges count once per occurrence, dangling
    nodes redistribute their mass uniformly.

    Edge sets at or below ``driver_threshold`` run the recurrence
    vectorized on the driver (per-iteration Ray execution overhead would
    dominate); above it, the fully dataset-native power iteration whose
    per-iteration driver traffic is one scalar.  The two paths agree to
    float64 summation round-off (test_graph.py pins 1e-12)."""
    import ray.data as rd

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(RANK_SCHEMA.empty_table())
    if n_edges <= driver_threshold:
        import ray

        blocks = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        table = pa.concat_tables(blocks).combine_chunks()
        return rd.from_arrow(_pagerank_driver(table, damping, n_iter))

    nodes = (
        edges.select_columns(["src"])
        .rename_columns({"src": "node"})
        .union(edges.select_columns(["dst"]).rename_columns({"dst": "node"}))
        .groupby("node")
        .count()
        .select_columns(["node"])
        .materialize()
    )
    n = nodes.count()

    deg = (
        edges.groupby("src")
        .count()
        .rename_columns({"src": "node", "count()": "deg"})
    )
    # node table with out-degree (0 for dangling sinks)
    base = hash_join(
        nodes,
        deg,
        left_on="node",
        right_on="node",
        how="left_outer",
        num_partitions=num_partitions,
        left_schema=pa.schema([("node", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("deg"),
            "deg",
            pc.fill_null(t.column("deg"), 0),
        ),
        batch_format="pyarrow",
    ).materialize()

    ranks = base.map_batches(
        lambda t: t.append_column(
            "rank", pa.array([1.0 / n] * t.num_rows, pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    rank_schema = pa.schema(
        [("node", pa.int64()), ("deg", pa.int64()), ("rank", pa.float64())]
    )
    for _ in range(n_iter):
        # rank mass parked on sinks, redistributed uniformly
        dangling = (
            ranks.filter(expr="deg == 0").sum("rank", ignore_nulls=True) or 0.0
        )
        sending = ranks.filter(expr="deg > 0").map_batches(
            lambda t: pa.table(
                {
                    "src_node": t.column("node"),
                    "share": pc.divide(
                        t.column("rank"),
                        pc.cast(t.column("deg"), pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contribs = hash_join(
            edges,
            sending,
            left_on="src",
            right_on="src_node",
            num_partitions=num_partitions,
            left_schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
            right_schema=pa.schema(
                [("src_node", pa.int64()), ("share", pa.float64())]
            ),
        )
        sums = (
            contribs.groupby("dst")
            .sum("share")
            .rename_columns({"dst": "in_node", "sum(share)": "in_sum"})
        )
        joined = hash_join(
            base,
            sums,
            left_on="node",
            right_on="in_node",
            how="left_outer",
            num_partitions=num_partitions,
            left_schema=pa.schema([("node", pa.int64()), ("deg", pa.int64())]),
            right_schema=pa.schema(
                [("in_node", pa.int64()), ("in_sum", pa.float64())]
            ),
        )
        teleport = (1.0 - damping) / n + damping * dangling / n

        def step(t: pa.Table, teleport=teleport) -> pa.Table:
            s = pc.fill_null(t.column("in_sum"), 0.0)
            new = pc.add(
                pc.multiply(s, pa.scalar(damping, pa.float64())),
                pa.scalar(teleport, pa.float64()),
            )
            return pa.table(
                {"node": t.column("node"), "deg": t.column("deg"), "rank": new}
            ).cast(rank_schema)

        ranks = joined.map_batches(step, batch_format="pyarrow").materialize()

    return ranks.select_columns(["node", "rank"])


def pagerank_duckdb(
    con,
    edges_sql: str,
    damping: float = 0.85,
    n_iter: int = 10,
):
    """Ground-truth PageRank in DuckDB: the identical fixed-iteration
    recurrence replayed over ``edges_sql`` (a query yielding src, dst).
    Returns sorted (node, rank) tuples."""
    con.execute(f"CREATE OR REPLACE TEMP TABLE _e AS {edges_sql}")
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE _nodes AS
        SELECT DISTINCT node FROM (
          SELECT src AS node FROM _e UNION SELECT dst FROM _e)
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE _deg AS
        SELECT n.node, COALESCE(d.deg, 0) AS deg FROM _nodes n
        LEFT JOIN (SELECT src AS node, COUNT(*) AS deg FROM _e GROUP BY 1) d
        USING (node)
        """
    )
    n = con.execute("SELECT COUNT(*) FROM _nodes").fetchone()[0]
    # float literals parse as DECIMAL in DuckDB; bind every constant as a
    # parameter so the recurrence runs in IEEE double like the engine
    con.execute(
        "CREATE OR REPLACE TEMP TABLE _rank AS "
        "SELECT node, deg, CAST(? AS DOUBLE) AS rank FROM _deg",
        [1.0 / n],
    )
    for _ in range(n_iter):
        dangling = con.execute(
            "SELECT COALESCE(SUM(rank), 0) FROM _rank WHERE deg = 0"
        ).fetchone()[0]
        teleport = (1.0 - damping) / n + damping * dangling / n
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE _next AS
            SELECT d.node, d.deg,
                   CAST(? AS DOUBLE) * COALESCE(c.s, 0) + CAST(? AS DOUBLE) AS rank
            FROM _deg d LEFT JOIN (
              SELECT e.dst AS node, SUM(r.rank / r.deg) AS s
              FROM _e e JOIN _rank r ON e.src = r.node AND r.deg > 0
              GROUP BY 1) c
            USING (node)
            """,
            [damping, teleport],
        )
        con.execute("CREATE OR REPLACE TEMP TABLE _rank AS SELECT * FROM _next")
    return sorted(con.execute("SELECT node, rank FROM _rank").fetchall())
