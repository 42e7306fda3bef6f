"""Near-duplicate clustering: connected components over candidate pairs.

Fully dataset-native min-label propagation — no driver-side label map at
any point (the round-1 implementation broadcast a python dict per round;
that is O(dup-set) driver memory and dies at 10^12 docs).  Each round is:

  1. edge hop:   edges(a,b) ⋈ labels(doc_id=a)  →  (doc_id=b, component)
                 union labels → groupby(doc_id).min(component)
  2. pointer jump: labels ⋈ labels on (component=doc_id) — every node
                 adopts its root's label, doubling effective path length
                 (log-rounds convergence, the classic Hash-to-Min /
                 pointer-doubling trick from CC-in-MapReduce papers).

Joins go through :func:`kazu_ray.joins.hash_join` (partition-wise
pyarrow join inside groupby buckets) rather than ``Dataset.join`` —
see joins.py for the Ray 2.49 empty-first-block schema-broadcast bug
that breaks native joins on iterative small-block workloads.

Convergence is detected with a scalar aggregate: labels only ever
decrease (min over a set containing self), so sum(component) is strictly
monotone until fixpoint — one cheap `Dataset.sum` per round replaces any
driver-side diff of label maps.

All exchanges are Ray Data shuffle joins / groupbys, so the label table
lives in the object store, spills if needed, and partitions across the
cluster.  Reference parity: this backs the dedup extras (no direct KAZU
counterpart; KAZU is single-doc — see SURVEY.md §2 extras).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from kazu_ray.joins import hash_join


_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_LABEL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("component", pa.int64())])
_PARENT_SCHEMA = pa.schema([("p_id", pa.int64()), ("p_comp", pa.int64())])


def _symmetrize(t: pa.Table) -> pa.Table:
    a = t.column("doc_a")
    b = t.column("doc_b")
    fwd = pa.table({"a": a, "b": b})
    rev = pa.table({"a": b, "b": a})
    return pa.concat_tables([fwd, rev]).combine_chunks()


def _unionfind_table(pairs: list[tuple[int, int]]) -> pa.Table:
    """Driver-side union-find for BOUNDED inputs (the sanctioned small
    path: the pair list is already in driver memory and tiny)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((x, find(x)) for x in parent)
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "component": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def connected_components(
    pairs_ds,
    max_rounds: int = 12,
    num_partitions: int = 8,
    driver_threshold: int = 100_000,
):
    """pairs Dataset (doc_a, doc_b) -> Dataset (doc_id, component)
    where component = min doc_id reachable.

    Only nodes that appear in at least one pair are returned (singletons
    are their own components trivially).

    Inputs at or below ``driver_threshold`` pairs run exact union-find
    on the driver — the candidate-pair table is bounded and already
    small, and per-round Ray execution overhead would dominate.  Above
    it, fully dataset-native label propagation: the driver sees only one
    scalar per round (the label-sum convergence check); labels/edges
    stay in the object store.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    # materialize once: count() and the consumption below must not
    # re-execute an expensive upstream (e.g. the MinHash/LSH pipeline)
    pairs_ds = pairs_ds.materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    if n_pairs <= driver_threshold:
        pairs = [
            (r["doc_a"], r["doc_b"])
            for b in pairs_ds.iter_batches(batch_format="pyarrow", batch_size=None)
            for r in b.to_pylist()
        ]
        return rd.from_arrow(_unionfind_table(pairs))

    edges = pairs_ds.map_batches(_symmetrize, batch_format="pyarrow").materialize()

    # init: component = min(self, min neighbour)
    labels = (
        edges.groupby("a")
        .aggregate(Min("b", alias_name="nbr_min"))
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "doc_id": t.column("a"),
                    "component": pc.min_element_wise(
                        t.column("a").combine_chunks(), t.column("nbr_min").combine_chunks()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    def _label_sum(mat_ds) -> int:
        # convergence metric: a distributed aggregate over the already-
        # materialized label blocks.  This IS a (cheap) second Ray
        # execution per round — accepted: it reads cached blocks and
        # ships one scalar to the driver, vs streaming the whole label
        # table driver-side (labels only decrease, so the sum is
        # monotone until fixpoint).
        s = mat_ds.sum("component")
        return int(s) if s is not None else 0

    prev_sum = _label_sum(labels)

    for _ in range(max_rounds):
        # ONE heavy execution per round, plus the cheap cached-block
        # convergence aggregate (in-session executions carry fixed
        # overhead; round 1's 4 heavy executions/round made long runs
        # quadratic-feeling):
        #   hop:  edges ⋈ labels → candidates, union old, min per node
        #   jump: candidates ⋈ labels-as-parent (the PRE-hop table, which
        #         is already materialized so the self-join doesn't fork
        #         the lineage) — component <- parent[component].  Using
        #         the slightly stale parent keeps monotonicity and still
        #         compresses paths geometrically.
        parent = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"p_id": t.column("doc_id"), "p_comp": t.column("component")}
            ),
            batch_format="pyarrow",
        )
        prop = hash_join(
            edges,
            labels,
            left_on="a",
            right_on="doc_id",
            how="inner",
            num_partitions=num_partitions,
            left_schema=_EDGE_SCHEMA,
            right_schema=_LABEL_SCHEMA,
        ).map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc_id": t.column("b"), "component": t.column("component")}
            ),
            batch_format="pyarrow",
        )
        hopped = (
            prop.union(labels)
            .groupby("doc_id", num_partitions=num_partitions)
            .aggregate(Min("component", alias_name="component"))
        )
        labels = (
            hash_join(
                hopped,
                parent,
                left_on="component",
                right_on="p_id",
                how="left_outer",
                num_partitions=num_partitions,
                left_schema=_LABEL_SCHEMA,
                right_schema=_PARENT_SCHEMA,
            )
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "doc_id": t.column("doc_id"),
                        "component": pc.coalesce(
                            t.column("p_comp").combine_chunks(),
                            t.column("component").combine_chunks(),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            # sort-based map_groups emits one block per INPUT block, so
            # label blocks would multiply ~3× per round without this
            # lazy coalesce (still a single execution per round)
            .repartition(num_partitions)
            .materialize()
        )

        s = _label_sum(labels)
        if s == prev_sum:
            break
        prev_sum = s
    else:
        # loop exhausted without the label-sum fixpoint firing: labels
        # may still be shrinking, so callers would get wrong components
        # with no signal on adversarially deep graphs
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_rounds} rounds "
            "(graph deeper than max_rounds allows); raise max_rounds — "
            "pointer jumping needs only O(log n) rounds"
        )
    return labels.sort("doc_id")


def q_neardup_components(sf_dir: str):
    """MinHash-LSH candidates -> connected components (dedup clusters)."""
    from .dedup import q_minhash_candidates

    pairs = q_minhash_candidates(sf_dir)
    return connected_components(pairs)


def neardup_components_oracle_sql() -> str:
    """Exact oracle for the full LSH -> connected-components pipeline:
    DuckDB recomputes the candidate pairs (shared CTE, see
    dedup._minhash_pairs_cte) and closes them transitively with a
    recursive CTE; component = min reachable doc_id, matching
    :func:`connected_components` on both its union-find and
    label-propagation paths."""
    from .dedup import _minhash_pairs_cte

    return f"""
        WITH RECURSIVE {_minhash_pairs_cte()},
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM cand
            UNION
            SELECT doc_b, doc_a FROM cand
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS doc_id, LEAST(u, MIN(v)) AS component
        FROM reach GROUP BY u ORDER BY u
    """
