"""Near-duplicate clustering: connected components over candidate pairs.

Distributed min-label propagation (the standard groupby-iterate
formulation): each round, every node adopts the smallest label among
itself and its neighbours; converges in O(diameter) rounds.  Dedup
components are tiny and shallow in practice, so a handful of rounds
suffices; each round is a map + groupby(min) — no driver-side
union-find over the full edge set.
"""

from __future__ import annotations

import pyarrow as pa


def connected_components(pairs_ds, max_rounds: int = 6):
    """pairs Dataset (doc_a, doc_b) -> Dataset (doc_id, component)
    where component = min doc_id reachable.

    Only nodes that appear in at least one pair are returned (singletons
    are their own components trivially)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    edges = pairs_ds.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "a": pa.concat_arrays(
                    [t.column("doc_a").combine_chunks(), t.column("doc_b").combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [t.column("doc_b").combine_chunks(), t.column("doc_a").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    import ray

    # labels: start at min(self, min neighbour)
    labels = edges.groupby("a").aggregate(Min("b", alias_name="nbr_min"))
    labels = labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "doc_id": t.column("a"),
                "component": pa.compute.min_element_wise(
                    t.column("a").combine_chunks(), t.column("nbr_min").combine_chunks()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # broadcast the current label map (bounded by the duplicated-node
        # set, not the corpus) and push labels across edges; a
        # shuffle-join variant replaces this broadcast when the label
        # table outgrows the object store
        lbl_map = {
            r["doc_id"]: r["component"]
            for b in labels.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        lbl_ref = ray.put(lbl_map)

        def push(t: pa.Table) -> pa.Table:
            m = ray.get(lbl_ref)
            a = t.column("a").to_pylist()
            b = t.column("b").to_pylist()
            return pa.Table.from_pydict(
                {
                    "doc_id": b,
                    "component": [m.get(x, x) for x in a],
                }
            )

        prop = edges.map_batches(push, batch_format="pyarrow")
        new_labels = (
            prop.union(labels)
            .groupby("doc_id")
            .aggregate(Min("component", alias_name="component"))
            .materialize()
        )
        new_map = {
            r["doc_id"]: r["component"]
            for b in new_labels.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()
        }
        # pointer-jumping path compression on the (small) label map:
        # component -> component-of-component until fixpoint.  Turns the
        # 1-hop-per-round propagation into logarithmic convergence.
        for k in list(new_map):
            root = new_map[k]
            seen = []
            while new_map.get(root, root) != root:
                seen.append(root)
                root = new_map[root]
            new_map[k] = root
            for s in seen:
                new_map[s] = root
        labels = rd.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(list(new_map.keys()), type=pa.int64()),
                    "component": pa.array(list(new_map.values()), type=pa.int64()),
                }
            )
        ).materialize()
        if new_map == lbl_map:
            break
    return labels.sort("doc_id")


def q_neardup_components(sf_dir: str):
    """MinHash-LSH candidates -> connected components (dedup clusters)."""
    from .dedup import q_minhash_candidates

    pairs = q_minhash_candidates(sf_dir)
    return connected_components(pairs)
