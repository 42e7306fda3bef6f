"""Data-quality constraint audit — Deequ-style declarative checks
(referential integrity, ranges, null-freedom) evaluated exactly over
the table set in one pass per constraint.

Where extras/profile.py PROFILES columns (stats + distinctness), this
operator VERIFIES declared invariants and reports exact violation
counts — the gate a production ingest runs before promoting a
snapshot (Schelter et al. 2018, "Automating Large-Scale Data Quality
Verification" — Deequ's published design).

Check kinds:

* **foreign key** — child key must exist in the parent key set.
  Routed by the measured parent cardinality: small parents broadcast
  their distinct sorted key vector (``ray.put`` once, vectorised
  ``np.searchsorted`` membership per batch, one tiny count partial per
  block); parents past the cap go through the partitioned
  ``left_anti`` hash join (kazu_ray/joins.py) — both paths exact, the
  routing mirrors chunk_dedup's broadcast/co-group verdict apply.
* **range / not-null** — one vectorised ``pyarrow.compute`` pass,
  zero shuffle, fixed-size count partials.

Every check ships ONE (n, violations) partial per block; the driver
folds a partitions-bounded table.  At 100 TB nothing scales with
violation count or corpus size except the streaming scans.

Exact SQL oracle: each constraint is one LEFT-JOIN-IS-NULL or
filter-count subquery, UNION ALL'd — row-for-row including zero
violation counts (zero is evidence the check ran, not absence of
evidence: n_rows must still match the table).

Reference scope note: KAZU validates ontology curations at build time
(ontology/curations.py); this is the corpus-side analogue for the
training-data family (SURVEY.md §2l).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

AUDIT_SCHEMA = pa.schema(
    [
        ("constraint_name", pa.string()),
        ("n_rows", pa.int64()),
        ("n_violations", pa.int64()),
    ]
)

# parents with at most this many distinct keys broadcast; above it the
# partitioned left_anti hash join carries the check
BROADCAST_MAX_PARENT = 5_000_000

# (name, child_table, child_key, parent_table, parent_key)
FK_CHECKS = (
    ("fk_customer_nationkey", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("fk_lineitem_orderkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("fk_orders_custkey", "orders", "o_custkey", "customer", "c_custkey"),
)

# (name, table, column, SQL predicate for a VIOLATION, arrow predicate)
RULE_CHECKS = (
    (
        "notnull_documents_text",
        "documents",
        "text",
        "text IS NULL",
        lambda t: pc.is_null(t.column("text")),
    ),
    (
        "range_events_value_cap",
        "events",
        "value",
        "value > 400",
        lambda t: pc.greater(t.column("value"), pa.scalar(400.0)),
    ),
    (
        "range_orders_totalprice_pos",
        "orders",
        "o_totalprice",
        "o_totalprice <= 0",
        lambda t: pc.less_equal(t.column("o_totalprice"), pa.scalar(0.0)),
    ),
)


def _count_totals(ds):
    """Fold a dataset of (n, viol) partial rows into two ints."""
    tot = ds.sum(["n", "viol"])
    return int(tot["sum(n)"]), int(tot["sum(viol)"])


def _fk_violations(
    sf_dir: str,
    child_table: str,
    child_key: str,
    parent_table: str,
    parent_key: str,
    broadcast_max_parent: int,
) -> tuple[int, int]:
    import ray
    import ray.data as rd

    parents = (
        rd.read_parquet(f"{sf_dir}/{parent_table}.parquet", columns=[parent_key])
        .groupby(parent_key)
        .count()
        .select_columns([parent_key])
        .materialize()
    )
    n_parents = parents.count()
    child = rd.read_parquet(f"{sf_dir}/{child_table}.parquet", columns=[child_key])

    if n_parents == 0:
        # empty parent snapshot: every child row violates; an empty
        # dataset also has no schema for the anti-join to consume
        n_rows = child.count()
        return n_rows, n_rows

    if n_parents <= broadcast_max_parent:
        batches = list(
            parents.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        if batches:
            keys = np.sort(
                pa.concat_tables(batches)
                .column(parent_key)
                .to_numpy(zero_copy_only=False)
            )
        else:  # EMPTY parent table: every child row is a violation
            keys = np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)

        def partial(t: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)
            v = t.column(child_key).to_numpy(zero_copy_only=False)
            if len(ks):
                idx = np.searchsorted(ks, v)
                hit = (idx < len(ks)) & (
                    ks[np.minimum(idx, len(ks) - 1)] == v
                )
            else:
                hit = np.zeros(len(v), dtype=bool)
            return pa.table(
                {
                    "n": pa.array([len(v)], pa.int64()),
                    "viol": pa.array([int((~hit).sum())], pa.int64()),
                }
            )

        partials = child.map_batches(partial, batch_format="pyarrow")
        return _count_totals(partials)

    # partitioned exact path: left_anti join, count survivors
    # (hash_join keys are int64 by contract; cast both sides)
    from ..joins import hash_join

    def to64(col):
        def f(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index(col), col,
                pc.cast(t.column(col), pa.int64()),
            )

        return f

    n_rows = child.count()
    anti = hash_join(
        child.map_batches(to64(child_key), batch_format="pyarrow"),
        parents.map_batches(to64(parent_key), batch_format="pyarrow"),
        left_on=child_key,
        right_on=parent_key,
        how="left_anti",
    )
    return n_rows, anti.count()


def q_constraint_audit(
    sf_dir: str, broadcast_max_parent: int = BROADCAST_MAX_PARENT
):
    """Query surface: one exact (constraint_name, n_rows, n_violations)
    row per declared check, sorted.  Exact SQL parity via
    constraint_audit_oracle_sql."""
    import pandas as pd
    import ray.data as rd

    rows = []
    for name, child_t, child_k, parent_t, parent_k in FK_CHECKS:
        n, viol = _fk_violations(
            sf_dir, child_t, child_k, parent_t, parent_k, broadcast_max_parent
        )
        rows.append((name, n, viol))

    for name, table, col, _sql_pred, arrow_pred in RULE_CHECKS:
        # prune the read to the ONE column the check touches
        ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=[col])

        def partial(t: pa.Table, pred=arrow_pred) -> pa.Table:
            bad = pred(t)
            return pa.table(
                {
                    "n": pa.array([t.num_rows], pa.int64()),
                    "viol": pa.array(
                        [int(pc.sum(bad).as_py() or 0)], pa.int64()
                    ),
                }
            )

        n, viol = _count_totals(
            ds.map_batches(partial, batch_format="pyarrow")
        )
        rows.append((name, n, viol))

    out = pd.DataFrame(
        rows, columns=["constraint_name", "n_rows", "n_violations"]
    ).sort_values("constraint_name").reset_index(drop=True)
    return pa.Table.from_pandas(out, schema=AUDIT_SCHEMA, preserve_index=False)


def constraint_audit_oracle_sql() -> str:
    parts = []
    for name, child_t, child_k, parent_t, parent_k in FK_CHECKS:
        parts.append(
            f"""
            SELECT '{name}' AS constraint_name,
                   (SELECT COUNT(*) FROM {child_t})::BIGINT AS n_rows,
                   (SELECT COUNT(*) FROM {child_t} c
                    LEFT JOIN (SELECT DISTINCT {parent_k} FROM {parent_t}) p
                    ON c.{child_k} = p.{parent_k}
                    WHERE p.{parent_k} IS NULL)::BIGINT AS n_violations
            """
        )
    for name, table, _col, sql_pred, _arrow_pred in RULE_CHECKS:
        parts.append(
            f"""
            SELECT '{name}' AS constraint_name,
                   (SELECT COUNT(*) FROM {table})::BIGINT AS n_rows,
                   (SELECT COUNT(*) FROM {table} WHERE {sql_pred})::BIGINT
                       AS n_violations
            """
        )
    return " UNION ALL ".join(parts) + " ORDER BY constraint_name"
