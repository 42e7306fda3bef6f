"""EXACT distributed order statistics (percentile_disc at scale).

extras/sketches.py bounds quantile error with a mergeable KLL-style
sketch (the streaming default); this module computes the EXACT order
statistic — what you reach for when the number feeds a contract (SLA
p99, billing medians) rather than a dashboard.  The classic
scale-safe recipe, no global sort:

1. pass 1 — (min, max, count) via fixed-size per-block partials;
2. pass 2 — per-block counts over B=4096 uniform buckets (one
   fixed-size int vector per block crosses the wire); the driver
   cumsums to locate, for each requested p, the bucket holding rank
   ``ceil(p * n)`` (PERCENTILE_DISC semantics: the smallest value
   whose cumulative frequency reaches p) and the exact count below it;
3. pass 3 — for each target bucket: count / min / max partials; if the
   bucket is a single repeated value the answer is known without
   pulling; if its count <= ``pull_cap`` the bucket's values (expected
   ~n/4096) are pulled and the rank is read off the sorted pull;
   otherwise RECURSE into [min, max] of that bucket (depth <= 3).

Driver state is O(B) ints per pass plus one <=pull_cap value pull; at
100 TB with B=4096 a uniform-ish column resolves in one refinement,
and a pathological near-duplicate column terminates via the
single-value short-circuit.  Every pass is a streaming ``map_batches``
over a pruned single-column read.

Oracle: ``orders_percentiles`` in __ray_entry__.oracle_sql — DuckDB
``PERCENTILE_DISC(p) WITHIN GROUP`` over the same column, exact value
equality (the result is a member of the input, so no float-rounding
seam exists at all).

Reference scope note: the reference engine has no numeric analytics;
this extends the relational family (SURVEY.md §2 "beyond the
reference").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

N_BUCKETS = 4096
PULL_CAP = 200_000
MAX_DEPTH = 3


def _minmax_count(ds, col: str) -> tuple[float, float, int]:
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "lo": pa.array([float(v.min()) if len(v) else np.inf]),
                "hi": pa.array([float(v.max()) if len(v) else -np.inf]),
                "n": pa.array([len(v)], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (
        min(r["lo"] for r in rows),
        max(r["hi"] for r in rows),
        sum(r["n"] for r in rows),
    )


def _bucket_counts(ds, col: str, lo: float, hi: float) -> np.ndarray:
    width = (hi - lo) / N_BUCKETS

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[(v >= lo) & (v <= hi)]
        idx = np.minimum(((v - lo) / width).astype(np.int64), N_BUCKETS - 1)
        counts = np.bincount(idx, minlength=N_BUCKETS)
        return pa.table({"counts": pa.array([counts.tolist()], pa.list_(pa.int64(), N_BUCKETS))})

    total = np.zeros(N_BUCKETS, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        total += np.asarray(r["counts"], dtype=np.int64)
    return total


def _bucket_mask(v: np.ndarray, lo: float, hi: float, width: float, b: int):
    """Membership of bucket ``b`` via the IDENTICAL index arithmetic as
    pass 2 — a boundary value must land in the same bucket in every
    pass, so the predicate is the index function itself, never a
    reconstructed b_lo/b_hi comparison (float rounding could disagree)."""
    inside = (v >= lo) & (v <= hi)
    idx = np.minimum(((v - lo) / width).astype(np.int64), N_BUCKETS - 1)
    return inside & (idx == b)


def _bucket_stats(ds, col: str, lo: float, hi: float, width: float, b: int):
    """(count, min, max) of rows in bucket ``b`` via fixed-size partials."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[_bucket_mask(v, lo, hi, width, b)]
        return pa.table(
            {
                "n": pa.array([len(v)], pa.int64()),
                "lo": pa.array([float(v.min()) if len(v) else np.inf]),
                "hi": pa.array([float(v.max()) if len(v) else -np.inf]),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (
        sum(r["n"] for r in rows),
        min(r["lo"] for r in rows),
        max(r["hi"] for r in rows),
    )


def _pull_bucket(ds, col: str, lo: float, hi: float, width: float, b: int) -> np.ndarray:
    def filt(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"v": pa.array(v[_bucket_mask(v, lo, hi, width, b)], pa.float64())})

    vals = []
    for batch in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        vals.append(batch.column("v").to_numpy(zero_copy_only=False))
    return np.sort(np.concatenate(vals) if vals else np.empty(0))


def _resolve_rank(
    ds, col: str, lo: float, hi: float, rank: int, depth: int = 0
) -> float:
    """Value at 1-based ``rank`` among rows with lo <= v <= hi."""
    counts = _bucket_counts(ds, col, lo, hi)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, rank))
    below = int(cum[b - 1]) if b else 0
    width = (hi - lo) / N_BUCKETS
    n_b, v_lo, v_hi = _bucket_stats(ds, col, lo, hi, width, b)
    if v_lo == v_hi:  # single repeated value: answer known, no pull
        return v_lo
    if n_b <= PULL_CAP:
        pulled = _pull_bucket(ds, col, lo, hi, width, b)
        return float(pulled[rank - below - 1])
    if depth >= MAX_DEPTH:
        raise RuntimeError(
            f"exact percentile did not localize within depth {MAX_DEPTH}: "
            f"bucket holds {n_b} rows > pull_cap {PULL_CAP}"
        )
    # recurse on the bucket's OBSERVED value range (tighter than the
    # geometric bucket bounds), searching for the in-bucket rank
    return _resolve_rank(ds, col, v_lo, v_hi, rank - below, depth + 1)


def exact_percentiles(ds, col: str, ps=(0.5, 0.9, 0.99)):
    """(p, value) pandas frame of exact PERCENTILE_DISC order
    statistics.  ``ds`` is re-scanned per pass — pass a pruned
    single-column read (or a materialized dataset for repeat use)."""
    import pandas as pd

    lo, hi, n = _minmax_count(ds, col)
    rows = []
    for p in ps:
        if lo == hi:
            rows.append({"p": float(p), "value": lo})
            continue
        rank = max(1, int(np.ceil(p * n)))
        rows.append({"p": float(p), "value": _resolve_rank(ds, col, lo, hi, rank)})
    return pd.DataFrame(rows)


def q_orders_percentiles(sf_dir: str):
    """Exact p50/p90/p99 of o_totalprice (pruned single-column read)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    return exact_percentiles(ds.materialize(), "o_totalprice")


def orders_percentiles_oracle_sql() -> str:
    selects = [
        f"SELECT {p} AS p, PERCENTILE_DISC({p}) WITHIN GROUP"
        f" (ORDER BY o_totalprice) AS value FROM orders"
        for p in (0.5, 0.9, 0.99)
    ]
    return " UNION ALL ".join(selects) + " ORDER BY p"
