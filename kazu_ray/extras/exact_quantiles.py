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
    if not rows:  # dataset with zero blocks (e.g. an empty filter)
        return np.inf, -np.inf, 0
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


def _resolve_ranks(ds, col: str, lo: float, hi: float, ranks) -> dict:
    """Values at several 1-based ranks, SHARING one bucket-count pass
    and one pull per distinct target bucket (the multi-rank form NTILE
    needs: k-1 boundaries resolve in ~2 passes total instead of ~2(k-1))."""
    counts = _bucket_counts(ds, col, lo, hi)
    cum = np.cumsum(counts)
    width = (hi - lo) / N_BUCKETS
    by_bucket: dict[int, list[int]] = {}
    for t in ranks:
        by_bucket.setdefault(int(np.searchsorted(cum, t)), []).append(t)
    out: dict[int, float] = {}
    for b, ts in by_bucket.items():
        below = int(cum[b - 1]) if b else 0
        n_b, v_lo, v_hi = _bucket_stats(ds, col, lo, hi, width, b)
        if v_lo == v_hi:
            for t in ts:
                out[t] = v_lo
        elif n_b <= PULL_CAP:
            pulled = _pull_bucket(ds, col, lo, hi, width, b)
            for t in ts:
                out[t] = float(pulled[t - below - 1])
        else:
            for t in ts:
                out[t] = _resolve_rank(ds, col, v_lo, v_hi, t - below, 1)
    return out


def _tie_info(ds, col: str, tiebreak: str, values: np.ndarray):
    """For each boundary value: (#rows strictly below, sorted tiebreak
    keys of the rows AT the value) — ONE streaming pass for all
    boundaries.  The tie pull is bounded by the duplicate count of a
    single column value (asserted <= PULL_CAP; same contract as the
    percentile bucket pull)."""

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        tb = t.column(tiebreak).to_numpy(zero_copy_only=False).astype(np.float64)
        rows = []
        for i, val in enumerate(values):
            rows.append(
                {
                    "i": i,
                    "n_below": int((v < val).sum()),
                    "ties": tb[v == val].tolist(),
                }
            )
        return pa.Table.from_pylist(rows)

    n_below = np.zeros(len(values), dtype=np.int64)
    ties: list[list[float]] = [[] for _ in values]
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for i, nb, tl in zip(
            batch.column("i").to_pylist(),
            batch.column("n_below").to_pylist(),
            batch.column("ties").to_pylist(),
        ):
            n_below[i] += nb
            ties[i].extend(tl)
    for tl in ties:
        if len(tl) > PULL_CAP:
            raise RuntimeError(
                f"ntile tie group of {len(tl)} rows exceeds pull cap "
                f"{PULL_CAP}; boundary needs a second-key refinement pass"
            )
    return n_below, [np.sort(np.asarray(t)) for t in ties]


def exact_ntile(ds, k: int, col: str, tiebreak: str):
    """EXACT distributed NTILE(k) OVER (ORDER BY col, tiebreak) with no
    global sort: the k-1 bucket-boundary rows are located by the
    histogram-bisection order-statistic engine (composite-key exact via
    a single tie-resolution pass on ``tiebreak``), broadcast, and every
    row is assigned by k-1 vectorised lexicographic compares.  Driver
    state is O(k + N_BUCKETS); row data never shuffles.

    Requires n >= k and a (col, tiebreak) total order (tiebreak unique
    within equal col values), matching SQL NTILE's determinism
    requirement."""
    import ray

    lo, hi, n = _minmax_count(ds, col)
    if n < k:
        raise ValueError(f"ntile needs n >= k (n={n}, k={k})")
    q, r = divmod(n, k)
    ends = [j * q + min(j, r) for j in range(1, k)]
    # constant column: every boundary VALUE is lo and the tie pass
    # resolves the order entirely on the tiebreak key
    if lo == hi:
        vals_at = {t: lo for t in ends}
    else:
        vals_at = _resolve_ranks(ds, col, lo, hi, ends)
    bvals = np.array([vals_at[t] for t in ends], dtype=np.float64)
    n_below, ties = _tie_info(ds, col, tiebreak, bvals)
    btbs = np.array(
        [ties[i][ends[i] - n_below[i] - 1] for i in range(len(ends))],
        dtype=np.float64,
    )
    bounds_ref = ray.put((bvals, btbs))

    def assign(t: pa.Table) -> pa.Table:
        bv, bt = ray.get(bounds_ref)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        tb = t.column(tiebreak).to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.ones(len(v), dtype=np.int64)
        for j in range(len(bv)):
            bucket += (v > bv[j]) | ((v == bv[j]) & (tb > bt[j]))
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def q_orders_ntile(sf_dir: str, k: int = 10):
    """Per-order exact NTILE(10) bucket over (o_totalprice, o_orderkey)
    — deciles for curriculum ordering / stratified splits.  Exact SQL
    window-function parity via the oracle."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).materialize()
    return (
        exact_ntile(ds, k, "o_totalprice", "o_orderkey")
        .select_columns(["o_orderkey", "bucket"])
        .sort("o_orderkey")
    )


def orders_ntile_oracle_sql(k: int = 10) -> str:
    return f"""
        SELECT o_orderkey,
               CAST(NTILE({k}) OVER (ORDER BY o_totalprice, o_orderkey)
                    AS BIGINT) AS bucket
        FROM orders
        ORDER BY o_orderkey
    """


def q_orders_mad(sf_dir: str):
    """EXACT median absolute deviation (the robust scale estimator:
    MAD = median(|x - median(x)|)) — two passes of the histogram-
    bisection order-statistic engine, the second over the derived
    |x - med| column computed in-block.  |x - med| is a single float64
    subtraction identical on both engines and PERCENTILE_DISC returns
    a MEMBER of the derived values, so parity is exact with no
    rounding seam."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    ).materialize()
    lo, hi, n = _minmax_count(ds, "o_totalprice")
    rank = max(1, int(np.ceil(0.5 * n)))
    med = lo if lo == hi else _resolve_rank(ds, "o_totalprice", lo, hi, rank)

    def dev(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({"dev": pa.array(np.abs(v - med), pa.float64())})

    devs = ds.map_batches(dev, batch_format="pyarrow").materialize()
    dlo, dhi, _ = _minmax_count(devs, "dev")
    mad = dlo if dlo == dhi else _resolve_rank(devs, "dev", dlo, dhi, rank)
    return pa.Table.from_pandas(
        pd.DataFrame({"stat": ["mad", "median"], "value": [mad, med]}),
        preserve_index=False,
    )


def orders_mad_oracle_sql() -> str:
    return """
        WITH m AS (
          SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY o_totalprice)
                 AS med
          FROM orders
        )
        SELECT 'mad' AS stat,
               (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP
                       (ORDER BY ABS(o_totalprice - m.med))
                FROM orders, m) AS value
        FROM m
        UNION ALL
        SELECT 'median' AS stat, med AS value FROM m
        ORDER BY stat
    """


def _w_minmax_tot(ds, vcol: str, wcol: str):
    def partial(t: pa.Table) -> pa.Table:
        v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.rint(
            t.column(wcol).to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "lo": pa.array([float(v.min()) if len(v) else np.inf]),
                "hi": pa.array([float(v.max()) if len(v) else -np.inf]),
                "w": pa.array([int(w.sum())], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return (
        min(r["lo"] for r in rows),
        max(r["hi"] for r in rows),
        sum(r["w"] for r in rows),
    )


def _w_bucket_sums(ds, vcol, wcol, lo, hi):
    width = (hi - lo) / N_BUCKETS

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.rint(
            t.column(wcol).to_numpy(zero_copy_only=False).astype(np.float64)
        ).astype(np.int64)
        # restrict to the active range: on the recursion path rows
        # outside [lo, hi] are already accounted for by w_offset and
        # MUST NOT clip into the edge buckets
        m = (v >= lo) & (v <= hi)
        v, w = v[m], w[m]
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, N_BUCKETS - 1)
        sums = np.zeros(N_BUCKETS, dtype=np.int64)
        np.add.at(sums, idx, w)
        return pa.table({"sums": pa.array([sums.tolist()])})

    out = np.zeros(N_BUCKETS, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out += np.asarray(r["sums"], dtype=np.int64)
    return out


def _resolve_wrank(
    ds, vcol: str, wcol: str, lo: float, hi: float,
    target_num: int, target_den: int, w_offset: int, w_total: int,
    depth: int = 0,
):
    """Smallest value v whose cumulative weight cw (over the GLOBAL
    sorted order; ``w_offset`` = weight strictly below ``lo``)
    satisfies den*cw >= num*W_total — all integer comparisons, no
    float threshold."""
    sums = _w_bucket_sums(ds, vcol, wcol, lo, hi)
    cum = np.cumsum(sums) + w_offset
    crossing = target_den * cum >= target_num * w_total
    b = int(np.argmax(crossing))
    below = int(cum[b - 1]) if b else w_offset
    width = (hi - lo) / N_BUCKETS
    n_b, v_lo, v_hi = _bucket_stats(ds, vcol, lo, hi, width, b)
    if v_lo == v_hi:
        return v_lo
    if n_b <= PULL_CAP:
        vals, ws = [], []

        def filt(t: pa.Table) -> pa.Table:
            v = t.column(vcol).to_numpy(zero_copy_only=False).astype(np.float64)
            w = np.rint(
                t.column(wcol).to_numpy(zero_copy_only=False).astype(np.float64)
            ).astype(np.int64)
            m = _bucket_mask(v, lo, hi, width, b)
            return pa.table(
                {"v": pa.array(v[m], pa.float64()), "w": pa.array(w[m], pa.int64())}
            )

        for batch in ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            vals.append(batch.column("v").to_numpy(zero_copy_only=False))
            ws.append(batch.column("w").to_numpy(zero_copy_only=False))
        v = np.concatenate(vals) if vals else np.empty(0)
        w = np.concatenate(ws).astype(np.int64) if ws else np.empty(0, np.int64)
        order = np.argsort(v, kind="stable")
        cw = np.cumsum(w[order]) + below
        i = int(np.argmax(target_den * cw >= target_num * w_total))
        return float(v[order][i])
    if depth >= MAX_DEPTH:
        raise RuntimeError("weighted percentile did not localize")
    return _resolve_wrank(
        ds, vcol, wcol, v_lo, v_hi, target_num, target_den, below, w_total,
        depth + 1,
    )


def q_lineitem_weighted_percentiles(sf_dir: str):
    """EXACT weighted percentiles (quantity-weighted p50/p90/p99 of
    l_extendedprice): the histogram-bisection engine with WEIGHT sums
    per bucket, thresholds as pure integer inequalities
    ``den*cw >= num*W`` — no float threshold seam.  The weighted
    median is the standard importance-weighted corpus statistic
    (per-token cost percentiles over doc weights)."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_quantity"],
    ).materialize()
    lo, hi, w_total = _w_minmax_tot(ds, "l_extendedprice", "l_quantity")
    rows = []
    for num, den in ((1, 2), (9, 10), (99, 100)):
        v = (
            lo
            if lo == hi
            else _resolve_wrank(
                ds, "l_extendedprice", "l_quantity", lo, hi, num, den, 0,
                w_total,
            )
        )
        rows.append({"p": num / den, "value": v})
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def lineitem_weighted_percentiles_oracle_sql() -> str:
    selects = []
    for num, den in ((1, 2), (9, 10), (99, 100)):
        selects.append(
            f"""
            SELECT {num / den} AS p,
                   (SELECT MIN(v) FROM s, tot
                    WHERE {den} * cw >= {num} * tot.w) AS value
            """
        )
    return (
        """
        WITH tot AS (
            SELECT SUM(CAST(l_quantity AS BIGINT)) AS w FROM lineitem
        ),
        s AS (
            SELECT l_extendedprice AS v,
                   SUM(CAST(l_quantity AS BIGINT)) OVER (
                       ORDER BY l_extendedprice
                       ROWS UNBOUNDED PRECEDING
                   ) AS cw
            FROM lineitem
        )
        """
        + " UNION ALL ".join(selects)
        + " ORDER BY p"
    )
