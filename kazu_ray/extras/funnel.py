"""Ordered funnel analysis — per-user multi-step conversion counts
(the product-analytics primitive behind "signup → view → click →
purchase" dashboards; each step must occur STRICTLY AFTER the user's
first completion of the previous step).

Semantics (the standard first-touch funnel): t_1 = the user's earliest
step-1 event; t_k = the earliest step-k event with ts > t_{k-1}; the
user completes step k iff t_k exists.  Comparisons are on raw
microsecond timestamps with (ts, event_id) never needed — strict
greater-than on integers is unambiguous, so cross-engine results are
bit-exact with no float or tie seam.

Distributed shape: one groupby(user_id) exchange (the
events_sessions per-key contract), then a vectorised per-user pass —
per step, ``np.searchsorted`` over that user's sorted per-type
timestamp array finds the earliest qualifying event in O(log n).  The
output is one row per funnel step with the completing-user count:
per-block partial counts are additive (a user lives in exactly one
group), so the final fold is a ≤|steps| row reduce.

Exact SQL oracle: nested MIN-after-previous-step subqueries, one per
step, UNION ALL'd — row-for-row.

Reference scope note: KAZU has no event analytics; training-data
family (SURVEY.md §2l), composing with extras/windows.py's
sessionization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FUNNEL_STEPS = ("signup", "view", "click", "purchase")

FUNNEL_SCHEMA = pa.schema(
    [
        ("step_no", pa.int64()),
        ("step", pa.string()),
        ("n_users", pa.int64()),
    ]
)


def _user_depth(g) -> int:
    """Funnel depth (0..len(FUNNEL_STEPS)) for one user's events."""
    by_type: dict[str, np.ndarray] = {}
    for et, ts in zip(g["event_type"].to_numpy(), g["ts_us"].to_numpy()):
        by_type.setdefault(et, []).append(ts)
    for et in list(by_type):
        by_type[et] = np.sort(np.asarray(by_type[et], dtype=np.int64))
    t_prev = -(1 << 62)
    depth = 0
    for step in FUNNEL_STEPS:
        arr = by_type.get(step)
        if arr is None:
            break
        # earliest event of this type STRICTLY after t_prev
        i = int(np.searchsorted(arr, t_prev, side="right"))
        if i >= len(arr):
            break
        t_prev = int(arr[i])
        depth += 1
    return depth


def q_events_funnel(sf_dir: str):
    """Query surface: (step_no, step, n_users) — users completing each
    ordered funnel step.  Exact SQL parity via the nested-MIN oracle."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(
        lambda t: t.append_column(
            "ts_us",
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
        ).drop_columns(["ts"]),
        batch_format="pyarrow",
    )

    def per_group(g: "pd.DataFrame") -> "pd.DataFrame":
        depth = _user_depth(g)
        # one partial row per step the user completed
        return pd.DataFrame(
            {
                "step_no": np.arange(1, depth + 1, dtype=np.int64),
                "n": np.ones(depth, dtype=np.int64),
            }
        )

    partials = ds.groupby("user_id").map_groups(per_group, batch_format="pandas")
    counts = partials.groupby("step_no").sum("n").to_pandas()  # <= |steps| rows
    by = dict(zip(counts["step_no"], counts["sum(n)"]))
    # steps no user reached still get a row (count 0), like the oracle
    return pa.table(
        {
            "step_no": pa.array(
                range(1, len(FUNNEL_STEPS) + 1), type=pa.int64()
            ),
            "step": pa.array(list(FUNNEL_STEPS)),
            "n_users": pa.array(
                [int(by.get(k, 0)) for k in range(1, len(FUNNEL_STEPS) + 1)],
                type=pa.int64(),
            ),
        },
        schema=FUNNEL_SCHEMA,
    )


def events_funnel_oracle_sql() -> str:
    steps = FUNNEL_STEPS
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p ON e.user_id = p.user_id AND e.ts > p.t "
            f"WHERE e.event_type = '{steps[k - 1]}' GROUP BY e.user_id)"
        )
    selects = [
        f"SELECT {k} AS step_no, '{steps[k - 1]}' AS step, "
        f"(SELECT COUNT(*) FROM s{k})::BIGINT AS n_users"
        for k in range(1, len(steps) + 1)
    ]
    return (
        "WITH " + ", ".join(ctes) + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY step_no"
    )


WEEK_US = 7 * 86_400 * 1_000_000


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users are cohorted by the week of
    their FIRST event; cell (cohort_week, week_offset) counts cohort
    users with at least one event ``offset`` weeks later.  All
    arithmetic is integer floor-division on microsecond timestamps —
    bit-exact cross-engine.

    Shape: the same groupby(user_id) exchange as the funnel; each user
    emits its distinct (cohort_week, week_offset) pairs (bounded by
    the corpus time span), which are additive counts under one small
    groupby-sum."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                # normalize to microseconds first: parquet written by
                # pandas carries timestamp[ns], the corpus is [us]
                "week": pc.divide(
                    pc.cast(
                        pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
                    ),
                    pa.scalar(WEEK_US),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def per_user(g: "pd.DataFrame") -> "pd.DataFrame":
        weeks = np.unique(g["week"].to_numpy())
        w0 = int(weeks[0])
        return pd.DataFrame(
            {
                "cohort_week": np.full(len(weeks), w0, dtype=np.int64),
                "week_offset": weeks - w0,
                "n": np.ones(len(weeks), dtype=np.int64),
            }
        )

    out = (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n", alias_name="n_users"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.cast(
            pa.schema(
                [
                    ("cohort_week", pa.int64()),
                    ("week_offset", pa.int64()),
                    ("n_users", pa.int64()),
                ]
            )
        )

    return out.map_batches(finish, batch_format="pyarrow").sort(
        ["cohort_week", "week_offset"]
    )


def events_retention_oracle_sql() -> str:
    return f"""
        WITH weeks AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // {WEEK_US} AS w
            FROM events
        ),
        firsts AS (
            SELECT user_id, MIN(w) AS w0 FROM weeks GROUP BY user_id
        )
        SELECT CAST(f.w0 AS BIGINT) AS cohort_week,
               CAST(a.w - f.w0 AS BIGINT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM weeks a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """


INTERVAL_US = 5 * 60 * 1_000_000  # each event opens a 5-minute activity window


def q_events_coverage(sf_dir: str):
    """Interval-union coverage (gaps-and-islands): each event opens a
    fixed 5-minute activity interval; per user, overlapping intervals
    merge and the output is the total covered time plus the island
    count — the sweep-line primitive behind "active minutes" metrics
    and time-coverage dedup.

    Vectorised sweep per user: sort by start, running maximum of ends
    (np.maximum.accumulate), an island starts where start > the
    previous running max; island lengths sum from exact integer
    microseconds — bit-exact cross-engine.  One groupby(user_id)
    exchange, same contract as the funnel."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "s": pc.cast(
                    pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def sweep(g: "pd.DataFrame") -> "pd.DataFrame":
        s = np.sort(g["s"].to_numpy().astype(np.int64))
        e = s + INTERVAL_US
        # prev_max[i] = max end among intervals before i (exclusive)
        run = np.maximum.accumulate(e)
        new_island = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            new_island[1:] = s[1:] > run[:-1]
        starts = np.nonzero(new_island)[0]
        ends = np.append(starts[1:], len(s))
        covered = 0
        for a, b in zip(starts, ends):
            covered += int(run[b - 1]) - int(s[a])
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "covered_us": [covered],
                "n_islands": [len(starts)],
            }
        )

    out = ds.groupby("user_id").map_groups(sweep, batch_format="pandas")

    def finish(t: pa.Table) -> pa.Table:
        return t.cast(
            pa.schema(
                [
                    ("user_id", pa.int64()),
                    ("covered_us", pa.int64()),
                    ("n_islands", pa.int64()),
                ]
            )
        )

    return out.map_batches(finish, batch_format="pyarrow").sort("user_id")


def events_coverage_oracle_sql() -> str:
    return f"""
        WITH iv AS (
            SELECT user_id, epoch_us(ts) AS s,
                   epoch_us(ts) + {INTERVAL_US} AS e
            FROM events
        ),
        o AS (
            SELECT user_id, s, e,
                   MAX(e) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM iv
        ),
        isl AS (
            SELECT user_id, s, e,
                   SUM(CASE WHEN prev_max IS NULL OR s > prev_max
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY user_id ORDER BY s, e
                   ) AS island
            FROM o
        ),
        g AS (
            SELECT user_id, island, MAX(e) - MIN(s) AS len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS covered_us,
               CAST(COUNT(*) AS BIGINT) AS n_islands
        FROM g GROUP BY user_id ORDER BY user_id
    """


def q_funnel_latency(sf_dir: str):
    """Median step-to-step conversion latency: for each funnel step
    k >= 2, the EXACT median of (t_k - t_{k-1}) in integer
    microseconds over users completing step k — the "how long does
    conversion take" companion to the funnel counts.

    Per-user step times come from the same groupby(user_id) pass as
    the funnel; each per-step median is then resolved by the
    histogram-bisection order-statistic engine over the (step_no, dt)
    dataset (PERCENTILE_DISC semantics: the median is a member of the
    dt values, so parity has no rounding seam)."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from .exact_quantiles import _minmax_count, _resolve_rank

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(
        lambda t: t.append_column(
            "ts_us",
            pc.cast(pc.cast(t.column("ts"), pa.timestamp("us")), pa.int64()),
        ).drop_columns(["ts"]),
        batch_format="pyarrow",
    )

    def per_user_dts(g: "pd.DataFrame") -> "pd.DataFrame":
        by_type: dict[str, np.ndarray] = {}
        for et, ts in zip(g["event_type"].to_numpy(), g["ts_us"].to_numpy()):
            by_type.setdefault(et, []).append(ts)
        for et in list(by_type):
            by_type[et] = np.sort(np.asarray(by_type[et], dtype=np.int64))
        t_prev = -(1 << 62)
        rows = []
        for k, step in enumerate(FUNNEL_STEPS, start=1):
            arr = by_type.get(step)
            if arr is None:
                break
            i = int(np.searchsorted(arr, t_prev, side="right"))
            if i >= len(arr):
                break
            t_k = int(arr[i])
            if k >= 2:
                rows.append({"step_no": k, "dt": t_k - t_prev})
            t_prev = t_k
        return pd.DataFrame(rows, columns=["step_no", "dt"])

    dts = (
        ds.groupby("user_id")
        .map_groups(per_user_dts, batch_format="pandas")
        .materialize()
    )

    out = []
    for k in range(2, len(FUNNEL_STEPS) + 1):
        step_ds = dts.filter(expr=f"step_no == {k}").materialize()
        lo, hi, n = _minmax_count(step_ds, "dt")
        if n == 0:
            # no completers: the row still appears (NULL median), like
            # the oracle's empty PERCENTILE_DISC subquery
            med = None
        elif lo == hi:
            med = int(lo)
        else:
            rank = max(1, int(np.ceil(0.5 * n)))
            med = int(_resolve_rank(step_ds, "dt", lo, hi, rank))
        out.append(
            {
                "step_no": k,
                "step": FUNNEL_STEPS[k - 1],
                "n_users": n,
                "median_dt_us": med,
            }
        )
    df = pd.DataFrame(
        out, columns=["step_no", "step", "n_users", "median_dt_us"]
    ).astype(
        {"step_no": "int64", "n_users": "int64", "median_dt_us": "Int64"}
    )
    return pa.Table.from_pandas(df, preserve_index=False)


def funnel_latency_oracle_sql() -> str:
    steps = FUNNEL_STEPS
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p ON e.user_id = p.user_id AND e.ts > p.t "
            f"WHERE e.event_type = '{steps[k - 1]}' GROUP BY e.user_id)"
        )
    selects = []
    for k in range(2, len(steps) + 1):
        selects.append(
            f"""
            SELECT {k} AS step_no, '{steps[k - 1]}' AS step,
                   (SELECT COUNT(*) FROM s{k})::BIGINT AS n_users,
                   (SELECT PERCENTILE_DISC(0.5) WITHIN GROUP (
                        ORDER BY epoch_us(c.t) - epoch_us(p.t))
                    FROM s{k} c JOIN s{k - 1} p USING (user_id)
                   )::BIGINT AS median_dt_us
            """
        )
    return (
        "WITH " + ", ".join(ctes) + " "
        + " UNION ALL ".join(selects)
        + " ORDER BY step_no"
    )
