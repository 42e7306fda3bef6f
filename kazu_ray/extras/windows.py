"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows; per the engine's streaming story
(SURVEY.md §2i, ray guide): partition by key, sort by ts within the
group, and compute windows/joins with vectorized pandas inside
``groupby(key).map_groups``.  Ordering assumption: events for one
``user_id`` are processed as one sorted group; correctness does not
depend on inter-key order.

Both operators have exact DuckDB oracles (session via window functions,
as-of via ASOF JOIN).
"""

from __future__ import annotations

import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def q_events_sessions(sf_dir: str):
    """Sessionization: per user, events <=30min apart share a session;
    emit per-session (user_id, session_start_us, n_events, sum_value)."""
    import ray.data as rd

    from ..functions.rounding import round_half_away

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"])

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        us = g["ts"].astype("int64")
        new_session = (us.diff().fillna(SESSION_GAP_US + 1) > SESSION_GAP_US).cumsum()
        out = (
            g.assign(_us=us, _sid=new_session)
            .groupby("_sid")
            .agg(
                user_id=("user_id", "first"),
                session_start_us=("_us", "min"),
                n_events=("ts", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 3)
        return out

    return (
        ds.groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
        .sort(["user_id", "session_start_us"])
    )


def q_asof_join(sf_dir: str):
    """As-of join: each 'purchase' event matched to the user's most
    recent prior-or-equal 'view' event (pd.merge_asof per user group —
    the bucketed as-of join pattern)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type", "event_id"]
    )

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        purchases = g[g["event_type"] == "purchase"].sort_values("ts")
        views = g[g["event_type"] == "view"].sort_values("ts")
        if purchases.empty:
            return pd.DataFrame(
                {"purchase_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "view_id": pd.Series(dtype="int64")}
            )
        merged = pd.merge_asof(
            purchases[["ts", "event_id", "user_id"]],
            views[["ts", "event_id"]].rename(columns={"event_id": "view_event"}),
            on="ts",
            direction="backward",
        )
        return pd.DataFrame(
            {
                "purchase_id": merged["event_id"].astype("int64"),
                "user_id": merged["user_id"].astype("int64"),
                "view_id": merged["view_event"].astype("Int64").fillna(-1).astype("int64"),
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(asof, batch_format="pandas")
        .sort(["user_id", "purchase_id"])
    )
