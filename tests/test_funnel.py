"""Ordered funnel (extras/funnel.py): strict-after semantics on
crafted users (out-of-order steps do NOT count, ties excluded by
strict >), zero-count step rows, and SQL parity on the corpus."""

import os
import tempfile

import duckdb
import pandas as pd
import pytest

from kazu_ray.extras.funnel import events_funnel_oracle_sql, q_events_funnel

SF = "/root/testdata/sf0.001"


def _run(df: pd.DataFrame) -> pd.DataFrame:
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = q_events_funnel(d).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        exp = con.execute(events_funnel_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        return got


def _events(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "event_type": [r[2] for r in rows],
        }
    )


def test_strict_ordering_semantics(ray_session):
    df = _events(
        [
            # user 1: full ordered funnel
            (1, 10, "signup"), (1, 20, "view"), (1, 30, "click"),
            (1, 40, "purchase"),
            # user 2: purchase BEFORE click -> depth stops at view... but
            # a later click exists, with no purchase after it -> depth 3
            (2, 10, "signup"), (2, 20, "view"), (2, 25, "purchase"),
            (2, 30, "click"),
            # user 3: view at the SAME instant as signup -> strict >
            # excludes it; depth 1
            (3, 10, "signup"), (3, 10, "view"),
            # user 4: never signed up -> depth 0 despite later steps
            (4, 10, "view"), (4, 20, "click"), (4, 30, "purchase"),
        ]
    )
    got = _run(df)
    by = dict(zip(got["step_no"], got["n_users"]))
    assert by == {1: 3, 2: 2, 3: 2, 4: 1}


def test_corpus_parity(ray_session):
    got = q_events_funnel(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(events_funnel_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_users"] > 0).all()


def test_retention_multi_cohort(ray_session):
    """Crafted three-cohort corpus: offsets count DISTINCT active
    weeks per user relative to the user's first week."""
    from kazu_ray.extras.funnel import (
        WEEK_US,
        events_retention_oracle_sql,
        q_events_retention,
    )

    def at_week(w, frac=0.5):
        return pd.to_datetime(int((w + frac) * WEEK_US), unit="us")

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": [
                at_week(0), at_week(0, 0.9), at_week(2),  # u1: w0 twice, w2
                at_week(1), at_week(2),                   # u2: w1, w2
                at_week(2),                               # u3: w2 only
            ],
            "event_type": ["view"] * 6,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = q_events_retention(d).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        exp = con.execute(events_retention_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    cells = {
        (r.cohort_week, r.week_offset): r.n_users for r in got.itertuples()
    }
    # u1 cohort w0 active at offsets {0, 2} (w0 counted ONCE)
    assert cells[(0, 0)] == 1 and cells[(0, 2)] == 1 and (0, 1) not in cells
    assert cells[(1, 0)] == 1 and cells[(1, 1)] == 1
    assert cells[(2, 0)] == 1


def test_retention_corpus_parity(ray_session):
    from kazu_ray.extras.funnel import (
        events_retention_oracle_sql,
        q_events_retention,
    )

    got = q_events_retention(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(events_retention_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_coverage_gaps_and_islands(ray_session):
    """Crafted stream: overlapping intervals merge, a gap splits
    islands, totals are exact integer microseconds."""
    from kazu_ray.extras.funnel import (
        INTERVAL_US,
        events_coverage_oracle_sql,
        q_events_coverage,
    )

    m = INTERVAL_US  # 5 min
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [0, m // 2, 3 * m, 10 * m], unit="us"
            ),
            "event_type": ["view"] * 4,
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = q_events_coverage(d).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        exp = con.execute(events_coverage_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    u1 = got[got["user_id"] == 1].iloc[0]
    # island A: [0, m/2 + m) merged = 1.5m; island B: [3m, 4m) = m
    assert u1["n_islands"] == 2
    assert u1["covered_us"] == (m // 2 + m) + m
    u2 = got[got["user_id"] == 2].iloc[0]
    assert u2["n_islands"] == 1 and u2["covered_us"] == m


def test_coverage_corpus_parity(ray_session):
    from kazu_ray.extras.funnel import (
        events_coverage_oracle_sql,
        q_events_coverage,
    )

    got = q_events_coverage(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(events_coverage_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["n_islands"] >= 1).all()


def test_funnel_latency_parity_and_crafted(ray_session):
    """Median inter-step latencies: exact vs the nested-CTE +
    PERCENTILE_DISC oracle, and a crafted stream where the medians are
    hand-computable."""
    from kazu_ray.extras.funnel import (
        funnel_latency_oracle_sql,
        q_funnel_latency,
    )

    # crafted: three users, signup->view gaps of 10s, 20s, 30s
    df = _events(
        [
            (1, 0, "signup"), (1, 10, "view"),
            (2, 0, "signup"), (2, 20, "view"),
            (3, 0, "signup"), (3, 30, "view"),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        got = q_funnel_latency(d).to_pandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        exp = con.execute(funnel_latency_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    row2 = got[got["step_no"] == 2].iloc[0]
    assert row2["n_users"] == 3 and row2["median_dt_us"] == 20_000_000
    # steps 3-4 have no completers: rows present with NULL medians
    assert got[got["step_no"] == 3]["n_users"].iloc[0] == 0
    assert pd.isna(got[got["step_no"] == 3]["median_dt_us"].iloc[0])

    # corpus parity
    got = q_funnel_latency(SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(funnel_latency_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
