"""Sessionization: whale-safe two-phase bucketed variant must be exactly
equivalent to the per-user path (which the DuckDB oracle checks)."""

import pandas as pd
import pyarrow as pa
import pytest

from kazu_ray.extras.windows import SESSION_GAP_US, sessionize_events

HOUR_US = 3600 * 1_000_000


def _rows(ds):
    return [
        (r["user_id"], r["session_start_us"], r["n_events"], r["sum_value"])
        for r in ds.take_all()
    ]


def test_bucketed_equals_simple_on_real_data(ray_session):
    from kazu_ray.extras.windows import q_events_sessions

    sf = "/root/testdata/sf0.001"
    simple = _rows(q_events_sessions(sf))
    bucketed = _rows(q_events_sessions(sf, bucket_us=6 * HOUR_US))
    assert bucketed == simple


def test_bucket_boundary_cases(ray_session):
    import ray.data as rd

    gap = SESSION_GAP_US
    bucket = 4 * gap
    # user 1: a session STRADDLING a bucket edge (events just inside the
    # gap across the boundary); user 2: events separated by exactly the
    # gap (same session) and gap+1 (new session)
    events = [
        (1, bucket - gap // 2, 1.0),
        (1, bucket + gap // 4, 2.0),       # crosses the boundary, gap < limit
        (2, 0, 1.0),
        (2, gap, 1.0),                      # == gap -> same session
        (2, 2 * gap + 1, 5.0),              # gap+1 -> new session
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": [e[0] for e in events],
                "ts": [e[1] for e in events],
                "value": [e[2] for e in events],
            }
        )
    )
    simple = _rows(sessionize_events(ds))
    bucketed = _rows(sessionize_events(ds, bucket_us=bucket))
    assert bucketed == simple
    by_user: dict = {}
    for u, start, n, v in simple:
        by_user.setdefault(u, []).append((start, n, v))
    assert len(by_user[1]) == 1 and by_user[1][0][1] == 2  # straddling merged
    assert [s[1] for s in by_user[2]] == [2, 1]


def test_whale_user_bucketed(ray_session):
    """A single hot user with one continuous mega-session: phase-1
    groups stay bucket-sized and the merge reconstructs one session."""
    import numpy as np
    import ray.data as rd

    n = 20_000
    step = SESSION_GAP_US // 2
    ts = (np.arange(n, dtype=np.int64) * step).tolist()
    ds = rd.from_arrow(
        pa.table({"user_id": [42] * n, "ts": ts, "value": [0.5] * n})
    )
    out = _rows(sessionize_events(ds, bucket_us=50 * SESSION_GAP_US))
    assert len(out) == 1
    assert out[0][0] == 42 and out[0][2] == n


def test_auto_bucket_default(ray_session, monkeypatch):
    """Default bucket_us='auto': the stats-derived bucket width is sane
    and the auto-forced bucketed path equals the simple path exactly."""
    import kazu_ray.extras.windows as W

    sf = "/root/testdata/sf0.001"
    b = W._auto_bucket_us(f"{sf}/events.parquet")
    assert b >= W.SESSION_GAP_US
    simple = W.q_events_sessions(sf, bucket_us=None).take_all()
    # force the large-input branch so 'auto' routes through bucketing
    monkeypatch.setattr(W, "SIMPLE_PATH_MAX_BYTES", 0)
    auto = W.q_events_sessions(sf).take_all()
    assert auto == simple


def test_range_join_bucket_boundaries(ray_session):
    """Hand-built fixture exercising the bucket-replication edges: a
    probe near a bucket boundary must still see builds just across it,
    and counts exclude the probe itself."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.windows import q_range_join

    # window 60 s -> bucket 120 s.  Times chosen so probe at 119.9 s
    # (bucket 0) must count a build at 120.1 s (bucket 1) and one at
    # 60 s (same bucket), but not one at 185 s.
    base = 1_700_000_000_000_000  # us
    rows = [
        # event_id, seconds offset, type
        (1, 119.9, "error"),
        (2, 120.1, "click"),
        (3, 60.0, "view"),
        (4, 185.0, "click"),
        (5, 500.0, "error"),   # isolated -> 0 nearby
        (6, 119.95, "error"),  # two probes near each other count each other
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [base + int(r[1] * 1e6) for r in rows], type=pa.timestamp("us")
            ),
            "event_type": pa.array([r[2] for r in rows]),
        }
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        import pyarrow.parquet as pq
        pq.write_table(tbl, os.path.join(td, "events.parquet"))
        got = {r["event_id"]: r["n_nearby"] for r in q_range_join(td).take_all()}
    # probe 1 @119.9: builds within [59.9, 179.9] -> {2 (120.1), 3 (60.0), 6 (119.95)} = 3
    # probe 5 @500: none
    # probe 6 @119.95: builds within [59.95, 179.95] -> {1, 2, 3} = 3
    assert got == {1: 3, 5: 0, 6: 3}


def test_events_sliding_gap_awareness(ray_session):
    """The sliding frame is a TIME range: an hour gap must drop the
    stale hour from the window rather than sliding by row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    from kazu_ray.extras.windows import q_events_sliding

    base = 1_700_000_000_000_000
    H = 3_600_000_000
    # hours 0, 1, 4 (gap at 2-3): window(3h) at hour 4 must contain ONLY hour 4
    rows = [(i, h * H + base, "click", 1.0) for i, h in enumerate([0, 0, 1, 4])]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(tbl, os.path.join(td, "events.parquet"))
        got = {r["hour_bucket"] - base // H: r["n_events_win"]
               for r in q_events_sliding(td).take_all()}
    assert got == {0: 2, 1: 3, 4: 1}


def test_range_join_random_vs_bruteforce(ray_session, tmp_path):
    """Seeded random event sets: the bucketed range join must equal an
    O(n^2) brute-force count — catches any replication/boundary slip
    beyond the hand fixture."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from kazu_ray.extras.windows import q_range_join

    rng = np.random.default_rng(42)
    n = 300
    base = 1_700_000_000_000_000
    ts = base + np.sort(rng.integers(0, 3600 * 1_000_000, size=n))
    types = rng.choice(["error", "click", "view"], size=n, p=[0.3, 0.4, 0.3])
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
            "event_type": pa.array(types.tolist()),
        }
    )
    d = str(tmp_path / "ev")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    got = {r["event_id"]: r["n_nearby"] for r in q_range_join(d).take_all()}
    w = 60 * 1_000_000
    want = {}
    for i in range(n):
        if types[i] != "error":
            continue
        want[i] = int(
            ((ts >= ts[i] - w) & (ts <= ts[i] + w)).sum() - 1
        )
    assert got == want


def test_events_sliding_random_vs_bruteforce(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from kazu_ray.extras.windows import q_events_sliding

    rng = np.random.default_rng(7)
    n = 400
    base = 1_700_000_000_000_000
    H = 3_600_000_000
    ts = base + rng.integers(0, 48 * H, size=n)
    types = rng.choice(["a", "b"], size=n)
    vals = np.round(rng.uniform(0, 20, size=n), 2)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": pa.array(ts.tolist(), type=pa.timestamp("us")),
            "event_type": pa.array(types.tolist()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )
    d = str(tmp_path / "ev2")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    rows = q_events_sliding(d).take_all()
    hours = ts // H
    for r in rows[:50]:
        et, h = r["event_type"], r["hour_bucket"]
        mask = (types == et) & (hours >= h - 2) & (hours <= h)
        assert r["n_events_win"] == int(mask.sum()), (et, h)


def test_events_anomaly_oracle_parity(ray_session):
    """Integer-exact rolling z-test: boolean flags match the SQL window
    replay bit-for-bit (no float-threshold seam by construction)."""
    import duckdb

    from kazu_ray.extras.windows import (
        events_anomaly_oracle_sql,
        q_events_anomaly,
    )

    sf = "/root/testdata/sf0.001"
    got = q_events_anomaly(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    exp = con.execute(events_anomaly_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # warm-up rows (insufficient history) are never flagged
    assert not got.loc[got["n_prior"] < 8, "is_anomaly"].any()


def test_events_anomaly_flags_planted_spike(ray_session):
    """A constant-ish stream with one planted spike flags exactly the
    spike; warm-up rows never flag."""
    import os
    import tempfile

    import numpy as np

    from kazu_ray.extras.windows import ANOM_MIN_PRIOR, q_events_anomaly

    n = 60
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n), unit="s"),
            "user_id": np.zeros(n, dtype=np.int64),
            # gentle noise so variance > 0, one huge spike at row 40
            "value": np.where(np.arange(n) == 40, 400.0,
                              10.0 + (np.arange(n) % 3) * 0.02),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "events.parquet"))
        res = (
            q_events_anomaly(d)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    flagged = res.loc[res["is_anomaly"], "event_id"].tolist()
    assert 40 in flagged
    assert all(e >= ANOM_MIN_PRIOR for e in flagged)
