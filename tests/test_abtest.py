"""A/B readout: hand-computed z fixture and exact DuckDB oracle
parity."""

import duckdb
import pyarrow as pa

from kazu_ray.extras.abtest import ab_test_oracle_sql, q_ab_test


def test_ab_hand_computed(ray_session, tmp_path):
    """4 users: A = {0: converts, 2: no}, B = {1: converts, 3: converts}.
    cvr_a = 0.5, cvr_b = 1.0, pooled p = 0.75,
    z = -0.5 / sqrt(0.75*0.25*(0.5+0.5)) = -1.154701."""
    import math

    from datetime import datetime as dt

    t0, t1 = dt(2024, 1, 1), dt(2024, 1, 2)
    rows = [
        # user 0: two events at the SAME ts — event_id breaks the tie
        {"user_id": 0, "event_type": "purchase", "ts": t0, "event_id": 1},
        {"user_id": 0, "event_type": "view", "ts": t0, "event_id": 2},
        # user 2: purchased LATER, but the first event is a view
        {"user_id": 2, "event_type": "view", "ts": t0, "event_id": 3},
        {"user_id": 2, "event_type": "purchase", "ts": t1, "event_id": 4},
        {"user_id": 1, "event_type": "purchase", "ts": t0, "event_id": 5},
        {"user_id": 3, "event_type": "purchase", "ts": t0, "event_id": 6},
    ]
    p = tmp_path / "events.parquet"
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows), str(p))
    out = q_ab_test(str(tmp_path)).iloc[0]
    assert (out.n_a, out.n_b, out.conv_a, out.conv_b) == (2, 2, 1, 2)
    assert out.cvr_a == 0.5 and out.cvr_b == 1.0 and out.lift == -0.5
    exp_z = -0.5 / math.sqrt(0.75 * 0.25 * 1.0)
    assert abs(out.z - round(exp_z, 6)) < 1e-12


def test_ab_oracle_parity(ray_session):
    sf = "/root/testdata/sf0.001"
    got = q_ab_test(sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * "
        f"FROM read_parquet('{sf}/events.parquet')"
    )
    exp = con.execute(ab_test_oracle_sql()).df()
    assert got[exp.columns.tolist()].astype(str).equals(exp.astype(str))
    assert got.n_a.iloc[0] > 0 and got.n_b.iloc[0] > 0
