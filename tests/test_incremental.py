"""Incremental aggregate maintenance (extras/incremental.py): the
signed delta merge must equal a direct recompute (also via
test_oracle_parity), zero-count tokens must VANISH from the state,
and an empty delta must be the identity."""

import duckdb
import pandas as pd
import pyarrow as pa

from kazu_ray.extras.incremental import (
    apply_delta,
    incremental_agg_oracle_sql,
    q_incremental_agg,
    token_counts,
)

SF = "/root/testdata/sf0.001"


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_pandas(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(2)


def test_oracle_parity(ray_session):
    got = q_incremental_agg(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(incremental_agg_oracle_sql()).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_zero_count_tokens_vanish(ray_session):
    base = _docs_ds([(1, "alpha beta"), (2, "alpha gamma")])
    removed = _docs_ds([(1, "alpha beta")])
    added = _docs_ds([(3, "gamma gamma")])
    state0 = token_counts(base).map_batches(
        lambda t: t.cast(pa.schema([("tok", pa.string()), ("cnt", pa.int64())])),
        batch_format="pyarrow",
    )
    out = (
        apply_delta(state0, added, removed)
        .sort("tok")
        .to_pandas()
        .reset_index(drop=True)
    )
    by = dict(zip(out["tok"], out["cnt"]))
    # beta's count reached zero -> NO row, not a zero row
    assert "beta" not in by
    assert by == {"alpha": 1, "gamma": 3}


def test_empty_delta_is_identity(ray_session):
    base = _docs_ds([(1, "x y y"), (2, "z")])
    empty = _docs_ds([]).filter(lambda r: True)
    state0 = token_counts(base).map_batches(
        lambda t: t.cast(pa.schema([("tok", pa.string()), ("cnt", pa.int64())])),
        batch_format="pyarrow",
    )
    out = (
        apply_delta(state0, empty, empty)
        .sort("tok")
        .to_pandas()
        .reset_index(drop=True)
    )
    assert dict(zip(out["tok"], out["cnt"])) == {"x": 1, "y": 2, "z": 1}


def test_snapshot_diff_feeds_apply_delta(ray_session):
    """End-to-end incremental reprocess: snapshot_diff DETECTS the
    delta between two corpus versions, apply_delta CONSUMES it —
    removed/changed-old rows retract, added/changed-new rows insert —
    and the maintained state equals a direct recompute over v2."""
    import ray.data as rd

    from kazu_ray.extras.snapshot import snapshot_diff

    v1_rows = [(1, "alpha beta"), (2, "gamma gamma"), (3, "delta")]
    v2_rows = [(2, "gamma epsilon"), (3, "delta"), (4, "zeta alpha")]
    v1 = _docs_ds(v1_rows)
    v2 = _docs_ds(v2_rows)

    diff = snapshot_diff(v1, v2).to_pandas()
    status = dict(zip(diff["doc_id"], diff["status"]))
    assert status == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}

    retract_ids = {d for d, s in status.items() if s in ("removed", "changed")}
    insert_ids = {d for d, s in status.items() if s in ("added", "changed")}
    removed = _docs_ds([r for r in v1_rows if r[0] in retract_ids])
    added = _docs_ds([r for r in v2_rows if r[0] in insert_ids])

    state0 = token_counts(v1).map_batches(
        lambda t: t.cast(pa.schema([("tok", pa.string()), ("cnt", pa.int64())])),
        batch_format="pyarrow",
    )
    got = (
        apply_delta(state0, added, removed)
        .sort("tok")
        .to_pandas()
        .reset_index(drop=True)
    )
    direct = (
        token_counts(_docs_ds(v2_rows))
        .sort("tok")
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, direct.astype({"cnt": "int64"}), check_dtype=False
    )
