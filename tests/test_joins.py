"""Tests for the partition-wise hash_join helper (kazu_ray/joins.py)."""

import pyarrow as pa

from kazu_ray.joins import hash_join


def _sorted(rows, keys):
    return sorted(rows, key=lambda r: tuple((r[k] is None, r[k]) for k in keys))


def test_inner_join(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 3], "lv": [10, 20, 30, 31]}))
    right = rd.from_arrow(pa.table({"rk": [2, 3, 4], "rv": [200, 300, 400]}))
    out = hash_join(left, right, left_on="k", right_on="rk", how="inner", num_partitions=4)
    rows = _sorted(out.take_all(), ["k", "lv"])
    assert rows == [
        {"k": 2, "lv": 20, "rv": 200},
        {"k": 3, "lv": 30, "rv": 300},
        {"k": 3, "lv": 31, "rv": 300},
    ]


def test_left_outer_join(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1, 2], "lv": [10, 20]}))
    right = rd.from_arrow(pa.table({"rk": [2], "rv": [200]}))
    out = hash_join(left, right, left_on="k", right_on="rk", how="left_outer", num_partitions=4)
    rows = _sorted(out.take_all(), ["k"])
    assert rows == [{"k": 1, "lv": 10, "rv": None}, {"k": 2, "lv": 20, "rv": 200}]


def test_semi_and_anti(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"rk": [2, 2, 3], "rv": [0, 0, 0]}))
    semi = hash_join(left, right, left_on="k", right_on="rk", how="left_semi", num_partitions=2)
    assert _sorted(semi.take_all(), ["k"]) == [{"k": 2, "lv": 20}, {"k": 3, "lv": 30}]
    anti = hash_join(left, right, left_on="k", right_on="rk", how="left_anti", num_partitions=2)
    assert anti.take_all() == [{"k": 1, "lv": 10}]


def test_join_survives_empty_blocks(ray_session):
    """The reason this helper exists: native Dataset.join breaks when the
    first shuffled block of an input is empty (schema broadcast skipped).
    hash_join must be insensitive to empty blocks / empty partitions."""
    import ray.data as rd

    empty = pa.table({"k": pa.array([], pa.int64()), "lv": pa.array([], pa.int64())})
    data = pa.table({"k": [7], "lv": [70]})
    left = rd.from_arrow(empty).union(rd.from_arrow(data))
    right = rd.from_arrow(pa.table({"rk": [7], "rv": [700]}))
    out = hash_join(
        left,
        right,
        left_on="k",
        right_on="rk",
        how="inner",
        num_partitions=16,  # >> rows: most partitions empty
        left_schema=empty.schema,
    )
    assert out.take_all() == [{"k": 7, "lv": 70, "rv": 700}]


def test_collision_raises(ray_session):
    import pytest
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    right = rd.from_arrow(pa.table({"rk": [1], "v": [2]}))
    with pytest.raises(ValueError, match="collide"):
        hash_join(left, right, left_on="k", right_on="rk")


# --- full outer join -------------------------------------------------------


def test_full_outer_join_hand_fixture(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.joins import hash_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "lv": pa.array([10, 20, 30], pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"rk": pa.array([2, 3, 4], pa.int64()), "rv": pa.array([200, 300, 400], pa.int64())})
    )
    out = (
        hash_join(left, right, left_on="k", right_on="rk", how="full_outer", num_partitions=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].fillna(-1).tolist() == [10, 20, 30, -1]
    assert out["rv"].fillna(-1).tolist() == [-1, 200, 300, 400]


def test_full_outer_join_query_parity(ray_session):
    from kazu_ray.extras.metrics import q_fo_join_parity

    m = q_fo_join_parity("/root/testdata/sf0.001").iloc[0]
    assert m["paths_equal"]
    assert m["n_left_only"] > 0 and m["n_right_only"] > 0
