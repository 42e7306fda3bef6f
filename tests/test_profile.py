"""Single-pass column profiling: SQL parity, null handling, typed
min/max merge, partition invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_profile_parity_on_orders(ray_session):
    from kazu_ray.extras.metrics import q_profile_parity

    m = q_profile_parity("/root/testdata/sf0.001").iloc[0]
    assert m["paths_equal"]
    assert m["n_columns"] == 4


def test_profile_nulls_and_typed_minmax(ray_session):
    import ray.data as rd

    from kazu_ray.extras.profile import profile_table

    # int column whose numeric min/max disagree with string order
    # (9 < 100 numerically, "100" < "9" lexicographically), plus nulls
    df = pd.DataFrame(
        {
            "k": pd.array([9, 100, 5000, None, 42], dtype="Int64"),
            "s": ["b", None, "a", "z", None],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    out = profile_table(ds, columns=["k", "s"]).set_index("column")
    assert out.loc["k", "n"] == 5 and out.loc["k", "n_null"] == 1
    assert out.loc["k", "min_str"] == "9" and out.loc["k", "max_str"] == "5000"
    assert out.loc["s", "n_null"] == 2
    assert out.loc["s", "min_str"] == "a" and out.loc["s", "max_str"] == "z"
    # distinct estimates exact at tiny cardinality
    assert abs(out.loc["k", "n_distinct_est"] - 4) < 0.1
    assert abs(out.loc["s", "n_distinct_est"] - 3) < 0.1


def test_profile_partition_invariance(ray_session):
    import ray.data as rd

    from kazu_ray.extras.profile import profile_table

    df = pd.DataFrame(
        {
            "k": np.arange(5000, dtype="int64") % 977,
            "s": [f"v{i % 313}" for i in range(5000)],
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    a = profile_table(rd.from_arrow(tbl).repartition(2), columns=["k", "s"])
    b = profile_table(rd.from_arrow(tbl).repartition(17), columns=["k", "s"])
    assert a.equals(b)
