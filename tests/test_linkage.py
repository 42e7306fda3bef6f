"""FastSS similarity self-join (extras/linkage.py): the exact
distance-1 checker, all three match geometries (substitution,
insertion, identity-key collision), false-candidate rejection, and
row-for-row DuckDB levenshtein parity."""

import duckdb
import pandas as pd
import pytest

from kazu_ray.extras.linkage import (
    _lev_le1,
    name_matches_oracle_sql,
    q_name_matches,
    similarity_self_join,
)

SF = "/root/testdata/sf0.001"


def test_lev_le1_cases():
    assert _lev_le1("abc", "abc") == 0
    assert _lev_le1("abc", "abd") == 1  # substitution
    assert _lev_le1("abc", "abcd") == 1  # insertion at end
    assert _lev_le1("abc", "xabc") == 1  # insertion at front
    assert _lev_le1("abc", "ac") == 1  # deletion
    assert _lev_le1("abc", "abde") is None  # distance 2, same length shift
    assert _lev_le1("xy", "yx") is None  # transposition = distance 2
    assert _lev_le1("abc", "abcde") is None  # length gap 2


def _run_join(names, ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"name": names})).repartition(4)
    return (
        similarity_self_join(ds)
        .sort(["name_a", "name_b"])
        .to_pandas()
        .reset_index(drop=True)
    )


def test_all_match_geometries(ray_session):
    got = _run_join(
        ["red bolt", "rad bolt", "red bolts", "green gear", "xy", "yx"],
        ray_session,
    )
    pairs = set(zip(got["name_a"], got["name_b"]))
    assert ("rad bolt", "red bolt") in pairs  # substitution
    assert ("red bolt", "red bolts") in pairs  # insertion
    # the transposition pair shares deletion variants but must be
    # rejected by verification (true distance 2)
    assert ("xy", "yx") not in pairs
    assert len(pairs) == 2
    assert (got["dist"] == 1).all()


def test_oracle_parity(ray_session):
    got = q_name_matches(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')"
    )
    exp = con.execute(name_matches_oracle_sql()).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
