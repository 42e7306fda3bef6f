"""SON frequent-pair mining (extras/itemsets.py): exact parity vs the
DuckDB self-join oracle (also covered by test_oracle_parity), the SON
candidate-superset guarantee under forced small blocks, and threshold
edge cases."""

import duckdb
import pandas as pd
import pytest

from kazu_ray.extras.itemsets import (
    frequent_pairs,
    frequent_pairs_oracle_sql,
    q_frequent_pairs,
)

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str, s_frac: float) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(frequent_pairs_oracle_sql(s_frac)).df()


@pytest.mark.parametrize("s_frac", [0.1, 0.3, 0.6])
def test_exact_at_multiple_thresholds(ray_session, s_frac):
    got = q_frequent_pairs(SF, s_frac).to_pandas().reset_index(drop=True)
    exp = _oracle(SF, s_frac)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_small_blocks_no_false_negatives(ray_session):
    """SON's theorem under adversarially tiny blocks: repartitioning
    into many small blocks (different local thresholds) must not lose
    any globally frequent pair — the result is identical."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(40)
    got = (
        frequent_pairs(ds, 0.3)
        .sort(["t1", "t2"])
        .to_pandas()
        .reset_index(drop=True)
    )
    exp = _oracle(SF, 0.3)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_threshold_one_doc_returns_all_pairs(ray_session):
    """s_frac small enough that one co-occurrence qualifies: the output
    is the complete exact pair-support table."""
    s = 1.0 / 10_000
    got = q_frequent_pairs(SF, s).to_pandas().reset_index(drop=True)
    exp = _oracle(SF, s)
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
