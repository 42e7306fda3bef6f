"""Cohen's kappa inter-annotator agreement: hand-computed fixture,
combiner invariance, and exact DuckDB oracle parity."""

import duckdb
import pandas as pd
import pyarrow as pa

from kazu_ray.extras.agreement import (
    LABELS,
    agreement_oracle_sql,
    confusion_counts,
    q_annotator_agreement,
)


def test_kappa_hand_computed(ray_session):
    """2-class textbook case embedded in the 3-label rule: craft rows
    whose derived labels give a known matrix, then check po/pe/kappa
    against the closed-form numbers."""
    import ray.data as rd

    # n_chars 100 -> short, 300 -> mid; doc_id % 7 == 0 shifts B by one
    rows = (
        [{"doc_id": 1, "n_chars": 100}] * 6   # (short, short)
        + [{"doc_id": 7, "n_chars": 100}] * 2  # (short, mid)  shifted
        + [{"doc_id": 2, "n_chars": 300}] * 8  # (mid, mid)
        + [{"doc_id": 14, "n_chars": 300}] * 4  # (mid, long) shifted
    )
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    cells = confusion_counts(ds).to_pandas().set_index(["label_a", "label_b"])
    assert int(cells.loc[("short", "short"), "n"]) == 6
    assert int(cells.loc[("short", "mid"), "n"]) == 2
    assert int(cells.loc[("mid", "mid"), "n"]) == 8
    assert int(cells.loc[("mid", "long"), "n"]) == 4
    n = 20
    po = (6 + 8) / n
    pe = (8 * 6 + 12 * 10 + 0 * 4) / (n * n)  # row x col marginals
    kappa = (po - pe) / (1 - pe)
    assert po == 0.7 and pe == 0.42
    assert abs(kappa - 0.28 / 0.58) < 1e-12
    assert abs(kappa - 0.4827586206896552) < 1e-12


def test_confusion_combiner_invariance(ray_session):
    """Counts are independent of block layout (the combiner identity)."""
    import ray.data as rd

    rows = [{"doc_id": i, "n_chars": (i * 37) % 600} for i in range(200)]
    one = rd.from_arrow(pa.Table.from_pylist(rows))
    many = one.repartition(13)
    a = confusion_counts(one).to_pandas().sort_values(["label_a", "label_b"])
    b = confusion_counts(many).to_pandas().sort_values(["label_a", "label_b"])
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_agreement_oracle_parity(ray_session):
    sf = "/root/testdata/sf0.001"
    got = q_annotator_agreement(sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = con.execute(agreement_oracle_sql()).df()
    assert got[exp.columns.tolist()].astype(str).equals(exp.astype(str))
    k = got["kappa"].iloc[0]
    assert 0.0 < k < 1.0  # deliberate partial agreement
    assert set(got.label_a) <= set(LABELS)
