"""The consolidated quality-gate query (approx_metrics): every
recall / equivalence / parity row must pass on the test corpus, and the
sessions-equivalence compare must stay distributed (signature-based)."""


def test_approx_metrics_all_pass(ray_session):
    from kazu_ray.extras.metrics import q_approx_metrics

    df = q_approx_metrics("/root/testdata/sf0.001")
    assert len(df) == 68
    assert set(df.columns) == {"metric", "value", "gate", "passes"}
    failing = df[~df["passes"]]
    assert failing.empty, failing.to_string()
    # the real-weights gates are present with perfect scores
    by = dict(zip(df["metric"], df["value"]))
    assert by["embedding_eval_precision"] == 1.0
    assert by["embedding_eval_recall"] == 1.0
    assert by["chem_exact_match_frac"] == 1.0
    # distributed k-means matches the driver reference exactly
    assert by["kmeans_assign_equal_frac"] == 1.0
    assert by["semdedup_invariants"] == 1.0


def test_gates_failing_zero_rows_and_oracle_schema(ray_session):
    # gates_failing is the driver-legible view of the gate surface:
    # zero rows when all gates pass, pinned by an explicit SQL oracle
    # with the same sorted column names.
    import duckdb

    from kazu_ray.extras.metrics import gates_failing_oracle_sql, q_gates_failing

    got = q_gates_failing("/root/testdata/sf0.001")
    exp = duckdb.sql(gates_failing_oracle_sql()).df()
    assert len(got) == len(exp) == 0
    assert sorted(got.columns) == sorted(exp.columns)


def test_gates_failing_surfaces_a_broken_gate(ray_session):
    # a deliberately-broken gate must appear in gates_failing (this is
    # what flips rows_match in the driver's CORRECTNESS file)
    import pandas as pd

    from kazu_ray.extras import metrics as M

    M.q_approx_metrics("/root/testdata/sf0.001")  # populate the memo
    key = "/root/testdata/sf0.001"
    saved = M._APPROX_CACHE[key]
    try:
        broken = saved.copy()
        broken.loc[broken.index[0], "passes"] = False
        M._APPROX_CACHE[key] = broken
        failing = M.q_gates_failing(key)
        assert len(failing) == 1
        assert not failing["passes"].iloc[0]
    finally:
        M._APPROX_CACHE[key] = saved


def test_approx_metrics_memo_returns_copies(ray_session):
    from kazu_ray.extras.metrics import q_approx_metrics

    a = q_approx_metrics("/root/testdata/sf0.001")
    a.loc[a.index[0], "passes"] = False  # caller mutation must not leak
    b = q_approx_metrics("/root/testdata/sf0.001")
    assert b["passes"].all()


def test_dataset_signature_order_insensitive(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.metrics import _dataset_signature

    rows = [{"a": i, "b": f"x{i}"} for i in range(100)]
    fwd = rd.from_arrow(pa.Table.from_pylist(rows))
    rev = rd.from_arrow(pa.Table.from_pylist(rows[::-1]))
    assert _dataset_signature(fwd, ["a", "b"]) == _dataset_signature(rev, ["a", "b"])
    # any single-row change shifts the signature
    rows[3] = {"a": 3, "b": "DIFFERENT"}
    diff = rd.from_arrow(pa.Table.from_pylist(rows))
    assert _dataset_signature(fwd, ["a", "b"]) != _dataset_signature(diff, ["a", "b"])
