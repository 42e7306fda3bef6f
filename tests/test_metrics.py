"""The consolidated quality-gate query (approx_metrics): every
recall / equivalence / parity row must pass on the test corpus, and the
sessions-equivalence compare must stay distributed (signature-based)."""


def test_approx_metrics_all_pass(ray_session):
    from kazu_ray.extras.metrics import q_approx_metrics

    df = q_approx_metrics("/root/testdata/sf0.001")
    assert len(df) == 48
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
