"""Distributed logistic-regression quality classifier: fit equivalence
vs the driver-side numpy reference, learning gate, scoring path."""

import numpy as np
import pyarrow as pa

from kazu_ray.extras.lrfilter import (
    N_FEATURES,
    _features_labels_batch,
    _sigmoid,
    fit_logreg_reference,
)


def test_sigmoid_stable_and_correct():
    z = np.array([-1000.0, -5.0, 0.0, 5.0, 1000.0])
    p = _sigmoid(z)
    assert np.all((p >= 0) & (p <= 1)) and not np.any(np.isnan(p))
    assert abs(p[2] - 0.5) < 1e-15
    assert np.allclose(p, 1.0 / (1.0 + np.exp(-np.clip(z, -500, 500))))


def test_features_match_rule_label():
    """The in-batch label equals quality_filter_batch's keep decision."""
    import pyarrow.parquet as pq

    from kazu_ray.extras.quality import quality_filter_batch

    batch = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    feats = _features_labels_batch(batch)
    keep = quality_filter_batch(batch)
    assert feats.num_rows == keep.num_rows
    assert feats.column("label").to_pylist() == [
        1.0 if k else 0.0 for k in keep.column("keep").to_pylist()
    ]
    # fixed feature width, bias first, all finite
    assert feats.num_columns == N_FEATURES + 2
    x1 = np.array(feats.column("x1").to_pylist())
    assert np.all(np.isfinite(x1)) and feats.column("x0").to_pylist()[0] == 1.0


def test_reference_fit_learns_separable_rule():
    rng = np.random.default_rng(0)
    x = np.column_stack([np.ones(400), rng.uniform(-1, 1, (400, N_FEATURES - 1))])
    w_true = rng.normal(size=N_FEATURES)
    y = (x @ w_true > 0).astype(float)
    w = fit_logreg_reference(x, y, iters=200, lr=2.0, l2=1e-4)
    acc = np.mean(((x @ w) > 0) == (y > 0.5))
    assert acc >= 0.97


def test_distributed_fit_matches_reference(ray_session):
    import ray.data as rd

    from kazu_ray.extras.lrfilter import fit_logreg, q_lr_gate

    gate = q_lr_gate("/root/testdata/sf0.001").iloc[0]
    assert gate["passes"]
    assert gate["max_werr"] <= 1e-6
    assert gate["agreement"] >= 0.999 and gate["accuracy"] >= 0.9
    # determinism: two fits over the same frozen blocks agree bit-exactly
    from kazu_ray.extras.lrfilter import features_dataset

    feats = features_dataset("/root/testdata/sf0.001").materialize()
    w1, loss1 = fit_logreg(feats, iters=5)
    w2, loss2 = fit_logreg(feats, iters=5)
    assert np.array_equal(w1, w2) and loss1 == loss2


def test_scores_query(ray_session):
    from kazu_ray.extras.lrfilter import q_lr_quality_scores

    rows = q_lr_quality_scores("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    assert all(0.0 <= r["score"] <= 1.0 for r in rows)
    # classifier imitates the rule filter near-perfectly on train data
    agree = sum(r["pred"] == r["label"] for r in rows) / len(rows)
    assert agree >= 0.95
