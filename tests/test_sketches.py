"""Mergeable quantile sketch (extras/sketches.py)."""

import numpy as np

from kazu_ray.extras.sketches import compress, quantile_sketch, quantiles


def test_compress_preserves_extremes_and_weight():
    rng = np.random.default_rng(0)
    vals = rng.lognormal(3, 1, size=50_000)
    v, w = compress(vals, k=256)
    assert len(v) <= 256
    assert v[0] == vals.min() and v[-1] == vals.max()
    assert abs(w.sum() - len(vals)) < 1e-6


def test_quantiles_small_input_exact():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    v, w = compress(vals, k=512)  # no compression path
    q = quantiles(v, w, [0.5])
    assert abs(q[0] - 3.0) < 1e-9


def test_merge_accuracy_multiple_distributions():
    rng = np.random.default_rng(7)
    for vals in (
        rng.uniform(0, 1, 100_000),
        rng.lognormal(0, 2, 100_000),       # heavy tail
        np.repeat([1.0, 2.0, 3.0], 30_000),  # discrete masses
    ):
        # simulate batch-wise sketching + a merge level
        parts = np.array_split(vals, 37)
        cs = [compress(p, k=512) for p in parts]
        mv = np.concatenate([c[0] for c in cs])
        mw = np.concatenate([c[1] for c in cs])
        mv, mw = compress(mv, mw, k=512)
        spread = float(vals.max() - vals.min())
        for q in (0.1, 0.5, 0.9, 0.99):
            approx = quantiles(mv, mw, [q])[0]
            exact = float(np.quantile(vals, q))
            # rank-near-q OR value-near-exact: under heavy ties the rank
            # of the (correct) value jumps, so either criterion passes
            rank = float((vals <= approx).mean())
            ok = abs(rank - q) < 0.02 or abs(approx - exact) <= 0.01 * spread
            assert ok, (q, approx, exact, rank)


def test_end_to_end_gate(ray_session):
    from kazu_ray.extras.sketches import q_quantile_accuracy

    df = q_quantile_accuracy("/root/testdata/sf0.001")
    assert bool(df["passes"].iloc[0]), df.to_dict()
