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


def test_heavy_hitters_guarantees(ray_session):
    """Misra-Gries sketch contract vs DuckDB exact token counts:
    estimates never exceed truth, undercount within the carried bound,
    every above-bound token reported, bound within the n/(k+1) theorem."""
    import duckdb
    import ray.data as rd

    from kazu_ray.extras.sketches import heavy_hitters_tokens

    docs = "/root/testdata/sf0.001/documents.parquet"
    k = 8  # corpus vocabulary is 31 tokens — k=8 forces reductions
    got = heavy_hitters_tokens(
        rd.read_parquet(docs, columns=["text"]).repartition(6), k=k, nparts=4
    )
    exact = dict(
        duckdb.sql(
            f"""
            SELECT token, COUNT(*) FROM (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM read_parquet('{docs}')) GROUP BY 1
            """
        ).fetchall()
    )
    n_tokens = sum(exact.values())
    err = int(got["err_bound"].iloc[0])
    assert 0 < err <= n_tokens // (k + 1)
    assert len(got) <= k
    for t, est in zip(got["token"], got["est_count"]):
        assert est <= exact[t], (t, est, exact[t])
        assert exact[t] - est <= err, (t, est, exact[t], err)
    reported = set(got["token"])
    for t, c in exact.items():
        if c > err:
            assert t in reported, (t, c, err)


def test_heavy_hitters_small_vocab(ray_session):
    """k >= vocabulary size → exact counts, zero error."""
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import heavy_hitters_tokens

    t = pa.table({"text": ["a a b", "b a c", "c a"]})
    got = heavy_hitters_tokens(rd.from_arrow(t), k=10, nparts=2)
    assert int(got["err_bound"].iloc[0]) == 0
    assert dict(zip(got["token"], got["est_count"])) == {"a": 4, "b": 2, "c": 2}
