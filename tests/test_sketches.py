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


# --- Count-Min sketch ------------------------------------------------------


def _cms_corpus(n_docs: int, vocab: int) -> "object":
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_id": range(n_docs),
            "text": [
                " ".join(f"tok{(i * 13 + j * j) % vocab}" for j in range(30))
                for i in range(n_docs)
            ],
        }
    )


def _cms_build(docs, nparts: int = 4, batches: int = 1):
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import cms_sketch_tokens

    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    if batches > 1:
        ds = ds.repartition(batches)
    return cms_sketch_tokens(ds, nparts=nparts)


def _cms_truth(docs) -> dict:
    import collections
    import re

    counts: collections.Counter = collections.Counter()
    for t in docs["text"]:
        counts.update(re.findall(r"[a-z0-9]+", t.lower()))
    return dict(counts)


def test_cms_register_sql_parity(ray_session):
    import duckdb

    from kazu_ray.extras.sketches import CMS_W, cms_oracle_sql

    docs = _cms_corpus(60, vocab=40)
    regs = _cms_build(docs)
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(cms_oracle_sql()).df()
    got = {
        int(d) * CMS_W + int(c): int(regs[d, c]) for d, c in zip(*regs.nonzero())
    }
    assert got == dict(zip(exp["cell"].astype(int), exp["cnt"].astype(int)))


def test_cms_lower_bound_and_exact_when_sparse(ray_session):
    from kazu_ray.extras.sketches import cms_estimate

    docs = _cms_corpus(80, vocab=50)
    regs = _cms_build(docs)
    truth = _cms_truth(docs)
    # structural guarantee: never undercounts; at vocab 50 << W the min
    # over CMS_D rows is exact for every token
    for tok, n in truth.items():
        est = cms_estimate(regs, tok)
        assert est >= n
        assert est == n


def test_cms_partition_and_batch_invariance(ray_session):
    docs = _cms_corpus(100, vocab=64)
    a = _cms_build(docs, nparts=2, batches=1)
    b = _cms_build(docs, nparts=7, batches=13)
    assert (a == b).all()


def test_cms_overcount_bounded_large_vocab(ray_session):
    import math

    from kazu_ray.extras.sketches import CMS_W, cms_estimate

    # vocab 3000 ~ 3x the width: collisions are certain per row, but the
    # min over rows keeps the overcount within the eps*N envelope
    docs = _cms_corpus(200, vocab=3000)
    regs = _cms_build(docs)
    truth = _cms_truth(docs)
    n_total = sum(truth.values())
    eps = math.e / CMS_W
    over = [cms_estimate(regs, t) - n for t, n in truth.items()]
    assert min(over) >= 0  # one-sided
    assert max(over) <= eps * n_total * 3  # loose multiple of the w.h.p. bound


# --- groupwise quantile sketch ---------------------------------------------


def test_group_quantiles_accuracy(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import group_quantile_sketch

    rng_vals = []
    rows = []
    for g in range(4):
        # heavy-tailed, different scale per group
        vals = [((i * 2654435761) % 10_000) ** (1 + 0.2 * g) / 100 for i in range(3000)]
        rng_vals.append(("grp%d" % g, np.array(vals, dtype=float)))
        rows.extend({"k": f"grp{g}", "x": v} for v in vals)
    docs = pd.DataFrame(rows)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(9)
    got = group_quantile_sketch(ds, "k", "x").to_pandas()
    assert set(got["k"]) == {f"grp{g}" for g in range(4)}
    for k_, vals in rng_vals:
        for q in (0.5, 0.9, 0.99):
            est = float(got[(got["k"] == k_) & (got["q"] == q)]["value"].iloc[0])
            exact = float(np.quantile(vals, q))
            assert abs(est - exact) / abs(exact) <= 0.01, (k_, q, est, exact)


def test_group_quantiles_exact_when_small(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import group_quantile_sketch

    # groups below k centroids: the sketch holds every value, estimates
    # use the midpoint-interpolation convention of quantiles()
    docs = pd.DataFrame(
        {"k": ["a"] * 100 + ["b"] * 50, "x": list(range(100)) + list(range(0, 500, 10))}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(1)
    got = group_quantile_sketch(ds, "k", "x", qs=(0.5,)).to_pandas()
    a50 = float(got[(got["k"] == "a")]["value"].iloc[0])
    assert abs(a50 - 49.5) <= 1.0
