"""Exact distributed order statistics: PERCENTILE_DISC semantics,
duplicate-heavy short-circuit, constant columns, numpy ground truth."""

import numpy as np
import pyarrow as pa

from kazu_ray.extras.exact_quantiles import exact_percentiles


def _disc(values: np.ndarray, p: float) -> float:
    """PERCENTILE_DISC ground truth: smallest value whose cumulative
    frequency reaches p (the ceil(p*n)-th order statistic)."""
    s = np.sort(values)
    return float(s[max(1, int(np.ceil(p * len(s)))) - 1])


def _ds(values: np.ndarray):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"v": pa.array(values, pa.float64())})
    ).repartition(8)


def test_matches_numpy_disc_semantics(ray_session):
    rng = np.random.default_rng(3)
    vals = np.round(rng.lognormal(3, 1, 5000), 2)
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.1, 0.5, 0.9, 0.99))
    for _, row in got.iterrows():
        assert row["value"] == _disc(vals, row["p"]), row["p"]
        assert row["value"] in vals  # DISC returns a member of the input


def test_duplicate_heavy_short_circuit(ray_session):
    """90% of rows share one value: the median's bucket is a single
    repeated value and resolves WITHOUT pulling rows."""
    rng = np.random.default_rng(4)
    vals = np.concatenate([np.full(9000, 42.5), rng.uniform(0, 100, 1000)])
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.5,))
    assert got["value"].iloc[0] == 42.5 == _disc(vals, 0.5)


def test_constant_column(ray_session):
    vals = np.full(1000, 7.25)
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.5, 0.99))
    assert (got["value"] == 7.25).all()


def test_tiny_input_ranks(ray_session):
    vals = np.array([10.0, 20.0, 30.0, 40.0])
    got = exact_percentiles(_ds(vals).materialize(), "v", ps=(0.25, 0.5, 0.75, 1.0))
    assert got["value"].tolist() == [10.0, 20.0, 30.0, 40.0]
