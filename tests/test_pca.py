"""Distributed PCA: cross-engine covariance parity, driver-path
equivalence, partition invariance, variance-capture semantics and
degenerate shapes."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.pca import (
    covariance_matrix,
    fit_pca,
    q_pca_project,
    transform_pca,
)

SF = "/root/testdata/sf0.001"


def test_gate_passes(ray_session):
    from kazu_ray.extras.metrics import q_pca_gate

    m = q_pca_gate(SF).iloc[0]
    assert m["passes"], dict(m)


def test_partition_invariance(ray_session):
    ds1 = rd.read_parquet(f"{SF}/embeddings.parquet")
    ds9 = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(9)
    c1, c9 = covariance_matrix(ds1), covariance_matrix(ds9)
    assert np.abs(c1 - c9).max() <= 1e-12


def test_variance_capture_on_planted_subspace(ray_session):
    """Data living on a 2-D subspace + tiny noise: the top-2 components
    recover ~all the variance and the projection preserves pairwise
    distances."""
    rng = np.random.RandomState(7)
    basis = np.linalg.qr(rng.randn(16, 2))[0].T  # (2, 16) orthonormal
    coords = rng.randn(300, 2) * [5.0, 2.0]
    x = coords @ basis + rng.randn(300, 16) * 1e-6
    tab = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tab)
    mean, comps, evals, n = fit_pca(ds, k=4)
    assert n == 300
    assert evals[:2].sum() / evals.sum() > 0.999999
    out = transform_pca(ds, mean, comps, keep=["vec_id"]).to_pandas()
    out = out.sort_values("vec_id")
    proj = np.asarray(out["pca"].to_list())[:, :2]
    centered = x - x.mean(axis=0)
    d_orig = np.linalg.norm(centered[:50, None] - centered[None, :50], axis=2)
    d_proj = np.linalg.norm(proj[:50, None] - proj[None, :50], axis=2)
    assert np.abs(d_orig - d_proj).max() < 1e-3


def test_deterministic_sign_and_rounding(ray_session):
    a = q_pca_project(SF)
    b = q_pca_project(SF)
    assert a.equals(b)
    comps = fit_pca(rd.read_parquet(f"{SF}/embeddings.parquet"), k=8)[1]
    for row in comps:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_single_row_batches(ray_session):
    """Blocks of one row still produce exact moments (n-1 denominator
    only on the merged total, never per block)."""
    x = np.arange(12, dtype=np.float64).reshape(4, 3)
    tab = pa.table(
        {
            "vec_id": pa.array(range(4), pa.int64()),
            "embedding": pa.array(x.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tab).repartition(4)
    assert np.abs(covariance_matrix(ds) - np.cov(x, rowvar=False)).max() <= 1e-12
