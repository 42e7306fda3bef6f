"""Distributed PCA over an embedding column.

The dimensionality-reduction stage a 100-TB embedding pipeline runs
before ANN indexing / clustering (reduce d, whiten, drop noise axes).
Classic two-phase method-of-moments shape:

1. FIT — one streaming pass emits per-batch moment PARTIALS: row count,
   sum vector (d,) and raw second-moment matrix X^T X (d, d), each batch
   contributing exactly ONE row of fixed size O(d^2) regardless of batch
   row count (the dsir/HLL fixed-size-partial trick; d=64 -> 33 KB/row).
   Partials are summed by a single tiny aggregation — moments are exact
   associative sums, so block boundaries cannot change the result beyond
   float summation order (gated at 1e-9 and round(6) below).  The
   covariance (S - n*mu*mu^T) / (n-1) and its eigendecomposition happen
   on the driver on a d x d matrix — bounded by construction.
2. TRANSFORM — components are broadcast once via ``ray.put``; projection
   is one embarrassingly parallel ``map_batches`` numpy matmul.

Sign convention: each component is flipped so its largest-|coordinate|
entry is positive, making the transform deterministic across runs and
engines (eigenvectors are defined up to sign).

Correctness gates (pca_* rows of approx_metrics):
- the DISTRIBUTED covariance matrix matches DuckDB computing every
  Cov[i, j] from the same parquet (unnest + sum of products) to
  <= 1e-9 max abs err — a true cross-engine oracle for the
  distributed pass (exact equality is impossible across engines:
  float64 summation order differs);
- the distributed-fit projection matches a driver-side numpy PCA on the
  materialized matrix to <= 1e-6 elementwise (path equivalence);
- reconstruction: explained variance ratios sum consistent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _matrix(t: pa.Table, col: str) -> np.ndarray:
    """Zero-copy list<float> column -> (n, d) float64 matrix (the
    similarity.py idiom)."""
    c = t.column(col).combine_chunks()
    flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(c), -1) if len(c) else flat.reshape(0, 0)


def _moment_partials(t: pa.Table, col: str) -> pa.Table:
    """One batch -> one (n, sum, outer) moment row (flattened)."""
    x = _matrix(t, col)
    if x.size == 0:
        return pa.table(
            {
                "n": pa.array([0], pa.int64()),
                "s": pa.array([[]], pa.list_(pa.float64())),
                "ss": pa.array([[]], pa.list_(pa.float64())),
            }
        )
    return pa.table(
        {
            "n": pa.array([x.shape[0]], pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "ss": pa.array([(x.T @ x).ravel().tolist()], pa.list_(pa.float64())),
        }
    )


def fit_pca(ds, col: str = "embedding", k: int = 8):
    """Streaming moment pass -> (mean (d,), components (k, d),
    explained_variance (k,), n)."""
    rows = ds.map_batches(
        _moment_partials, fn_kwargs={"col": col}, batch_format="pyarrow"
    ).take_all()  # bounded: one O(d^2) row per block
    rows = [r for r in rows if r["n"] > 0]
    n = sum(int(r["n"]) for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d, dtype=np.float64)
    ss = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        s += np.asarray(r["s"], dtype=np.float64)
        ss += np.asarray(r["ss"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals[order], n


def covariance_matrix(ds, col: str = "embedding") -> np.ndarray:
    """The distributed covariance alone (for the SQL parity gate)."""
    rows = ds.map_batches(
        _moment_partials, fn_kwargs={"col": col}, batch_format="pyarrow"
    ).take_all()
    rows = [r for r in rows if r["n"] > 0]
    n = sum(int(r["n"]) for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d, dtype=np.float64)
    ss = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        s += np.asarray(r["s"], dtype=np.float64)
        ss += np.asarray(r["ss"], dtype=np.float64).reshape(d, d)
    mean = s / n
    return (ss - n * np.outer(mean, mean)) / (n - 1)


def transform_pca(ds, mean: np.ndarray, comps: np.ndarray,
                  col: str = "embedding", out: str = "pca",
                  keep: list[str] | None = None):
    """Broadcast (mean, components) once; project each batch with one
    numpy matmul."""
    import ray

    ref = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        m, c = ray.get(ref)
        x = _matrix(t, col)
        proj = (x - m) @ c.T if x.size else np.zeros((0, c.shape[0]))
        cols = {k2: t.column(k2) for k2 in (keep or [f for f in t.column_names if f != col])}
        cols[out] = pa.array(proj.tolist(), pa.list_(pa.float64()))
        return pa.table(cols)

    return ds.map_batches(project, batch_format="pyarrow")


def cov_oracle_sql(d: int) -> str:
    """Every covariance entry from the same parquet as one DuckDB query:
    Cov[i,j] = (sum(x_i * x_j) - n * mean_i * mean_j) / (n - 1), rows
    (i, j, cov) over the upper triangle."""
    return f"""
WITH ex AS (
  SELECT vec_id, i - 1 AS i, CAST(x AS DOUBLE) AS x
  FROM (SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
),
n AS (SELECT count(DISTINCT vec_id) AS n FROM ex),
mu AS (SELECT i, sum(x) / (SELECT n FROM n) AS m FROM ex GROUP BY i),
xp AS (
  SELECT a.i AS i, b.i AS j, sum(a.x * b.x) AS sxy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
  WHERE a.i <= b.i
  GROUP BY a.i, b.i
)
SELECT xp.i, xp.j,
       (sxy - (SELECT n FROM n) * m1.m * m2.m)
       / ((SELECT n FROM n) - 1) AS cov
FROM xp JOIN mu m1 ON xp.i = m1.i JOIN mu m2 ON xp.j = m2.i
ORDER BY xp.i, xp.j
"""


def q_pca_project(sf_dir: str, k: int = 8):
    """Query surface: PCA-projected embeddings (vec_id, label, pca[k]);
    cross-engine covariance parity + path equivalence are the pca_*
    rows of approx_metrics."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label", "embedding"]
    )
    mean, comps, _, _ = fit_pca(ds, k=k)
    rows = (
        transform_pca(ds, mean, comps, keep=["vec_id", "label"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    rows["pca"] = rows["pca"].map(lambda v: [round(float(x), 6) for x in v])
    return pd.DataFrame(rows)
