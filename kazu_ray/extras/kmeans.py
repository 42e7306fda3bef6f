"""Distributed spherical k-means and SemDeDup-style semantic dedup.

The reference has no corpus-clustering operator (its embedding use is
per-mention candidate scoring, utils/sapbert.py); this module adds the
two clustering operators a 100-TB training-data pipeline needs:

* ``kmeans_fit`` — Lloyd's iterations where the per-point work
  (assignment + per-cluster partial sums) streams through
  ``map_batches`` and only a k x dim float64 partial per *block*
  reaches the driver.  Nothing driver-side scales with the corpus;
  each iteration is one streaming pass over the (column-pruned)
  embeddings read.
* ``semdedup`` — SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
  cluster the corpus, then inside each cluster drop every point whose
  cosine similarity to an already-kept point exceeds ``eps``, keeping
  the point *farthest from the centroid* first (the paper's
  best-performing keep rule).  The O(n^2) similarity matrix is
  per-cluster, so k is chosen to bound cluster size (the paper uses
  k = 50k on LAION; scale k with the corpus and the bound holds).

Determinism: seeding takes the k lowest ``vec_id`` rows (a bounded
per-batch bottom-k merge, invariant to partitioning), iteration
partials are float64 and summed in block order, and the greedy keep
order inside a cluster is (centroid_sim asc, vec_id asc) — so the
whole path is reproducible at any parallelism, which
``q_kmeans_equivalence`` checks against a single-matrix driver
reference each round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _batch_matrix, _normalize

__all__ = [
    "kmeans_fit",
    "assign_clusters",
    "semdedup",
    "q_kmeans_clusters",
    "q_semdedup",
    "q_kmeans_equivalence",
]


def _embeddings_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _seed_centroids(ds, k: int) -> np.ndarray:
    """k seed rows = the k lowest vec_ids, found with a per-batch
    bottom-k partial (<= k rows leave each block) and a bounded driver
    merge — deterministic under any partitioning of the input."""

    def bottom_k(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        order = np.argsort(ids)[:k]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(ids[order]),
                "embedding": pa.array(list(mat[order]), type=pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(bottom_k, batch_format="pyarrow").take_all()
    parts.sort(key=lambda r: r["vec_id"])
    seeds = parts[:k]
    mat = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in seeds])
    return _normalize(mat)


def kmeans_fit(
    ds,
    k: int = 8,
    iters: int = 10,
    tol: float = 1e-9,
) -> np.ndarray:
    """Distributed spherical k-means over a (vec_id, embedding) dataset.

    Per iteration: broadcast the (tiny) centroid matrix once via
    ``ray.put``, stream one assignment pass, reduce one (k, dim)
    float64 sum + (k,) count partial per block on the driver.  Empty
    clusters retain their previous centroid.  Stops early when the max
    centroid movement drops below ``tol``.

    Scale note: each iteration re-reads the pruned parquet columns
    (streaming, spill-safe) rather than materializing the corpus in the
    object store; with 100 TB of embeddings you either afford the
    passes (they pipeline at read bandwidth) or fit on a bounded sample
    as ``build_ivf_index`` does — both paths exist in this repo.
    """
    import ray

    centroids = _seed_centroids(ds, k)
    k_eff, dim = centroids.shape

    for _ in range(iters):
        cent_ref = ray.put(centroids)

        def partial(t: pa.Table) -> pa.Table:
            cents = ray.get(cent_ref)
            _, mat = _batch_matrix(t)
            assign = np.argmax(mat @ cents.T, axis=1)
            sums = np.zeros((len(cents), mat.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=len(cents)).astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "sums": pa.array([sums.ravel()], type=pa.list_(pa.float64())),
                    "counts": pa.array([counts], type=pa.list_(pa.int64())),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros((k_eff, dim), dtype=np.float64)
        counts = np.zeros(k_eff, dtype=np.int64)
        for r in rows:
            sums += np.asarray(r["sums"], dtype=np.float64).reshape(k_eff, dim)
            counts += np.asarray(r["counts"], dtype=np.int64)
        new = centroids.copy()
        nonempty = counts > 0
        new[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
        movement = float(np.max(np.linalg.norm(new - centroids, axis=1)))
        centroids = new
        if movement < tol:
            break
    return centroids


def assign_clusters(ds, centroids: np.ndarray, keep_embedding: bool = False):
    """Streaming argmax assignment against a broadcast centroid matrix.

    Emits (vec_id, cluster, centroid_sim[, embedding])."""
    import ray

    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _batch_matrix(t)
        sims = mat @ cents.T
        cluster = np.argmax(sims, axis=1)
        out = {
            "vec_id": pa.array(ids),
            "cluster": pa.array(cluster.astype(np.int64)),
            "centroid_sim": pa.array(sims[np.arange(len(ids)), cluster]),
        }
        if keep_embedding:
            out["embedding"] = pa.array(
                list(mat), type=pa.list_(pa.float64())
            )
        return pa.Table.from_pydict(out)

    return ds.map_batches(assign, batch_format="pyarrow")


def _dedup_group(t: pa.Table, eps: float) -> pa.Table:
    """SemDeDup keep rule inside one cluster: visit points farthest
    from the centroid first (ties by vec_id), keep a point iff its max
    cosine to every already-kept point is below ``eps``."""
    ids = t.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
    sims = t.column("centroid_sim").combine_chunks().to_numpy(zero_copy_only=False)
    cluster = t.column("cluster").combine_chunks().to_numpy(zero_copy_only=False)
    col = t.column("embedding").combine_chunks()
    mat = col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), -1)

    order = np.lexsort((ids, sims))  # centroid_sim asc (farthest first), vec_id asc
    gram = mat[order] @ mat[order].T
    kept_idx: list[int] = []
    kept = np.zeros(len(ids), dtype=bool)
    for pos in range(len(order)):
        if not kept_idx or float(np.max(gram[pos, kept_idx])) < eps:
            kept_idx.append(pos)
            kept[order[pos]] = True
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array(ids),
            "cluster": pa.array(cluster),
            "centroid_sim": pa.array(np.round(sims, 9)),
            "kept": pa.array(kept),
        }
    )


def semdedup(ds, k: int = 8, eps: float = 0.97, centroids: np.ndarray | None = None):
    """Cluster + within-cluster near-duplicate pruning. Returns a
    (vec_id, cluster, centroid_sim, kept) dataset covering every input
    row; filter ``kept`` for the deduplicated corpus.

    The shuffle is one groupby on the cluster id — the partitioning key
    the whole operator family shares — and each group's O(n^2) gram
    matrix is bounded by construction (choose k ~ corpus_size /
    target_cluster_size)."""
    if centroids is None:
        centroids = kmeans_fit(ds, k=k)
    assigned = assign_clusters(ds, centroids, keep_embedding=True)
    return assigned.groupby("cluster").map_groups(
        lambda t: _dedup_group(t, eps), batch_format="pyarrow"
    )


def q_kmeans_clusters(sf_dir: str, k: int = 8):
    """Cluster id + cosine-to-centroid for every embedding row
    (iterative — no SQL oracle; gated by kmeans_equivalence in
    approx_metrics)."""
    ds = _embeddings_ds(sf_dir)
    centroids = kmeans_fit(ds, k=k)
    out = assign_clusters(ds, centroids)

    def round_sim(t: pa.Table) -> pa.Table:
        sims = t.column("centroid_sim").combine_chunks().to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("centroid_sim"),
            "centroid_sim",
            pa.array(np.round(sims, 9)),
        )

    return out.map_batches(round_sim, batch_format="pyarrow").sort("vec_id")


def q_semdedup(sf_dir: str, k: int = 8, eps: float = 0.3):
    """SemDeDup keep/drop decision per embedding row.

    The benchmark embeddings are isotropic random (max pairwise cosine
    ~0.51), so the paper's eps≈0.95+ would trivially keep everything;
    the query runs at eps=0.3 to exercise both branches of the keep
    rule on this corpus.  Real corpora use the paper's range."""
    return semdedup(_embeddings_ds(sf_dir), k=k, eps=eps).sort("vec_id")


def _reference_kmeans(
    mat: np.ndarray, ids: np.ndarray, k: int, iters: int, tol: float
) -> tuple[np.ndarray, np.ndarray]:
    """Single-matrix driver reference for the equivalence gate —
    independent implementation of the same seeding + update rule."""
    order = np.argsort(ids)
    centroids = _normalize(mat[order[:k]].copy())
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        new = centroids.copy()
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
                new[c] /= max(np.linalg.norm(new[c]), 1e-12)
        movement = float(np.max(np.linalg.norm(new - centroids, axis=1)))
        centroids = new
        if movement < tol:
            break
    return centroids, np.argmax(mat @ centroids.T, axis=1)


def q_kmeans_equivalence(sf_dir: str, k: int = 8):
    """Distributed-vs-driver k-means equivalence plus SemDeDup
    invariants, as a one-row metric frame (verification query: the
    exact side materializes the bounded test embeddings table)."""
    import pandas as pd
    import pyarrow.parquet as pq

    ds = _embeddings_ds(sf_dir)
    centroids = kmeans_fit(ds, k=k)
    assigned = {r["vec_id"]: r["cluster"] for r in assign_clusters(ds, centroids).take_all()}

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids, mat = _batch_matrix(tbl)
    ref_cents, ref_assign = _reference_kmeans(mat, ids, k, iters=10, tol=1e-9)
    ref = dict(zip(ids.tolist(), ref_assign.tolist()))

    same = sum(1 for i, c in assigned.items() if ref.get(i) == c)
    assign_frac = same / max(1, len(assigned))
    cent_err = float(np.max(np.abs(centroids - ref_cents)))

    eps = 0.3  # matches q_semdedup: both keep/drop branches fire on this corpus
    rows = semdedup(ds, k=k, eps=eps, centroids=centroids).take_all()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    id_to_vec = dict(zip(ids.tolist(), mat))
    kept_ok = True
    dropped_ok = True
    for members in by_cluster.values():
        kept_vecs = np.asarray([id_to_vec[r["vec_id"]] for r in members if r["kept"]])
        for r in members:
            s = kept_vecs @ id_to_vec[r["vec_id"]]
            if r["kept"]:
                # no kept pair may be eps-close (exclude self-similarity)
                if len(kept_vecs) > 1 and float(np.sort(s)[-2]) >= eps:
                    kept_ok = False
            elif float(np.max(s)) < eps:
                dropped_ok = False  # dropped rows need a kept witness

    return pd.DataFrame(
        {
            "assign_equal_frac": [round(assign_frac, 6)],
            "centroid_max_err": [cent_err],
            "semdedup_kept_ok": [kept_ok],
            "semdedup_dropped_ok": [dropped_ok],
            "gate": [1.0],
            "passes": [
                bool(assign_frac == 1.0 and cent_err < 1e-9 and kept_ok and dropped_ok)
            ],
        }
    )
