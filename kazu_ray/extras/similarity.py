"""Similarity search over the ``embeddings`` table.

- ``q_ann_topk``: brute-force cosine top-k — broadcast query matrix
  (ray.put once), per-batch numpy matmul partial top-k, driver merge of
  the tiny partials.  Exact; the DuckDB oracle checks it.
- ``q_ivf_topk``: IVF-style scale path — vectors bucketed by nearest
  centroid (deterministic seeded init), queries probe only the closest
  ``n_probe`` buckets.  Approximate; rows-only check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _load_matrix(sf_dir: str):
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(emb.column("vec_id").to_pylist(), dtype=np.int64)
    mat = np.asarray(emb.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat


def q_ann_topk(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Top-k cosine neighbors (excluding self) for the first n_queries
    vectors.  Partial top-k per batch, merged in a final tiny reduce."""
    import ray
    import ray.data as rd

    ids, mat = _load_matrix(sf_dir)
    order = np.argsort(ids)
    q_ids = ids[order[:n_queries]]
    q_mat = mat[order[:n_queries]]
    q_ref = ray.put((q_ids, q_mat))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        qi, qm = ray.get(q_ref)
        cand_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
        cand = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
        cand /= np.maximum(np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
        sims = qm @ cand.T  # (nq, nc)
        out_q, out_v, out_s = [], [], []
        for row in range(len(qi)):
            s = sims[row]
            mask = cand_ids != qi[row]
            idxs = np.argsort(-s)[: k + 1]
            for j in idxs:
                if mask[j]:
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

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=2048).to_pandas()
    # final merge: per query, global top-k of the partial top-ks
    out = (
        partials.sort_values(["query_id", "cosine", "vec_id"], ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    from ..functions.rounding import round_half_away

    out["cosine"] = round_half_away(out["cosine"].to_numpy(), 4)
    import ray.data as rd2

    return rd2.from_pandas(out)


def q_ivf_topk(sf_dir: str, n_queries: int = 10, k: int = 5, n_cells: int = 8, n_probe: int = 2):
    """IVF-bucketed ANN: assign vectors to n_cells seeded centroids,
    probe the n_probe nearest cells per query.  At 100 TB the cell
    assignment is a map_batches stage writing cell-partitioned parquet
    and queries fan out only to probed partitions."""
    import ray.data as rd

    ids, mat = _load_matrix(sf_dir)
    rng = np.random.default_rng(7)
    centroids = mat[rng.choice(len(mat), size=n_cells, replace=False)]
    for _ in range(5):  # a few Lloyd iterations, deterministic
        assign = np.argmax(mat @ centroids.T, axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                centroids[c] = v / max(np.linalg.norm(v), 1e-12)
    assign = np.argmax(mat @ centroids.T, axis=1)

    order = np.argsort(ids)
    q_ids = ids[order[:n_queries]]
    q_mat = mat[order[:n_queries]]
    rows_q, rows_v, rows_s = [], [], []
    for row in range(len(q_ids)):
        cells = np.argsort(-(q_mat[row] @ centroids.T))[:n_probe]
        cand_mask = np.isin(assign, cells) & (ids != q_ids[row])
        cand_ids = ids[cand_mask]
        sims = mat[cand_mask] @ q_mat[row]
        topk = np.argsort(-sims)[:k]
        rows_q.extend([q_ids[row]] * len(topk))
        rows_v.extend(cand_ids[topk].tolist())
        rows_s.extend(np.round(sims[topk], 4).tolist())
    return rd.from_arrow(
        pa.Table.from_pydict(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
                "cosine": pa.array(rows_s, type=pa.float64()),
            }
        )
    )
