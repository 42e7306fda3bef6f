"""Product-quantization ANN: recall gate, distributed-vs-reference
path equivalence, code compression, and encode invariances."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_pq_recall_vs_exact(ray_session):
    from kazu_ray.extras.similarity import q_ann_topk, q_pq_topk

    got = q_pq_topk(SF).to_pandas()
    exact = q_ann_topk(SF).to_pandas()
    recs = []
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        p = set(got[got["query_id"] == qid]["vec_id"])
        recs.append(len(e & p) / len(e))
    assert np.mean(recs) >= 0.9
    # re-rank returns TRUE cosines: every returned pair matches the
    # exact oracle's cosine for that pair where both report it
    merged = got.merge(exact, on=["query_id", "vec_id"], suffixes=("_pq", "_ex"))
    assert np.allclose(merged["cosine_pq"], merged["cosine_ex"])


def test_pq_gate_paths_equal(ray_session):
    from kazu_ray.extras.metrics import q_pq_gate

    m = q_pq_gate(SF).iloc[0]
    assert m["paths_equal"]
    assert m["recall"] >= m["gate"]


def test_pq_codes_are_32x_compression(ray_session):
    from kazu_ray.extras.similarity import PQ_M, pq_encode_corpus, pq_train_codebooks, _pq_sample

    books = pq_train_codebooks(_pq_sample(SF))
    tbl = pq_encode_corpus(SF, books).to_pandas()
    assert len(tbl) == 500
    # 64-dim float32 = 256 bytes -> PQ_M uint8 bytes
    assert PQ_M == 8
    code_cols = [c for c in tbl.columns if c.startswith("code_")]
    assert len(code_cols) == PQ_M
    for c in code_cols:
        vals = tbl[c].to_numpy()
        assert vals.dtype == np.uint8 or vals.max() <= 255


def test_pq_encode_deterministic_and_batch_invariant(ray_session):
    from kazu_ray.extras.similarity import (
        _batch_matrix,
        _pq_sample,
        pq_encode_matrix,
        pq_train_codebooks,
    )
    import pyarrow.parquet as pq_

    sample = _pq_sample(SF)
    b1 = pq_train_codebooks(sample)
    b2 = pq_train_codebooks(sample)
    assert (b1 == b2).all()
    tbl = pq_.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    _, mat = _batch_matrix(tbl)
    whole = pq_encode_matrix(mat, b1)
    halves = np.vstack([pq_encode_matrix(mat[:250], b1), pq_encode_matrix(mat[250:], b1)])
    assert (whole == halves).all()


def test_pq_reconstruction_beats_random_codes(ray_session):
    """The trained codebooks actually quantize: reconstruction error of
    trained codes is far below random code assignment."""
    from kazu_ray.extras.similarity import (
        PQ_M,
        _batch_matrix,
        _pq_sample,
        pq_encode_matrix,
        pq_train_codebooks,
    )
    import pyarrow.parquet as pq_

    tbl = pq_.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    _, mat = _batch_matrix(tbl)
    books = pq_train_codebooks(_pq_sample(SF))
    codes = pq_encode_matrix(mat, books)
    dsub = mat.shape[1] // PQ_M

    def recon(cds):
        out = np.zeros_like(mat)
        for m in range(PQ_M):
            out[:, m * dsub : (m + 1) * dsub] = books[m][cds[:, m]]
        return out

    rng = np.random.default_rng(0)
    err_trained = ((mat - recon(codes)) ** 2).sum(axis=1).mean()
    err_random = (
        (mat - recon(rng.integers(0, 256, size=codes.shape))) ** 2
    ).sum(axis=1).mean()
    assert err_trained < 0.5 * err_random


# --- embedding standardization ---------------------------------------------


def test_standardize_parity_and_properties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.metrics import q_standardize_parity
    from kazu_ray.extras.similarity import standardize_embeddings, standardize_stats

    m = q_standardize_parity(SF).iloc[0]
    assert m["paths_equal"]

    # standardized corpus has ~zero mean and ~unit std per dim
    ds = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mean, std = standardize_stats(ds)
    z = standardize_embeddings(ds, mean, std).to_pandas()
    zmat = np.vstack(z["zvec"].to_numpy())
    assert np.abs(zmat.mean(axis=0)).max() < 1e-9
    assert np.abs(zmat.std(axis=0) - 1.0).max() < 1e-9


def test_standardize_constant_dim_passthrough(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.similarity import standardize_embeddings, standardize_stats

    vecs = [[float(i), 7.0] for i in range(10)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(10), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    mean, std = standardize_stats(ds, dim=2)
    assert std[1] == 1e-12  # floored, no div-by-zero
    z = standardize_embeddings(ds, mean, std).to_pandas()
    zmat = np.vstack(z["zvec"].to_numpy())
    assert np.allclose(zmat[:, 1], 0.0)  # constant dim -> all zeros
