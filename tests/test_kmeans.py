"""Distributed k-means + SemDeDup (extras/kmeans.py).

Gates: distributed-vs-driver equivalence, partition invariance, and the
SemDeDup keep rule on planted near-duplicate groups."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory, ray_session):
    """60 unit vectors: 3 planted groups of 4 exact duplicates each,
    plus 48 well-separated random vectors."""
    rng = np.random.default_rng(41)
    base = rng.normal(size=(51, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vec_id = 0
    for g in range(3):  # 4 identical copies of base[g]
        for _ in range(4):
            rows.append((vec_id, base[g].astype(np.float32)))
            vec_id += 1
    for i in range(3, 51):
        rows.append((vec_id, base[i].astype(np.float32)))
        vec_id += 1
    tbl = pa.Table.from_pydict(
        {
            "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "embedding": pa.array([r[1] for r in rows], type=pa.list_(pa.float32())),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(tbl, d / "embeddings.parquet")
    return str(d)


def test_kmeans_equivalence_gate(ray_session):
    from kazu_ray.extras.kmeans import q_kmeans_equivalence

    m = q_kmeans_equivalence(SF).iloc[0]
    assert m["assign_equal_frac"] == 1.0
    assert m["centroid_max_err"] < 1e-9
    assert m["semdedup_kept_ok"] and m["semdedup_dropped_ok"]
    assert m["passes"]


def test_kmeans_partition_invariance(ray_session):
    """Same centroids and assignments whether the input arrives as one
    block or many — the partial-sum reduce must not depend on the
    partitioning."""
    import ray.data as rd

    from kazu_ray.extras.kmeans import assign_clusters, kmeans_fit

    ds1 = rd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds7 = ds1.repartition(7)
    c1 = kmeans_fit(ds1, k=6)
    c7 = kmeans_fit(ds7, k=6)
    np.testing.assert_allclose(c1, c7, atol=1e-12)
    a1 = {r["vec_id"]: r["cluster"] for r in assign_clusters(ds1, c1).take_all()}
    a7 = {r["vec_id"]: r["cluster"] for r in assign_clusters(ds7, c7).take_all()}
    assert a1 == a7


def test_semdedup_planted_duplicates(planted_dir, ray_session):
    """Exact-duplicate groups collapse to exactly one kept row each;
    well-separated vectors all survive at eps=0.97."""
    import ray.data as rd

    from kazu_ray.extras.kmeans import semdedup

    ds = rd.read_parquet(
        f"{planted_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = semdedup(ds, k=5, eps=0.97).take_all()
    assert len(rows) == 60
    by_id = {r["vec_id"]: r for r in rows}
    for g in range(3):
        group = [by_id[i] for i in range(4 * g, 4 * g + 4)]
        # identical vectors always share a cluster, so exactly one survives
        assert len({r["cluster"] for r in group}) == 1
        assert sum(r["kept"] for r in group) == 1
    for i in range(12, 60):
        assert by_id[i]["kept"], i


def test_semdedup_query_surface(ray_session):
    """q_semdedup covers every input row, is sorted, and at eps=0.3 on
    the isotropic test corpus exercises both keep and drop branches."""
    from kazu_ray.extras.kmeans import q_semdedup

    rows = q_semdedup(SF).take_all()
    n = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert len(rows) == n
    ids = [r["vec_id"] for r in rows]
    assert ids == sorted(ids)
    kept = sum(r["kept"] for r in rows)
    assert 0 < kept < n
