"""Bloom filter: the two guarantees that make it usable as a pre-filter
— ZERO false negatives (every true member survives), false-positive
rate within range of theory — plus semi/anti-join equivalence against
exact DuckDB joins modulo the (measured, bounded) false positives, and
partition invariance of the distributed build."""

import duckdb
import numpy as np
import pytest

from kazu_ray.extras.bloom import (
    _member_mask,
    bloom_filter,
    build_bloom,
    optimal_params,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
ORDERS = f"{SF}/orders.parquet"


def test_optimal_params_shape():
    m, k = optimal_params(10_000, fpr=0.01)
    assert 9 * 10_000 < m < 11 * 10_000  # ~9.6 bits/key at 1%
    assert 5 <= k <= 9


def test_zero_false_negatives_and_fpr(ray_session):
    import ray.data as rd

    members = rd.read_parquet(DOCS, columns=["doc_id"])
    bloom = build_bloom(members, key="doc_id", fpr=0.01)
    bitmap, m_bits, k = bloom
    member_ids = [r["doc_id"] for r in members.take_all()]
    # every member hits — guaranteed, not probabilistic
    assert _member_mask(member_ids, bitmap, m_bits, k).all()
    # non-members: measured FPR below a slack bound over 20k probes
    probes = list(range(10_000_000, 10_020_000))
    fpr = _member_mask(probes, bitmap, m_bits, k).mean()
    assert fpr < 0.03, fpr


def test_semi_and_anti_join_vs_exact(ray_session):
    import ray.data as rd

    # blocklist: customers of orders table; big side: orders rows
    members = rd.read_parquet(ORDERS, columns=["o_custkey"]).map_batches(
        lambda b: b.rename_columns(["doc_id"]), batch_format="pyarrow"
    )
    bloom = build_bloom(members, key="doc_id", fpr=0.005)
    big = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    kept = {r["c_custkey"] for r in bloom_filter(big, bloom, key="c_custkey").take_all()}
    dropped = {
        r["c_custkey"]
        for r in bloom_filter(big, bloom, key="c_custkey", negate=True).take_all()
    }
    con = duckdb.connect()
    exact = {
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT c_custkey FROM read_parquet('{DOCS.replace('documents','customer')}')
                WHERE c_custkey IN (SELECT o_custkey FROM read_parquet('{ORDERS}'))"""
        ).fetchall()
    }
    all_keys = {
        r[0]
        for r in con.execute(
            f"SELECT c_custkey FROM read_parquet('{DOCS.replace('documents','customer')}')"
        ).fetchall()
    }
    # no false negatives: the Bloom semi-join is a superset of the exact one
    assert exact <= kept
    # anti-join keeps only definite non-members
    assert dropped <= all_keys - exact
    assert kept | dropped == all_keys and not (kept & dropped)
    # false positives bounded
    assert len(kept - exact) <= max(5, 0.02 * len(all_keys))


def test_build_partition_invariance(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(DOCS, columns=["doc_id"])
    b1, m1, k1 = build_bloom(ds, m_bits=1 << 14, k=5, num_partitions=3)
    b2, m2, k2 = build_bloom(
        ds.repartition(9), m_bits=1 << 14, k=5, num_partitions=7
    )
    assert (m1, k1) == (m2, k2)
    assert np.array_equal(b1, b2)
