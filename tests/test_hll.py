"""HyperLogLog distinct-count sketch: register-level cross-engine
parity with DuckDB, estimator accuracy envelope, merge idempotence and
partition invariance."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.sketches import (
    HLL_M,
    _hll_rho,
    hll_distinct_tokens,
    hll_estimate,
    hll_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _oracle_registers(sf_dir: str) -> np.ndarray:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    exp = np.zeros(HLL_M, dtype=np.uint8)
    for register, rho in con.execute(hll_oracle_sql()).fetchall():
        exp[int(register)] = int(rho)
    return exp


def test_register_parity_with_duckdb(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    regs = hll_distinct_tokens(ds)
    assert (regs == _oracle_registers(SF)).all()


def test_partition_invariance(ray_session):
    """Register MAX-merge is a lattice join: any repartitioning of the
    corpus yields the identical register array."""
    ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ds7 = rd.read_parquet(
        f"{SF}/documents.parquet", columns=["text"]
    ).repartition(7)
    assert (hll_distinct_tokens(ds1) == hll_distinct_tokens(ds7)).all()


def test_estimate_accuracy_across_cardinalities(ray_session):
    """Estimator inside 3-sigma (4.9% at p=12) from linear-counting
    range through the raw-estimator range."""
    for n in (50, 2_000, 40_000):
        texts = [f"tok{i}a tok{i}b" for i in range(n // 2)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)}))
        est = hll_estimate(hll_distinct_tokens(ds))
        assert abs(est - n) / n <= 0.049, (n, est)


def test_estimate_empty_and_duplicates(ray_session):
    ds = rd.from_arrow(pa.table({"text": pa.array(["", None], type=pa.string())}))
    regs = hll_distinct_tokens(ds)
    assert regs.sum() == 0
    assert hll_estimate(regs) == 0.0
    # duplicates do not move the estimate (set semantics)
    one = rd.from_arrow(pa.table({"text": pa.array(["alpha beta"])}))
    many = rd.from_arrow(pa.table({"text": pa.array(["alpha beta"] * 500)}))
    assert (hll_distinct_tokens(one) == hll_distinct_tokens(many)).all()


def test_rho_matches_reference_bit_math():
    # suffix 0 -> max rank; all-ones suffix -> rank 1
    idx, rho = _hll_rho(0b1 << 52)
    assert (idx, rho) == (1, 53)
    idx, rho = _hll_rho((1 << 52) - 1)
    assert (idx, rho) == (0, 1)
