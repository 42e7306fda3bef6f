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


# --- groupwise HLL ---------------------------------------------------------


def _group_docs(n_groups: int, docs_per_group: int, vocab_per_group: int):
    import pandas as pd

    rows = []
    for g in range(n_groups):
        for d in range(docs_per_group):
            toks = [
                f"g{g}tok{(d * 17 + j) % vocab_per_group}" for j in range(40)
            ]
            rows.append({"source": f"grp{g}", "text": " ".join(toks)})
    return pd.DataFrame(rows)


def test_hll_group_register_sql_parity(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import (
        hll_group_distinct_tokens,
        hll_group_oracle_sql,
    )

    docs = _group_docs(6, 10, 50)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(5)
    got = (
        hll_group_distinct_tokens(ds, nparts=3)
        .to_pandas()
        .sort_values(["source", "register"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(hll_group_oracle_sql()).df()
    assert len(got) == len(exp)
    assert (got["source"].values == exp["source"].values).all()
    assert (got["register"].values == exp["register"].astype("int64").values).all()
    assert (got["rho"].values == exp["rho"].astype("int64").values).all()


def test_hll_group_estimates_in_envelope(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import (
        hll_group_distinct_tokens,
        hll_group_estimates,
    )

    # distinct vocab differs strongly per group: 20, 120, 220, ...
    import pandas as pd

    rows = []
    truth = {}
    for g in range(5):
        vocab = 20 + 100 * g
        truth[f"grp{g}"] = vocab
        toks = [f"g{g}tok{j}" for j in range(vocab)]
        for d in range(8):
            rows.append(
                {"source": f"grp{g}", "text": " ".join(toks[d::8] + toks[:5])}
            )
    docs = pd.DataFrame(rows)
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False)).repartition(7)
    est = hll_group_estimates(hll_group_distinct_tokens(ds, nparts=4))
    assert len(est) == 5
    for _, r in est.iterrows():
        true = truth[r["source"]]
        assert abs(r["estimate"] - true) / true <= 0.25  # p=8 3-sigma + slack


def test_hll_group_partition_invariance(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.sketches import hll_group_distinct_tokens

    docs = _group_docs(4, 12, 80)

    def run(nblocks, nparts):
        ds = rd.from_arrow(
            pa.Table.from_pandas(docs, preserve_index=False)
        ).repartition(nblocks)
        return (
            hll_group_distinct_tokens(ds, nparts=nparts)
            .to_pandas()
            .sort_values(["source", "register"])
            .reset_index(drop=True)
        )

    a = run(2, 2)
    b = run(11, 7)
    assert a.drop(columns=["part"], errors="ignore").equals(
        b.drop(columns=["part"], errors="ignore")
    )
