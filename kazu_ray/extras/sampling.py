"""Deterministic sampling / splitting for training-data pipelines.

Standard corpus-preparation operators the reference lacks (it processes
every document): reproducible train/val/test splits and
stratified subsampling over an arbitrarily large corpus.  All decisions
derive from a salted md5 of the row key — no RNG state, no seed
synchronization across workers, and a row keeps its assignment no
matter how the corpus is partitioned, re-sharded or re-run.  The hash
is DuckDB's ``md5_number_upper`` (first 8 md5 bytes little-endian — see
dedup._word_hash64), so every operator here is cross-engine checkable
in SQL (tests/test_sampling.py).

Scale story:
- ``split_column`` / ``bernoulli_sample``: stateless, shuffle-free
  map_batches; bounded purely by scan bandwidth at 100 TB.
- ``stratified_sample_k``: per-BATCH partial top-k per stratum (each
  batch reduces to <= |strata| x k rows before anything crosses the
  exchange), then a strata-bounded merge — the same discipline as
  relational.q_orders_rank_per_group.  The exchange volume is
  O(|strata| x k x n_blocks), never corpus-sized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_SCALE = float(1 << 64)


def _key_hash64(keys, salt: str) -> np.ndarray:
    """uint64 md5-LE64 of ``salt || ':' || key`` per element — equals
    DuckDB ``md5_number_upper(salt || ':' || CAST(key AS VARCHAR))``."""
    out = np.empty(len(keys), dtype=np.uint64)
    pre = salt.encode() + b":"
    for i, k in enumerate(keys):
        d = hashlib.md5(pre + str(k).encode()).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def _u01(keys, salt: str) -> np.ndarray:
    """Deterministic uniform [0, 1) per key."""
    return _key_hash64(keys, salt).astype(np.float64) / _SCALE


def split_column(
    ds,
    weights: dict[str, float],
    key: str = "doc_id",
    salt: str = "split-v1",
):
    """Add a ``split`` column assigning each row to a named fraction
    (e.g. {'train': 0.9, 'val': 0.05, 'test': 0.05}) by cumulative
    ranges over the salted key hash.  Assignment is a pure function of
    (salt, key): stable under re-partitioning, appends and re-runs."""
    names = list(weights)
    total = sum(weights.values())
    cuts = np.cumsum([weights[n] / total for n in names])
    cuts[-1] = 1.0 + 1e-9  # float-sum slack: the last bucket absorbs it

    def assign(t: pa.Table) -> pa.Table:
        u = _u01(t.column(key).to_pylist(), salt)
        idx = np.searchsorted(cuts, u, side="right")
        split = pa.array([names[i] for i in idx], type=pa.string())
        return t.append_column("split", split)

    return ds.map_batches(assign, batch_format="pyarrow")


def bernoulli_sample(ds, fraction: float, key: str = "doc_id", salt: str = "sample-v1"):
    """Keep each row independently iff hash(salt, key)/2^64 < fraction.
    Exactly reproducible: the same (salt, key, fraction) keeps the same
    rows on any cluster shape, and DuckDB reproduces the predicate
    verbatim (``md5_number_upper(...) < fraction * 2^64``)."""
    threshold = np.uint64(min(int(fraction * _SCALE), (1 << 64) - 1))

    def keep(t: pa.Table) -> pa.Table:
        h = _key_hash64(t.column(key).to_pylist(), salt)
        return t.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def epoch_mix(
    ds,
    weights: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 1.0,
):
    """Deterministic data mixing: repeat each row ``w`` times where
    ``w`` is its source's mixing weight (Pile/LLaMA-style epoch
    weights).  ``w = 2.3`` keeps 2 full copies plus a third with
    probability 0.3; ``w = 0.3`` keeps the row with probability 0.3.
    The fractional decision hashes (salt, key), so it is reproducible,
    shuffle-free and partition-independent; copies carry an ``epoch``
    column (0-based) so downstream shuffles can decorrelate them.

    DuckDB reproduces the expansion verbatim (CROSS JOIN a
    generate_series per source + the md5_number_upper predicate on the
    last partial copy) — see tests/test_sampling.py."""

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("epoch", pa.array([], pa.int64()))
        src = t.column(source_col).to_pylist()
        w = np.array([float(weights.get(s, default_weight)) for s in src])
        full = np.floor(w).astype(np.int64)
        frac = w - full
        u = _u01(t.column(key).to_pylist(), salt)
        n_copies = full + (u < frac)
        idx = np.repeat(np.arange(len(src)), n_copies)
        epoch = np.concatenate(
            [np.arange(n) for n in n_copies]
        ) if len(idx) else np.zeros(0, dtype=np.int64)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("epoch", pa.array(epoch, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def stratified_sample_k(
    ds,
    stratum_col: str,
    k: int,
    key: str = "doc_id",
    salt: str = "strat-v1",
):
    """Deterministic k rows per stratum: within each stratum keep the k
    rows with the smallest salted key hash (a uniform random-without-
    replacement draw that every engine and every re-run agrees on).

    Output: all input columns of the winners.  Ties are impossible for
    distinct keys (64-bit hash); equal keys tie-break on the key.
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        h = _key_hash64(t.column(key).to_pylist(), salt)
        df = t.to_pandas()
        # order-preserving signed shift: sorting this int64 equals
        # sorting the raw uint64 (DuckDB's unsigned md5_number_upper)
        df["_h"] = (h - np.uint64(1 << 63)).view(np.int64)
        df = (
            df.sort_values(["_h", key])
            .groupby(stratum_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["_h", key]).head(k).drop(columns=["_h"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(stratum_col)
        .map_groups(merge, batch_format="pandas")
    )


def weighted_sample_n(
    ds,
    n: int,
    weight_col: str,
    key: str = "doc_id",
    salt: str = "wsample-v1",
):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row draws the deterministic
    uniform u = hash(salt, key)/2^64 and scores A-ES key u^(1/w); the n
    largest scores win, which realizes exactly the successive
    weighted-without-replacement draw.  Zero shuffle: per-batch partial
    top-n (every block reduces to <= n rows before anything leaves it),
    then a blocks-bounded merge — the same discipline as
    stratified_sample_k, with the uniform draw replaced by the weighted
    score.

    Weights must be positive; rows with weight <= 0 never win.  The
    score is replayable verbatim in DuckDB SQL
    (``pow(md5_number_upper(...)/2^64, 1.0/weight)``), so selection is
    cross-engine checkable — the wsample_parity row of approx_metrics
    compares the SELECTED ID SET, which is robust to last-ulp libm
    differences between engines (a flip would need two 64-bit-derived
    scores within one ulp of the cutoff).
    """
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        u = _u01(t.column(key).to_pylist(), salt)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.where(w > 0, u ** np.where(w > 0, 1.0 / np.maximum(w, 1e-300), 1.0), -1.0)
        df = t.to_pandas()
        df["_score"] = score
        # drop weight<=0 rows HERE (not a sentinel score): the contract
        # is they never win, even when fewer than n positive-weight
        # rows exist — matching the oracle's WHERE weight > 0
        df = df[df["_score"] >= 0.0]
        df = df.sort_values(["_score", key], ascending=[False, True]).head(n)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["_score", key], ascending=[False, True])
            .head(n)
            .drop(columns=["_score"])
        )

    # single merge group: the partial set is <= n x n_blocks rows by
    # construction (tiny), so one map_groups over a constant key is a
    # bounded reduce, not a shuffle
    partials = ds.map_batches(partial, batch_format="pyarrow")

    def add_const(t: pa.Table) -> pa.Table:
        return t.append_column("_g", pa.array(np.zeros(t.num_rows, dtype=np.int64)))

    return (
        partials.map_batches(add_const, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(lambda g: merge(g).drop(columns=["_g"]), batch_format="pandas")
    )


def weighted_sample_oracle_sql(
    n: int,
    weight_col: str = "n_chars",
    key: str = "doc_id",
    salt: str = "wsample-v1",
    table: str = "documents",
) -> str:
    """The A-ES selection as one DuckDB query (same md5-LE64 uniform,
    same u^(1/w) score, same (score desc, key) tie order)."""
    return f"""
        SELECT {key}, {weight_col}
        FROM {table}
        WHERE {weight_col} > 0
        ORDER BY pow(
            md5_number_upper(concat('{salt}:', CAST({key} AS VARCHAR))) / 18446744073709551616.0,
            1.0 / {weight_col}
        ) DESC, {key} ASC
        LIMIT {n}
    """


def q_weighted_sample(sf_dir: str, n: int = 500):
    """Query surface: length-weighted document sample (weight =
    n_chars) — longer documents proportionally likelier, the standard
    data-mixing draw.  Selected-set SQL parity is the wsample_parity
    row of approx_metrics."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return weighted_sample_n(ds, n=n, weight_col="n_chars").sort("doc_id")


# ---------------------------------------------------------------------------
# temperature-scaled source mixture (GPT-3 / PaLM style data mixing)
# ---------------------------------------------------------------------------


def q_source_mix(sf_dir: str, alpha: float = 0.7, budget: int = 100_000):
    """Per-source mixture weights w_s = n_s^alpha / sum(n^alpha) and the
    expected per-source document budget — the temperature-scaled
    multinomial mixing rule used to assemble LLM training sets (Brown
    et al. 2020 §2.2 table 2.2; alpha < 1 up-weights small sources).

    Distribution shape: a combiner-first count per source (per-batch
    polars partial -> one small groupby), then the weight normalization
    runs on the driver over the HANDFUL of source rows — bounded by the
    number of distinct sources (domains), not documents.  At 100 TB the
    exchange carries one row per (source, block).

    Oracle: source_mix in __ray_entry__.oracle_sql (same pow/round;
    n^alpha via the shared libm pow, weights rounded half-away at 6dp,
    expected docs = ROUND(budget * w) as BIGINT)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])

    def partials(t):
        import polars as pl

        return (
            pl.from_arrow(t)
            .group_by("source")
            .agg(n_p=pl.len().cast(pl.Int64))
            .to_arrow()
        )

    counts = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_p", alias_name="n_docs"))
        .take_all()
    )  # one row per distinct source — driver-bounded by construction
    df = pd.DataFrame(counts).sort_values("source").reset_index(drop=True)
    n = df["n_docs"].to_numpy(dtype="float64")
    scaled = np.power(n, alpha)
    w = scaled / scaled.sum()
    df["n_docs"] = df["n_docs"].astype("int64")
    df["weight"] = [round_half_away(v, 6) for v in w]
    df["expected_docs"] = [int(round_half_away(budget * v, 0)) for v in w]
    return df[["source", "n_docs", "weight", "expected_docs"]]


def source_mix_oracle_sql(alpha: float = 0.7, budget: int = 100_000) -> str:
    return f"""
        WITH s AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source
        ),
        t AS (SELECT SUM(POW(n_docs, {alpha})) AS tot FROM s)
        SELECT source, n_docs,
               ROUND(POW(n_docs, {alpha}) / t.tot, 6) AS weight,
               CAST(ROUND({budget} * POW(n_docs, {alpha}) / t.tot, 0) AS BIGINT)
                 AS expected_docs
        FROM s, t
        ORDER BY source
    """
