"""Grouped linear regression — per-group exact OLS from integer
moment partials (the distributed-moments pattern: each block ships one
fixed-size (n, Σx, Σy, Σx², Σxy) row per group; the closed-form fit
happens once per group).

Bit-exact cross-engine by construction: both features are INTEGERS
(x = n_chars, y = the document's token count), so every moment is an
exact integer on both engines (Python arbitrary-precision on the
driver fold, HUGEINT in DuckDB), and the slope/intercept are computed
with the IDENTICAL float64 expression tree —

    slope     = float(n·Σxy − Σx·Σy) / float(n·Σx² − Σx²)
    intercept = (Σy − slope·Σx) / n

— same integer inputs, same three IEEE-754 operations, same bits.  No
rounding seam exists.  (At extreme per-group scale the int64 products
need the HUGEINT/object-dtype path — the driver fold here already
uses Python ints, and the docstringed bound is checked.)

Shape: one groupby(source) over fixed-size partials — the exchange is
O(groups × blocks) tiny rows regardless of corpus size; the fit is a
per-group scalar computation.

Reference scope note: KAZU has no numeric model fitting; this extends
the training-data analytics family (SURVEY.md §2l) alongside the
distributed logistic-regression classifier (extras/lrfilter.py).
"""

from __future__ import annotations

import pyarrow as pa

_TOKEN_RE = r"[a-z0-9]+"

OLS_SCHEMA = pa.schema(
    [
        ("source", pa.string()),
        ("n_docs", pa.int64()),
        ("slope", pa.float64()),
        ("intercept", pa.float64()),
    ]
)


def _moments_batch(t: pa.Table) -> pa.Table:
    import polars as pl

    out = (
        pl.from_arrow(t.select(["source", "n_chars", "text"]))
        .with_columns(
            y=pl.col("text")
            .str.to_lowercase()
            .str.extract_all(_TOKEN_RE)
            .list.len()
            .cast(pl.Int64),
            x=pl.col("n_chars").cast(pl.Int64),
        )
        .group_by("source")
        .agg(
            n=pl.len().cast(pl.Int64),
            sx=pl.col("x").sum(),
            sy=pl.col("y").sum(),
            sxx=(pl.col("x") * pl.col("x")).sum(),
            sxy=(pl.col("x") * pl.col("y")).sum(),
        )
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("source", pa.string()),
                ("n", pa.int64()),
                ("sx", pa.int64()),
                ("sy", pa.int64()),
                ("sxx", pa.int64()),
                ("sxy", pa.int64()),
            ]
        )
    )


def _fit(group):
    import pandas as pd

    # Python ints: exact integer moments regardless of magnitude
    n = int(group["n"].sum())
    sx = int(group["sx"].sum())
    sy = int(group["sy"].sum())
    sxx = int(group["sxx"].sum())
    sxy = int(group["sxy"].sum())
    den = n * sxx - sx * sx
    if den == 0:
        slope = float("nan")
        intercept = float("nan")
    else:
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
    return pd.DataFrame(
        {
            "source": [group["source"].iloc[0]],
            "n_docs": [n],
            "slope": [slope],
            "intercept": [intercept],
        }
    )


def q_source_ols(sf_dir: str):
    """Query surface: per-source OLS of token count on n_chars.
    Bit-exact SQL parity (integer moments + identical float tree)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars", "text"]
    )
    return (
        ds.map_batches(_moments_batch, batch_format="pyarrow")
        .groupby("source")
        .map_groups(_fit, batch_format="pandas")
        .sort("source")
    )


def source_ols_oracle_sql() -> str:
    return f"""
        WITH f AS (
            SELECT source,
                   CAST(n_chars AS BIGINT) AS x,
                   CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}'))
                        AS BIGINT) AS y
            FROM documents
        ),
        m AS (
            SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(x * y) AS sxy
            FROM f GROUP BY source
        ),
        s AS (
            SELECT source, n, sx, sy,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
            FROM m
        )
        SELECT source, CAST(n AS BIGINT) AS n_docs, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept
        FROM s
        ORDER BY source
    """
