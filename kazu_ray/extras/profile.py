"""Single-pass column profiling (Deequ / TFDV-style corpus stats).

Before any 100-TB pipeline runs, you profile the input: row counts,
null fractions, ranges, and approximate cardinalities per column.  One
streaming pass over the table produces all of it:

- per batch, ONE fixed-size partial row per column: n, n_null, min,
  max (strings compared lexicographically, numerics numerically —
  both stringified only at the END for the cross-engine surface), and
  the column's HLL register partial (p=12, the repo's sketch from
  extras/sketches.py, hashing the DuckDB-compatible VARCHAR rendering
  of each distinct value);
- partials merge associatively (sum / min / max / register-MAX) under
  one tiny columns-keyed exchange (groupby('column').map_groups) — the
  driver then ingests exactly ONE merged row per column, i.e.
  columns x (4 scalars + 4096 bytes) regardless of table size or
  block count;
- the surface emits one row per column; the SQL oracle replays
  EVERYTHING including the register array, so n_distinct_est matches
  bit-for-bit (same registers -> same estimator), and min/max/null
  counts match exactly.

Profiled columns are int64 / string here (the synthetic orders table's
id, status and priority columns) — float/timestamp columns are
profiled for n/n_null/min/max but excluded from the distinct sketch,
because engines do not agree on a canonical VARCHAR rendering of
doubles (documented seam, same reasoning as extras/sampling.py's
integer-keyed hashing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sketches import HLL_M, _hll_rho, hll_estimate

PROFILE_COLUMNS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def profile_table(ds, columns: list[str] = PROFILE_COLUMNS):
    """Dataset -> per-column profile rows (column, n, n_null,
    n_distinct_est, min_str, max_str, nonzero_registers)."""
    import hashlib

    def partial(t: pa.Table) -> pa.Table:
        rows = []
        for col in columns:
            c = t.column(col)
            n = len(c)
            n_null = c.null_count
            valid = c.drop_null()
            vmin = pc.min(valid).as_py() if len(valid) else None
            vmax = pc.max(valid).as_py() if len(valid) else None
            is_num = isinstance(vmin, (int, np.integer)) or (
                vmin is None and pa.types.is_integer(c.type)
            )
            regs = np.zeros(HLL_M, dtype=np.uint8)
            for v in pc.unique(valid).to_pylist():
                h = int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
                idx, rho = _hll_rho(h)
                if rho > regs[idx]:
                    regs[idx] = rho
            nz = np.nonzero(regs)[0]
            rows.append(
                {
                    "column": col,
                    "n": n,
                    "n_null": n_null,
                    "min_i64": vmin if is_num else None,
                    "max_i64": vmax if is_num else None,
                    "min_txt": None if (is_num or vmin is None) else str(vmin),
                    "max_txt": None if (is_num or vmax is None) else str(vmax),
                    "registers": nz.astype(np.int64).tolist(),
                    "rhos": regs[nz].astype(np.int64).tolist(),
                }
            )
        return pa.Table.from_pylist(rows)

    def _fold(rows: list[dict]) -> dict:
        """Associative merge of partial rows for ONE column."""
        m = {
            "n": 0,
            "n_null": 0,
            "min_i64": None,
            "max_i64": None,
            "min_txt": None,
            "max_txt": None,
            "regs": np.zeros(HLL_M, dtype=np.uint8),
        }
        for r in rows:
            m["n"] += r["n"]
            m["n_null"] += r["n_null"]
            for key, op in (
                ("min_i64", min),
                ("max_i64", max),
                ("min_txt", min),
                ("max_txt", max),
            ):
                # typed merge: integer columns compare numerically,
                # string columns lexicographically — stringification
                # happens only at the final surface
                if r.get(key) is not None:
                    m[key] = r[key] if m[key] is None else op(m[key], r[key])
            idx = np.asarray(r["registers"], dtype=np.int64)
            rho = np.asarray(r["rhos"], dtype=np.uint8)
            np.maximum.at(m["regs"], idx, rho)
        return m

    def merge_group(g: pa.Table) -> pa.Table:
        """groupby('column').map_groups reducer: all of one column's
        block partials -> ONE merged partial row (same schema), so the
        driver ingests exactly n_columns rows regardless of how many
        blocks the scan produced."""
        rows = g.to_pylist()
        m = _fold(rows)
        nz = np.nonzero(m["regs"])[0]
        return pa.Table.from_pylist(
            [
                {
                    "column": rows[0]["column"],
                    "n": m["n"],
                    "n_null": m["n_null"],
                    "min_i64": m["min_i64"],
                    "max_i64": m["max_i64"],
                    "min_txt": m["min_txt"],
                    "max_txt": m["max_txt"],
                    "registers": nz.astype(np.int64).tolist(),
                    "rhos": m["regs"][nz].astype(np.int64).tolist(),
                }
            ]
        )

    # driver fold is now bounded at exactly n_columns merged rows
    # (the groupby stage above did the n_blocks-wide merge in-cluster)
    partial_rows: dict[str, list[dict]] = {}
    reduced = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .map_groups(merge_group, batch_format="pyarrow")
    )
    for b in reduced.iter_batches(batch_format="pyarrow", batch_size=None):
        for r in b.to_pylist():
            partial_rows.setdefault(r["column"], []).append(r)
    merged = {col: _fold(rows) for col, rows in partial_rows.items()}
    import pandas as pd

    out = []
    for col in columns:
        m = merged[col]
        out.append(
            {
                "column": col,
                "n": int(m["n"]),
                "n_null": int(m["n_null"]),
                "n_distinct_est": round(hll_estimate(m["regs"]), 4),
                "min_str": str(m["min_i64"]) if m["min_i64"] is not None else m["min_txt"],
                "max_str": str(m["max_i64"]) if m["max_i64"] is not None else m["max_txt"],
                "nonzero_registers": int((m["regs"] > 0).sum()),
            }
        )
    return pd.DataFrame(out)


def q_profile(sf_dir: str):
    """Query surface: profile of the orders table's int/string columns.
    Exact SQL parity (incl. the HLL registers behind n_distinct_est) is
    the profile_parity row of approx_metrics.

    Min/max merge is TYPED end-to-end (numeric for int columns,
    lexicographic for strings); values are stringified only at the
    final surface, matching the oracle's CAST(MIN(..) AS VARCHAR)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=PROFILE_COLUMNS)
    return profile_table(ds)


def profile_oracle_sql() -> str:
    """Per-column n / n_null / min / max plus the full HLL register
    replay (same md5 of the VARCHAR rendering), as one DuckDB query
    emitting the same one-row-per-column surface."""
    parts = []
    for col in PROFILE_COLUMNS:
        parts.append(
            f"""
        SELECT '{col}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_null,
               CAST(MIN({col}) AS VARCHAR) AS min_str,
               CAST(MAX({col}) AS VARCHAR) AS max_str
        FROM orders"""
        )
    return " UNION ALL ".join(parts)


def profile_hll_oracle_sql(col: str) -> str:
    from .sketches import _HLL_SUFFIX_BITS

    return f"""
WITH vals AS (
  SELECT DISTINCT CAST({col} AS VARCHAR) AS v FROM orders
  WHERE {col} IS NOT NULL
),
h AS (
  SELECT CAST(concat('0x', substr(md5(v), 1, 16)) AS UBIGINT) AS hv FROM vals
),
rr AS (
  SELECT CAST(hv >> {_HLL_SUFFIX_BITS} AS BIGINT) AS register,
         CASE WHEN (hv & ((1::UBIGINT << {_HLL_SUFFIX_BITS}) - 1)) = 0
              THEN {_HLL_SUFFIX_BITS + 1}
              ELSE {_HLL_SUFFIX_BITS + 1}
                   - length(bin(hv & ((1::UBIGINT << {_HLL_SUFFIX_BITS}) - 1)))
         END AS rho
  FROM h
)
SELECT register, max(rho) AS rho FROM rr GROUP BY register ORDER BY register
"""
