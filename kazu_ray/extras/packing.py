"""Sequence packing (concat-and-chunk) for LLM training batches.

GPT-style training pipelines concatenate the token streams of all
documents in a fixed corpus order and cut the stream into fixed-length
sequences; a document whose tokens straddle a cut contributes a slice
to each covered sequence.  The output here is the packing PLAN — one
row per (sequence, document-slice):

    seq_id      which training sequence the slice lands in
    doc_id      the source document
    tok_start   first token of the slice within the document
    seq_offset  position of the slice within the sequence
    n_toks      slice length

so a downstream tokenize-and-emit stage can build each sequence by
reading exactly the documents listed under its seq_id.

The hard part at corpus scale is the GLOBAL exclusive prefix sum of
per-document token counts in deterministic doc_id order.  Ray-Data-first
shape (the classic two-phase distributed scan):

1. one streamed pass tokenizes each batch (vectorized polars
   ``str.extract_all``/``len``) and keeps only (doc_id, n_tokens) —
   16 bytes per document, the only state that persists;
2. documents range-bucket into ``num_partitions`` CONTIGUOUS doc_id
   ranges (range partitioning, not hash — prefix sums need ordered
   partitions); per-bucket token totals are a bounded
   ``groupby(part).sum`` (one int per bucket) whose exclusive cumsum on
   the driver yields each bucket's global base offset;
3. each bucket then computes its local offsets independently (sort by
   doc_id + cumsum, fully vectorized) and expands straddling documents
   with ``np.repeat`` — no row loops, no cross-bucket traffic.

Total driver state and broadcast volume is one int64 per bucket; the
exchange ships two int64s per document.  Cross-engine: DuckDB
reproduces the plan bit-for-bit via SUM() OVER (ORDER BY doc_id) +
generate_series (see :func:`packing_oracle_sql`), using the repo-wide
``[a-z0-9]+`` tokenizer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WORD_RE = r"[a-z0-9]+"

PACK_SCHEMA = pa.schema(
    [
        ("seq_id", pa.int64()),
        ("doc_id", pa.int64()),
        ("tok_start", pa.int64()),
        ("seq_offset", pa.int64()),
        ("n_toks", pa.int64()),
    ]
)


def _token_counts(batch: pa.Table, key: str, text: str) -> pa.Table:
    import polars as pl

    df = pl.from_arrow(batch.select([key, text]))
    out = df.select(
        pl.col(key).alias("doc_id").cast(pl.Int64),
        pl.col(text).str.to_lowercase().str.count_matches(_WORD_RE)
        .cast(pl.Int64).alias("n"),
    )
    return out.to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("n", pa.int64())])
    )


def _expand_bucket(seq_len: int, bases: dict[int, int]):
    def expand(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        order = pc.sort_indices(group.column("doc_id"))
        ids = group.column("doc_id").take(order).to_numpy(zero_copy_only=False)
        n = group.column("n").take(order).to_numpy(zero_copy_only=False)
        off = bases[part] + np.concatenate(([0], np.cumsum(n)[:-1]))
        keep = n > 0
        ids, n, off = ids[keep], n[keep], off[keep]
        if not len(ids):
            return PACK_SCHEMA.empty_table()
        first_seq = off // seq_len
        last_seq = (off + n - 1) // seq_len
        n_slices = last_seq - first_seq + 1
        row = np.repeat(np.arange(len(ids)), n_slices)
        intra = np.arange(len(row)) - np.repeat(
            np.concatenate(([0], np.cumsum(n_slices)[:-1])), n_slices
        )
        seq_id = first_seq[row] + intra
        lo = np.maximum(seq_id * seq_len, off[row])
        hi = np.minimum((seq_id + 1) * seq_len, (off + n)[row])
        return pa.table(
            {
                "seq_id": pa.array(seq_id, pa.int64()),
                "doc_id": pa.array(ids[row], pa.int64()),
                "tok_start": pa.array(lo - off[row], pa.int64()),
                "seq_offset": pa.array(lo - seq_id * seq_len, pa.int64()),
                "n_toks": pa.array(hi - lo, pa.int64()),
            }
        )

    return expand


def sequence_pack(
    ds,
    seq_len: int = 2048,
    key: str = "doc_id",
    text: str = "text",
    num_partitions: int | None = None,
):
    """Packing plan for concatenating ``ds`` (in ``key`` order) into
    fixed ``seq_len``-token sequences.  Returns a Dataset with
    :data:`PACK_SCHEMA`; zero-token documents contribute no slice."""
    from ..context import shuffle_partitions

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    nparts = num_partitions or shuffle_partitions()

    counts = ds.map_batches(
        lambda b: _token_counts(b, key, text), batch_format="pyarrow"
    ).materialize()  # 2 int64s per document — the only persisted state
    if counts.count() == 0:
        import ray.data as rd

        return rd.from_arrow(PACK_SCHEMA.empty_table())
    lo = int(counts.min("doc_id"))
    hi = int(counts.max("doc_id"))
    width = max(1, (hi - lo + nparts) // nparts)

    def bucket(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "part", pa.array((ids - int(lo)) // width, pa.int64())
        )

    bucketed = counts.map_batches(bucket, batch_format="pyarrow")
    totals = {
        r["part"]: r["sum(n)"]
        for r in bucketed.groupby("part").sum("n").take_all()
    }  # bounded: one row per contiguous doc_id range
    bases, acc = {}, 0
    for p in sorted(totals):
        bases[p] = acc
        acc += int(totals[p])
    return bucketed.groupby("part").map_groups(
        _expand_bucket(seq_len, bases), batch_format="pyarrow"
    )


def packing_oracle_sql(seq_len: int = 2048) -> str:
    """DuckDB ground truth for :func:`sequence_pack` over ``documents``."""
    return f"""
        WITH t AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '{_WORD_RE}')) AS n
          FROM documents),
        o AS (
          -- SUM() OVER yields HUGEINT; range() needs BIGINT
          SELECT doc_id, n,
                 CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
                      AS BIGINT) AS off
          FROM t),
        s AS (
          SELECT doc_id, n, off,
                 unnest(range(off // {seq_len}, (off + n - 1) // {seq_len} + 1)) AS seq_id
          FROM o WHERE n > 0)
        SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
               CAST(GREATEST(seq_id * {seq_len} - off, 0) AS BIGINT) AS tok_start,
               CAST(GREATEST(off - seq_id * {seq_len}, 0) AS BIGINT) AS seq_offset,
               CAST(LEAST((seq_id + 1) * {seq_len}, off + n)
                    - GREATEST(seq_id * {seq_len}, off) AS BIGINT) AS n_toks
        FROM s ORDER BY seq_id, doc_id
    """
