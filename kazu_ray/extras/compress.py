"""Compression-ratio and byte-entropy quality signals (RefinedWeb /
MassiveText use compressibility to flag boilerplate and machine-generated
repetition; near-zero-entropy documents are padding or encoding bugs).

Signals per document:
  raw_bytes     UTF-8 length
  gz_bytes      len(zlib.compress(text, 6))
  gz_ratio      gz_bytes / raw_bytes         (one IEEE division)
  byte_entropy  Shannon entropy in bits/byte over the UTF-8 bytes

Scale design: zero shuffle — one vectorized map_batches stage, sorted
only for the queryable surface.  Entropy is computed for a WHOLE batch
with two numpy kernels (np.add.at scatter into an n_docs x 256 count
matrix over the Arrow data buffer — no per-row Python); zlib is called
once per document but each call is C (the loop body does no Python
work beyond the call).  Not SQL-expressible (DuckDB has no zlib), so
the driver-recorded evidence is the `compression_parity` gate row in
approx_metrics: the distributed result must be bit-identical to a
single-process reference over the same rows, plus pytest fixtures that
pin the semantics (constant text -> entropy 0 / tiny gz_ratio; the
2-symbol alternation -> exactly 1.0 bits/byte).

Reference seam: KAZU has no corpus-level quality operators (SURVEY
§2l); beyond-the-reference training-data surface.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

SIGNALS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("gz_bytes", pa.int64()),
        ("gz_ratio", pa.float64()),
        ("byte_entropy", pa.float64()),
    ]
)


def batch_byte_entropy(texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Bits/byte per row, computed batch-at-once from the Arrow string
    buffers (offsets + data) — no per-row Python loop."""
    arr = (
        texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    )
    # normalize to a single flat string array with int32 offsets
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ]
    lengths = np.diff(offsets).astype(np.int64)
    row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lengths)
    counts = np.zeros(n * 256, dtype=np.int64)
    np.add.at(counts, row_of_byte * 256 + data.astype(np.int64), 1)
    counts = counts.reshape(n, 256)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts / np.maximum(lengths, 1)[:, None]
        terms = np.where(counts > 0, -p * np.log2(p, where=counts > 0), 0.0)
    return terms.sum(axis=1)


def compression_signals_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id")
    texts = batch.column("text")
    ent = batch_byte_entropy(texts)
    blist = texts.cast(pa.binary()).combine_chunks().tolist()
    raw = np.asarray([len(b) for b in blist], dtype=np.int64)
    gz = np.asarray([len(zlib.compress(b, 6)) for b in blist], dtype=np.int64)
    ratio = gz / np.maximum(raw, 1)
    return pa.table(
        {
            "doc_id": ids,
            "raw_bytes": pa.array(raw),
            "gz_bytes": pa.array(gz),
            "gz_ratio": pa.array(ratio),
            "byte_entropy": pa.array(ent),
        }
    ).cast(SIGNALS_SCHEMA)


def q_compression_signals(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(compression_signals_batch, batch_format="pyarrow").sort(
        "doc_id"
    )


def q_compression_gate(sf_dir: str):
    """Distributed-vs-reference bit-exact parity (the driver-recorded
    gate behind the non-SQL-expressible signals): run the SAME kernel
    single-process over the whole table and require every row equal."""
    import pandas as pd
    import pyarrow.parquet as pq

    dist = (
        q_compression_signals(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ref = (
        compression_signals_batch(tbl)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    eq = dist.equals(ref)
    return pd.DataFrame(
        [{"paths_equal": bool(eq), "rows": len(dist), "gate": 1.0, "passes": bool(eq)}]
    )
