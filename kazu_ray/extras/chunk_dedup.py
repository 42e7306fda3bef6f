"""Global exact passage dedup with keep-first-occurrence semantics
(C4 / Dolma style).

Where extras/passages.py SCORES documents by their duplicated-passage
fraction (Lee et al. 2022), this operator actually DEDUPLICATES: the
corpus is segmented into fixed-size non-overlapping word chunks (the
tractable analogue of C4's three-sentence spans, Raffel et al. 2020
§2.2 / Dolma's paragraph dedup), and each distinct chunk text is kept
only at its FIRST occurrence corpus-wide — the occurrence with the
lexicographically smallest (doc_id, chunk_no).  Every other copy is
dropped, and each document is re-assembled from its surviving chunks.

Shape (the repo's two-exchange passage pattern, fully vectorized):

1. ``map_batches`` → (doc_id, chunk_no, chunk) rows: polars
   ``explode`` + ``int_range().over(doc_id)`` word numbering, chunk_no
   = word_no // k, one vectorized group-join per batch; trailing
   partial chunks are real chunks (every word belongs to exactly one).
2. coarse exchange on ``hash(chunk) % P`` — every copy of a chunk text
   lands in one partition, where a sort + ``is_first_distinct`` marks
   the global winner exactly (no hash-collision risk: the in-partition
   key is the string itself).  Dropped rows ship a NULL chunk onward,
   so the doc-side exchange carries each surviving byte once.
3. coarse exchange on ``hash(doc_id) % P`` → per-doc reassembly:
   counts, kept fraction, and an md5 digest of the surviving text (the
   digest is what the SQL oracle compares, so reassembly order and
   byte content are both pinned cross-engine).

At 100 TB the chunk exchange is a single all-to-all whose
per-partition share is bounded by ``shuffle_partitions`` byte scaling;
within-doc text never amplifies (non-overlapping chunks partition the
words, unlike the k-gram sliding window which is k-fold).

Every step is replayed exactly by one DuckDB query
(``chunk_dedup_oracle_sql``): same word regex, same chunk slicing,
same ROW_NUMBER-over-(doc_id, chunk_no) winner rule, same md5 of the
space-joined survivors — parity is the ``chunk_dedup_parity`` row of
``approx_metrics`` (the query surface itself sits past the driver's
50-query budget).

Reference scope note: the reference engine (KAZU) has no corpus-level
dedup; this belongs to the training-data operator family the engine
adds (SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import pyarrow as pa

from ..context import input_bytes, shuffle_partitions

_WORD_RE = r"[a-z0-9]+"
DEFAULT_K = 10

CHUNK_DEDUP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_chunks", pa.int64()),
        ("n_kept", pa.int64()),
        ("kept_frac", pa.float64()),
        ("kept_digest", pa.string()),
    ]
)


def _doc_chunks_batch(batch: pa.Table, k: int, nparts: int) -> pa.Table:
    """(doc_id, chunk_no, chunk, part): non-overlapping k-word chunks
    per document, coarse exchange partition precomputed."""
    import polars as pl

    words = (
        pl.from_arrow(batch.select(["doc_id", "text"]))
        .with_columns(ws=pl.col("text").str.extract_all(_WORD_RE))
        .filter(pl.col("ws").list.len() >= 1)
        .select("doc_id", "ws")
        .explode("ws")
        .rename({"ws": "word"})
        .with_columns(
            chunk_no=(pl.int_range(pl.len()).over("doc_id") // k).cast(pl.Int64)
        )
    )
    out = (
        words.group_by("doc_id", "chunk_no", maintain_order=True)
        .agg(chunk=pl.col("word").str.join(" "))
        .with_columns(part=(pl.col("chunk").hash(seed=7) % nparts).cast(pl.Int64))
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_no", pa.int64()),
                ("chunk", pa.string()),
                ("part", pa.int64()),
            ]
        )
    )


def _make_classify_in_partition(nparts: int):
    """Within one coarse chunk partition (which holds EVERY copy of each
    of its chunk texts): mark the global first occurrence per chunk text
    via sort + is_first_distinct, null out the text of dropped copies so
    the doc-side exchange only ships surviving bytes."""

    def classify(group) -> "object":
        import polars as pl

        df = (
            pl.from_pandas(group[["doc_id", "chunk_no", "chunk"]])
            .sort("chunk", "doc_id", "chunk_no")
            .with_columns(keep=pl.col("chunk").is_first_distinct())
            .with_columns(
                chunk=pl.when(pl.col("keep")).then(pl.col("chunk")).otherwise(None),
                dpart=(pl.col("doc_id").hash(seed=3) % nparts).cast(pl.Int64),
            )
        )
        return df.to_pandas()

    return classify


def _reassemble_docs(group) -> "object":
    """Per-doc totals + surviving-text md5 digest, vectorized over the
    doc-side coarse partition (one hashlib call per doc with >=1 kept
    chunk; docs per partition are bounded by the byte-scaled P)."""
    import hashlib

    import polars as pl

    agg = (
        pl.from_pandas(group[["doc_id", "chunk_no", "chunk", "keep"]])
        .sort("doc_id", "chunk_no")
        .group_by("doc_id", maintain_order=True)
        .agg(
            n_chunks=pl.len().cast(pl.Int64),
            n_kept=pl.col("keep").sum().cast(pl.Int64),
            kept_join=pl.col("chunk").drop_nulls().str.join(" "),
        )
        .with_columns(kept_frac=pl.col("n_kept") / pl.col("n_chunks"))
    )
    pdf = agg.to_pandas()
    pdf["kept_digest"] = [
        hashlib.md5(s.encode()).hexdigest() if n else None
        for s, n in zip(pdf["kept_join"], pdf["n_kept"])
    ]
    return pdf[["doc_id", "n_chunks", "n_kept", "kept_frac", "kept_digest"]]


def chunk_dedup(docs_ds, k: int = DEFAULT_K, num_partitions: int | None = None):
    """docs (doc_id, text) -> per-doc (doc_id, n_chunks, n_kept,
    kept_frac, kept_digest) under global keep-first chunk dedup."""
    nparts = num_partitions or shuffle_partitions()

    return (
        docs_ds.map_batches(
            lambda b: _doc_chunks_batch(b, k, nparts), batch_format="pyarrow"
        )
        .groupby("part")
        .map_groups(_make_classify_in_partition(nparts), batch_format="pandas")
        .groupby("dpart")
        .map_groups(_reassemble_docs, batch_format="pandas")
    )


def q_chunk_dedup(sf_dir: str, k: int = DEFAULT_K):
    """Query surface: global chunk dedup over the documents corpus.
    Exact cross-engine parity (incl. the md5 digests of the surviving
    text) is the chunk_dedup_parity row of approx_metrics."""
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    nparts = shuffle_partitions(estimated_bytes=input_bytes(path))
    return chunk_dedup(ds, k=k, num_partitions=nparts).sort("doc_id")


def chunk_dedup_oracle_sql(k: int = DEFAULT_K) -> str:
    """The full operator as one DuckDB query — same word regex, same
    non-overlapping slicing (list slices clamp at len like the Ray
    side's trailing partial chunk), same (doc_id, chunk_no) winner
    rule, same md5-of-space-joined-survivors digest."""
    return f"""
        WITH w AS (
          SELECT doc_id, regexp_extract_all(text, '{_WORD_RE}') AS ws
          FROM documents
        ),
        c AS (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, CAST(ceil(len(ws) / {k}.0) AS BIGINT)),
              i -> struct_pack(
                chunk_no := i - 1,
                chunk := array_to_string(ws[(i-1)*{k}+1 : i*{k}], ' ')))) AS u
          FROM w WHERE len(ws) >= 1
        ),
        occ AS (
          SELECT doc_id,
                 CAST(u.chunk_no AS BIGINT) AS chunk_no,
                 u.chunk AS chunk,
                 ROW_NUMBER() OVER (
                   PARTITION BY u.chunk ORDER BY doc_id, u.chunk_no
                 ) AS rn
          FROM c
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) FILTER (rn = 1) AS BIGINT) AS n_kept,
               CAST(COUNT(*) FILTER (rn = 1) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS kept_frac,
               md5(string_agg(chunk, ' ' ORDER BY chunk_no)
                   FILTER (rn = 1)) AS kept_digest
        FROM occ
        GROUP BY doc_id
        ORDER BY doc_id
    """
