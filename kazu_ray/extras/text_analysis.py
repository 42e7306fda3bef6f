"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, fingerprinting.

All are vectorized ``map_batches`` stages; the SQL-expressible ones have
DuckDB oracles in ``__ray_entry__`` (same regexes, same rounding)."""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

from ..context import input_bytes, shuffle_partitions

_WORD = re.compile(r"[A-Za-z0-9]+")
STOPWORDS = ("the", "and", "of", "a", "to", "in", "is")
_STOP_SET = frozenset(STOPWORDS)

# tiny per-language marker sets for the n-gram/stopword language heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that"},
    "es": {"el", "la", "de", "que", "y", "los", "una"},
    "de": {"der", "die", "und", "das", "nicht", "ist", "ein"},
    "fr": {"le", "la", "les", "des", "est", "une", "dans"},
}


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, n_chars, stop_ratio (rounded 4dp)."""
    texts = batch.column("text").to_pylist()
    n_tokens, stop_ratio = [], []
    for t in texts:
        words = _WORD.findall(t)
        n = len(words)
        n_tokens.append(n)
        stops = sum(1 for w in words if w.lower() in _STOP_SET)
        # single IEEE division, bit-identical to the DuckDB oracle — no
        # rounding (round() is banker's, SQL ROUND is half-away)
        stop_ratio.append(stops / max(n, 1))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            "stop_ratio": pa.array(stop_ratio, type=pa.float64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprint (md5 here; swap for a rolling hash at will)."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, type=pa.string())}
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language heuristic; 'und' when nothing matches."""
    texts = batch.column("text").to_pylist()
    langs = []
    for t in texts:
        words = set(w.lower() for w in _WORD.findall(t))
        best, best_n = "und", 0
        for lang, markers in sorted(_LANG_MARKERS.items()):
            n = len(words & markers)
            if n > best_n:
                best, best_n = lang, n
        langs.append(best)
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "pred_lang": pa.array(langs, type=pa.string())}
    )


def token_partial_counts(batch: pa.Table) -> pa.Table:
    """Combiner for global token frequency: per-batch counts."""
    import polars as pl

    counts: dict[str, int] = {}
    for t in batch.column("text").to_pylist():
        for w in _WORD.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return pl.DataFrame(
        {"token": list(counts.keys()), "n": list(counts.values())}
    ).cast({"n": pl.Int64}).to_arrow()


def q_doc_token_stats(sf_dir: str):
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(token_stats_batch, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_doc_fingerprint(sf_dir: str):
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .sort("doc_id")
    )


def q_langid_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(langid_batch, batch_format="pyarrow")
        .groupby("pred_lang")
        .aggregate(Count(alias_name="n_docs"))
        .sort("pred_lang")
    )


def q_token_topk(sf_dir: str, k: int = 20):
    import ray.data as rd
    from ray.data.aggregate import Sum

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(token_partial_counts, batch_format="pyarrow")
        .groupby(
            "token",
            num_partitions=shuffle_partitions(
                estimated_bytes=input_bytes(f"{sf_dir}/documents.parquet")
            ),
        )
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "token"], descending=[True, False])
        .limit(k)
    )


# GPT-2-style BPE pre-tokenization, simplified to the RE2-safe subset
# (no unicode property classes, no trailing-space lookahead) so the
# IDENTICAL pattern drives Python re and the DuckDB oracle.  Counts the
# pre-tokenizer pieces a byte-level BPE would split on — the standard
# "token count" a training-data pipeline budgets by.
BPE_PRETOKEN_REGEX = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
)
_BPE_RE = re.compile(BPE_PRETOKEN_REGEX)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_bpe_tokens (pre-tokenizer piece count)."""
    counts = [
        len(_BPE_RE.findall(t)) for t in batch.column("text").to_pylist()
    ]
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(counts, type=pa.int64()),
        }
    )


def q_bpe_token_count(sf_dir: str):
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(bpe_token_count_batch, batch_format="pyarrow")
        .sort("doc_id")
    )


def bpe_token_count_oracle_sql() -> str:
    rx = BPE_PRETOKEN_REGEX.replace("'", "''")  # SQL string-literal escape
    return f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{rx}'))
                    AS BIGINT) AS n_bpe_tokens
        FROM documents ORDER BY doc_id
    """


def json_props_batch(batch: pa.Table) -> pa.Table:
    """Vectorized JSON field extraction from the events ``props`` column
    (polars json_path_match — no per-row python json.loads), bucketing
    the extracted key for a typed aggregate."""
    import polars as pl

    df = pl.from_arrow(batch.select(["event_type", "props"])).with_columns(
        k=pl.col("props").str.json_path_match("$.k").cast(pl.Int64)
    )
    out = df.with_columns(k_bucket=(pl.col("k") // 10).cast(pl.Int64)).select(
        "event_type", "k_bucket", "k"
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("event_type", pa.string()),
                ("k_bucket", pa.int64()),
                ("k", pa.int64()),
            ]
        )
    )


def q_json_props(sf_dir: str):
    """Semi-structured column handling: extract a JSON field from every
    event's props payload and aggregate per (event_type, decile bucket)
    — count plus summed key value.  Embarrassingly parallel extract,
    one bounded-key groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    return (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "props"])
        .map_batches(json_props_batch, batch_format="pyarrow")
        .groupby(["event_type", "k_bucket"])
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
        .sort(["event_type", "k_bucket"])
    )


def json_props_oracle_sql() -> str:
    # floor() rather than SQL // : DuckDB integer // truncates toward
    # zero on negatives while polars // floors — floor() matches polars
    return """
        SELECT event_type,
               CAST(floor(CAST(json_extract(props, '$.k') AS BIGINT) / 10.0)
                    AS BIGINT) AS k_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                 AS sum_k
        FROM events
        GROUP BY 1, 2 ORDER BY 1, 2
    """
