"""PII scan / redaction over the ``documents`` table.

Every public large-corpus training-data pipeline carries a PII pass
(BigScience ROOTS pii-manager, Dolma's email/phone/IP taggers, CCNet
derivatives); the reference repo has none, so this is a pure
LLM-data-pipeline operator.  Shape: one vectorized, shuffle-free
``map_batches`` stage — polars regex kernels (Rust regex crate) count
and replace per batch; the identical patterns run in the DuckDB oracle
(RE2), so the cross-engine hash match pins both the match semantics and
the replacement semantics.  Patterns are deliberately restricted to the
syntax subset Rust-regex and RE2 share (no lookaround, no backrefs).

Scale story: embarrassingly parallel — zero shuffle, no state, no
driver materialization; redaction streams through and the counts are
per-doc columns.  At 100 TB this is bounded purely by scan bandwidth.

The synthetic corpus contains no digits at all, so the *query* surface
augments each doc with deterministic doc_id-derived contact strings —
constructed by the SAME arithmetic in the Ray path and the oracle SQL
(the decontaminate query's doc_id%10 stand-in precedent).  Distractors
(``user@localhost``: no TLD; ``999.1.2.3``: matches the deliberately
naive IPv4 pattern) document edge semantics identically in both
engines.
"""

from __future__ import annotations

import pyarrow as pa

# Shared Rust-regex / RE2 subset (no lookaround, no backrefs).
URL_RE = r"https?://[A-Za-z0-9./_%-]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# naive on purpose: 999.1.2.3 matches — a redactor should over-trigger;
# the oracle pins that BOTH engines over-trigger identically.
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# redaction order matters (applied left to right, same order in SQL).
# URL first: a dotted version segment inside a URL is COUNTED by the
# naive IP scan (counts run on the raw text) but swallowed by <URL>
# before the IP replacement runs — both engines pin that interplay.
REDACTIONS = (
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id, n_email/n_ip/n_phone (counted on the raw text), redacted
    text.  Pure polars column kernels — no python row loop."""
    import polars as pl

    df = pl.from_arrow(batch.select(["doc_id", text_col]))
    t = pl.col(text_col)
    red = t
    counts = []
    for name, rx, token in REDACTIONS:
        counts.append(t.str.count_matches(rx).cast(pl.Int64).alias(f"n_{name}"))
        red = red.str.replace_all(rx, token)
    out = df.select(pl.col("doc_id"), *counts, red.alias("redacted"))
    return out.to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_url", pa.int64()),
                ("n_email", pa.int64()),
                ("n_ip", pa.int64()),
                ("n_phone", pa.int64()),
                ("redacted", pa.string()),
            ]
        )
    )


def pii_redact(ds, text_col: str = "text"):
    """Production operator: counts + redacted text per document."""
    return ds.map_batches(
        lambda b: pii_redact_batch(b, text_col), batch_format="pyarrow"
    )


def _augment_batch(batch: pa.Table) -> pa.Table:
    """Deterministic doc_id-derived contact strings (mirrored verbatim
    in the oracle SQL — keep the two in lockstep)."""
    import polars as pl

    d = pl.col("doc_id")
    aug = (
        pl.col("text")
        + pl.when(d % 3 == 0)
        .then(pl.format(" contact j.doe+{}@lab{}.example.org", d, d % 7))
        .otherwise(pl.lit(""))
        + pl.when(d % 4 == 0)
        .then(pl.format(" node 10.{}.{}.{}", d % 256, (d * 3) % 256, d % 100))
        .otherwise(pl.lit(""))
        + pl.when(d % 5 == 0)
        .then(pl.format(" tel 415-{}-{}", 100 + (d * 7) % 900, 1000 + (d * 13) % 9000))
        .otherwise(pl.lit(""))
        + pl.when(d % 6 == 0)
        .then(pl.format(" see https://docs.example.org/kb/v1.{}.0/page-{}", d % 9, d % 13))
        .otherwise(pl.lit(""))
        + pl.when(d % 7 == 0)
        .then(pl.lit(" ref user@localhost build 999.1.2.3"))
        .otherwise(pl.lit(""))
        + pl.when(d % 8 == 0)
        # dotted quad INSIDE a url: n_ip counts it (scan over-triggers on
        # raw text) but <URL> swallows it before the IP replacement runs
        .then(pl.format(" mirror http://cdn{}.example.net/10.0.{}.{}/pkg", d % 5, d % 200, d % 50))
        .otherwise(pl.lit(""))
    )
    out = pl.from_arrow(batch.select(["doc_id", "text"])).select(
        pl.col("doc_id"), aug.alias("text")
    )
    return out.to_arrow().cast(pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))


def q_pii_scan(sf_dir: str):
    """Queryable surface: augment -> scan/redact -> compact per-doc
    proof columns (counts, redacted length, redacted 60-char tail so the
    hash compare covers the replacement bytes, not just the counts)."""
    import ray.data as rd

    def project(b: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(b)
        out = df.select(
            "doc_id",
            "n_url",
            "n_email",
            "n_ip",
            "n_phone",
            pl.col("redacted").str.len_chars().cast(pl.Int64).alias("redacted_len"),
            pl.col("redacted").str.slice(-60).alias("redacted_tail"),
        )
        return out.to_arrow()

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_augment_batch, batch_format="pyarrow")
        .map_batches(pii_redact_batch, batch_format="pyarrow")
        .map_batches(project, batch_format="pyarrow")
        .sort("doc_id")
    )


def pii_scan_oracle_sql() -> str:
    url = URL_RE.replace("'", "''")
    email = EMAIL_RE.replace("'", "''")
    ip = IPV4_RE.replace("'", "''")
    phone = PHONE_RE.replace("'", "''")
    return f"""
        WITH aug AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                        THEN ' contact j.doe+' || doc_id || '@lab' || (doc_id % 7) || '.example.org'
                        ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                        THEN ' node 10.' || (doc_id % 256) || '.' || ((doc_id * 3) % 256) || '.' || (doc_id % 100)
                        ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                        THEN ' tel 415-' || (100 + (doc_id * 7) % 900) || '-' || (1000 + (doc_id * 13) % 9000)
                        ELSE '' END
                   || CASE WHEN doc_id % 6 = 0
                        THEN ' see https://docs.example.org/kb/v1.' || (doc_id % 9) || '.0/page-' || (doc_id % 13)
                        ELSE '' END
                   || CASE WHEN doc_id % 7 = 0
                        THEN ' ref user@localhost build 999.1.2.3'
                        ELSE '' END
                   || CASE WHEN doc_id % 8 = 0
                        THEN ' mirror http://cdn' || (doc_id % 5) || '.example.net/10.0.' || (doc_id % 200) || '.' || (doc_id % 50) || '/pkg'
                        ELSE '' END AS t
            FROM documents
        ),
        red AS (
            SELECT doc_id, t,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(t, '{url}', '<URL>', 'g'),
                               '{email}', '<EMAIL>', 'g'),
                           '{ip}', '<IP>', 'g'),
                       '{phone}', '<PHONE>', 'g') AS r
            FROM aug
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{url}')) AS BIGINT) AS n_url,
               CAST(len(regexp_extract_all(t, '{email}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(t, '{phone}')) AS BIGINT) AS n_phone,
               CAST(length(r) AS BIGINT) AS redacted_len,
               CASE WHEN length(r) > 60 THEN right(r, 60) ELSE r END AS redacted_tail
        FROM red
        ORDER BY doc_id
    """
