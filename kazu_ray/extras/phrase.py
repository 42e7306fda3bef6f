"""Positional phrase search — exact multi-word phrase matching via
positional posting-list intersection (the classic IR algorithm:
Manning/Raghavan/Schütze, *Introduction to Information Retrieval*
§2.4.2), not substring scanning.

For each document: tokenize once, keep the position lists of QUERY
tokens only (the broadcast-pruned posting slice), and intersect
``pos(w0) ∩ (pos(w1) - 1) ∩ ... ∩ (pos(wk) - k)`` with vectorised
``np.intersect1d`` — each surviving position is one phrase occurrence.
Phrases with all-distinct words cannot self-overlap (a length-1 or -2
border would force two phrase words equal), so occurrence counts are
unambiguous.

Distributed shape: documents are whole rows, so the entire match runs
in-block — ZERO exchanges; the only wide op is the result sort.  The
broadcast query-token set prunes the posting build to the handful of
relevant tokens per doc (at 100 TB the scan stays bandwidth-bound on
the pruned column read).  A persisted-index variant (write the pruned
postings parquet once, intersect per query) is the amortized path for
repeated query workloads; the per-query compute is identical.

Exact SQL oracle: DuckDB replays each phrase with a position
self-join over ``generate_subscripts`` token ordinals — exact
(phrase, doc_id, n_hits) row parity, including phrases with zero
corpus hits contributing zero rows on both engines.

Reference scope note: KAZU matches dictionary surfaces with an
Aho-Corasick automaton (stages/dict_ner.py); this is the positional
phrase-query analogue for the retrieval family (SURVEY.md §2l,
alongside extras/retrieval.py's BM25).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TOKEN_RE = r"[a-z0-9]+"

# fixed query workload: all-distinct-word phrases (overlap-free by
# construction); the last one never occurs — both engines must agree
# on its absence
PHRASES: tuple[tuple[str, ...], ...] = (
    ("table", "scan"),
    ("hash", "join"),
    ("merge", "sort", "agg"),
    ("zebra", "quasar"),
)

PHRASE_SCHEMA = pa.schema(
    [("phrase", pa.string()), ("doc_id", pa.int64()), ("n_hits", pa.int64())]
)


def _match_batch(t: pa.Table) -> pa.Table:
    import polars as pl

    toks = (
        pl.from_arrow(t.select(["doc_id", "text"]))
        .with_columns(
            tok=pl.col("text").str.to_lowercase().str.extract_all(_TOKEN_RE)
        )
        .select("doc_id", "tok")
    )
    qtokens = {w for p in PHRASES for w in p}
    rows = []
    for did, words in zip(
        toks.get_column("doc_id").to_list(), toks.get_column("tok").to_list()
    ):
        # pruned positional postings: only query tokens keep positions
        pos: dict[str, list[int]] = {w: [] for w in qtokens}
        for i, w in enumerate(words):
            if w in pos:
                pos[w].append(i)
        for phrase in PHRASES:
            cur = np.asarray(pos[phrase[0]], dtype=np.int64)
            for k, w in enumerate(phrase[1:], start=1):
                if len(cur) == 0:
                    break
                cur = np.intersect1d(
                    cur, np.asarray(pos[w], dtype=np.int64) - k,
                    assume_unique=True,
                )
            if len(cur):
                rows.append(
                    {"phrase": " ".join(phrase), "doc_id": did,
                     "n_hits": int(len(cur))}
                )
    return pa.Table.from_pylist(rows, schema=PHRASE_SCHEMA)


def q_phrase_search(sf_dir: str):
    """Query surface: (phrase, doc_id, n_hits) for every document
    containing each fixed query phrase, sorted.  Exact SQL position-
    join parity."""
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_match_batch, batch_format="pyarrow")
        .sort(["phrase", "doc_id"])
    )


def phrase_search_oracle_sql() -> str:
    per_phrase = []
    for phrase in PHRASES:
        joins = []
        conds = [f"t0.tok = '{phrase[0]}'"]
        for k, w in enumerate(phrase[1:], start=1):
            joins.append(
                f"JOIN toks t{k} ON t{k}.doc_id = t0.doc_id "
                f"AND t{k}.ord = t0.ord + {k} AND t{k}.tok = '{w}'"
            )
        per_phrase.append(
            f"""
            SELECT '{" ".join(phrase)}' AS phrase, t0.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM toks t0 {' '.join(joins)}
            WHERE {' AND '.join(conds)}
            GROUP BY t0.doc_id
            """
        )
    union = " UNION ALL ".join(per_phrase)
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS tok,
                   generate_subscripts(
                       regexp_extract_all(lower(text), '{_TOKEN_RE}'), 1
                   ) AS ord
            FROM documents
        )
        {union}
        ORDER BY phrase, doc_id
    """


# fixed conjunctive (AND) query workloads; the last can never match
BOOL_QUERIES: tuple[tuple[str, ...], ...] = (
    ("table", "merge"),
    ("hash", "join", "sort"),
    ("zebra",),
)


def q_bool_retrieval(sf_dir: str):
    """Conjunctive boolean retrieval (IR AND queries): for each fixed
    term set, the documents containing EVERY term.  Documents are
    row-local, so the membership check is a zero-shuffle in-block set
    test over the pruned token vocabulary; the persisted-index variant
    (token->doc postings intersect) is the amortized repeated-query
    path and shares extras/retrieval.py's postings machinery.

    Exact SQL parity: DISTINCT token join + HAVING COUNT = |terms|."""
    import polars as pl
    import ray.data as rd

    qtokens = {w for q in BOOL_QUERIES for w in q}

    def match(t: pa.Table) -> pa.Table:
        toks = (
            pl.from_arrow(t.select(["doc_id", "text"]))
            .with_columns(
                tok=pl.col("text").str.to_lowercase().str.extract_all(_TOKEN_RE)
            )
            .select("doc_id", "tok")
        )
        rows = []
        for did, words in zip(
            toks.get_column("doc_id").to_list(),
            toks.get_column("tok").to_list(),
        ):
            present = qtokens.intersection(words)
            for q in BOOL_QUERIES:
                if all(w in present for w in q):
                    rows.append({"query": " AND ".join(q), "doc_id": did})
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema([("query", pa.string()), ("doc_id", pa.int64())]),
        )

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(match, batch_format="pyarrow")
        .sort(["query", "doc_id"])
    )


def bool_retrieval_oracle_sql() -> str:
    parts = []
    for q in BOOL_QUERIES:
        terms = ", ".join(f"'{w}'" for w in q)
        parts.append(
            f"""
            SELECT '{" AND ".join(q)}' AS query, doc_id
            FROM (
                SELECT doc_id,
                       unnest(list_distinct(
                           regexp_extract_all(lower(text), '{_TOKEN_RE}')
                       )) AS tok
                FROM documents
            )
            WHERE tok IN ({terms})
            GROUP BY doc_id
            HAVING COUNT(DISTINCT tok) = {len(q)}
            """
        )
    return " UNION ALL ".join(parts) + " ORDER BY query, doc_id"
