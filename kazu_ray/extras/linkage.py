"""Record linkage — string-similarity self-join via FastSS deletion
neighborhoods (Bocek, Hunt & Stiller 2007, "Fast Similarity Search in
Large Dictionaries").

Finds every pair of distinct strings within edit distance 1 WITHOUT a
quadratic cross join: each string is indexed under itself plus all of
its single-character-deletion variants; the FastSS theorem guarantees
two strings at Levenshtein distance <= 1 share at least one variant
(equal lengths + one substitution share the deletion at the differing
position; length-difference-1 insertions put the shorter string in the
longer one's neighborhood).  Sharing a variant is NECESSARY, not
sufficient (e.g. "xy"/"yx" share keys at distance 2), so candidates
are verified with an exact O(n) distance-<=1 check.

Distributed shape:

1. distinct names (one bounded groupby — name dictionaries are
   vocabulary-sized, not corpus-sized);
2. ``map_batches`` fans each name out to its <= len+1 deletion
   variants (key, name) — neighborhood size is bounded by max string
   length, and the fan-out happens in-block;
3. one groupby(key) exchange co-locates every neighborhood; candidate
   pairs (a < b) are emitted per group, then deduped by a pair-keyed
   groupby (a pair can share several variants);
4. verification runs in-partition on the deduped candidates — the
   only quadratic work is within a single deletion bucket, which for
   natural-language dictionaries is a handful of strings.

At 100 TB the name dictionary (not the corpus) bounds every structure;
a pathological bucket (all strings equal length sharing a variant) is
the classic FastSS hot spot and is bounded by dictionary skew, not
data volume.  Extending to distance d means d-deletion neighborhoods
(|neighborhood| = O(len^d)) — same shape, documented seam.

Exact SQL oracle: DuckDB's ``levenshtein`` over the distinct-name
cross join (the oracle MAY do the quadratic join at test scale; the
operator never does) — row-for-row including the distance column.

Reference scope note: KAZU links entity strings to ontology synonyms
via TF-IDF trigrams (stages/linking.py); this is the corpus-side
record-linkage analogue for the training-data family (SURVEY.md §2l).
"""

from __future__ import annotations

import pyarrow as pa

PAIRS_SCHEMA = pa.schema(
    [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
)


def _lev_le1(a: str, b: str) -> int | None:
    """Exact edit distance when <= 1, else None — O(len) without DP."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


def _variants_batch(t: pa.Table) -> pa.Table:
    """(name) -> (key, name) rows: the name itself plus every single-
    deletion variant.  The identity key is what lets an insertion pair
    collide (the shorter string IS a deletion variant of the longer
    one), so keys must NOT be tagged by variant kind."""
    keys, names = [], []
    for name in t.column("name").to_pylist():
        keys.append(name)
        names.append(name)
        for i in range(len(name)):
            keys.append(name[:i] + name[i + 1 :])
            names.append(name)
    return pa.table({"key": pa.array(keys), "name": pa.array(names)})


def _bucket_pairs(group):
    """All ordered candidate pairs within one variant bucket."""
    import pandas as pd

    names = sorted(set(group["name"]))
    a_out, b_out = [], []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a_out.append(names[i])
            b_out.append(names[j])
    return pd.DataFrame({"name_a": a_out, "name_b": b_out})


def _verify(group):
    import pandas as pd

    a = group["name_a"].iloc[0]
    rows = []
    for b in group["name_b"].unique():
        d = _lev_le1(a, b)
        if d == 1:
            rows.append({"name_a": a, "name_b": b, "dist": 1})
    return pd.DataFrame(rows, columns=["name_a", "name_b", "dist"])


def similarity_self_join(names_ds):
    """names (name) -> (name_a, name_b, dist) for every distinct pair
    at Levenshtein distance exactly 1 (name_a < name_b)."""
    candidates = (
        names_ds.map_batches(_variants_batch, batch_format="pyarrow")
        .groupby("key")
        .map_groups(_bucket_pairs, batch_format="pandas")
        .groupby(["name_a", "name_b"])
        .count()
        .select_columns(["name_a", "name_b"])
    )
    return (
        candidates.groupby("name_a")
        .map_groups(_verify, batch_format="pandas")
    )


def q_name_matches(sf_dir: str):
    """Query surface: edit-distance-1 pairs among distinct part names,
    sorted.  Exact row-for-row DuckDB levenshtein parity."""
    import ray.data as rd

    names = (
        rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .groupby("p_name")
        .count()
        .select_columns(["p_name"])
        .map_batches(
            lambda t: t.rename_columns(["name"]), batch_format="pyarrow"
        )
    )
    return similarity_self_join(names).sort(["name_a", "name_b"])


def name_matches_oracle_sql() -> str:
    return """
        WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        FROM names a
        JOIN names b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) <= 1
        ORDER BY name_a, name_b
    """
