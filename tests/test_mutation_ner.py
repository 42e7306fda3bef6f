"""Regex mutation NER (SethStep analogue).

Reference: kazu/steps/ner/seth.py:20-131 (SETH over py4j, entity_class
``mutation``, gene-entity condition, self-referential PROBABLE mapping).
Detection vectors below are published SETH / MutationFinder example
forms; the DuckDB parity test pins the cross-engine contract the oracle
query relies on (same RE2-safe pattern in Python ``re`` and DuckDB
``regexp_extract_all``)."""

import duckdb
import pyarrow as pa

from kazu_ray.functions.mutations import (
    CLASSIFY_RULES,
    MUTATION_REGEX,
    classify,
    find_mutations,
    normalize_mutation,
)
from kazu_ray.stages.mutation_ner import MutationNer, mutations_batch

POSITIVES = {
    "p.Val600Glu": "SUBSTITUTION",
    "Val600Glu": "SUBSTITUTION",
    "V600E": "SUBSTITUTION",
    "p.V600E": "SUBSTITUTION",
    "c.1799T>A": "SUBSTITUTION",
    "g.140453136A>T": "SUBSTITUTION",
    "c.123+1G>T": "SUBSTITUTION",
    "IVS2+1G>A": "SUBSTITUTION",
    "rs113488022": "DBSNP_MENTION",
    "c.76_78delACT": "DELETION",
    "c.76_77insG": "INSERTION",
    "c.112_117delinsTG": "DELETION_INSERTION",
    "c.123dup": "DUPLICATION",
    "Arg97fs": "FRAMESHIFT",
    "p.Arg97fsTer23": "FRAMESHIFT",
}

NEGATIVES = [
    "EGFR",          # plain gene symbol
    "H3K27",         # histone mark fragment, single-digit position
    "A1B",           # one-letter form at 1-digit position (excluded by design)
    "room B612 is",  # not an amino-acid letter pair
    "rs and more",   # rs without digits
    "p27",           # synonym handled by dictionary linking, not a mutation
]


def test_positive_vectors_and_types():
    for surface, expect_type in POSITIVES.items():
        hits = find_mutations(f"We found {surface} in the cohort.")
        assert [h["match"] for h in hits] == [surface], surface
        assert hits[0]["mutation_type"] == expect_type, surface


def test_negative_vectors():
    for text in NEGATIVES:
        assert find_mutations(f"note that {text} here") == [], text


def test_offsets_and_multiple_hits():
    text = "Both V600E and c.1799T>A (rs113488022) co-occur."
    hits = find_mutations(text)
    assert [(h["match"], text[h["start"]:h["end"]]) for h in hits] == [
        ("V600E", "V600E"),
        ("c.1799T>A", "c.1799T>A"),
        ("rs113488022", "rs113488022"),
    ]


def test_normalization():
    assert normalize_mutation("p.Val600Glu") == {
        "norm": "p.V600E", "wt": "V", "mut": "E", "pos": 600,
    }
    assert normalize_mutation("V600E")["norm"] == "p.V600E"
    assert normalize_mutation("Arg97fs") == {
        "norm": "p.R97fs", "wt": "R", "mut": "fs", "pos": 97,
    }
    n = normalize_mutation("c.1799T>A")
    assert (n["norm"], n["wt"], n["mut"], n["pos"]) == ("c.1799T>A", "T", "A", 1799)
    assert normalize_mutation("rs113488022")["pos"] == 113488022
    assert classify("Ter600fs") == "FRAMESHIFT"


def test_duckdb_regex_parity():
    """The oracle contract: DuckDB's RE2 must extract and classify the
    exact same (match, type) sequence as Python re over mixed text."""
    texts = [
        "Both V600E and c.1799T>A (rs113488022) co-occur with p.Val600Glu.",
        "Frameshift Arg97fs with deletion c.76_78delACT and c.112_117delinsTG.",
        "Negative text: EGFR, H3K27, A1B, p27 and IVS2+1G>A only.",
        "no mutations at all in this sentence",
        "edge c.123dup, insert c.76_77insG, and g.140453136A>T end",
    ]
    con = duckdb.connect()
    cases = " ".join(
        f"WHEN regexp_matches(m, '{rx}') THEN '{t}'" for rx, t in CLASSIFY_RULES
    )
    for text in texts:
        got_sql = con.execute(
            f"""
            SELECT m, CASE {cases} ELSE 'SUBSTITUTION' END
            FROM (SELECT unnest(regexp_extract_all(?, '{MUTATION_REGEX}')) AS m)
            """,
            [text],
        ).fetchall()
        got_py = [(h["match"], h["mutation_type"]) for h in find_mutations(text)]
        assert [tuple(r) for r in got_sql] == got_py, text


def _doc_row(doc_id, text, entities):
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        "entities": entities,
    }


def _gene_ent():
    return {
        "span_idx": 0, "start": 0, "end": 4, "match": "KRAS",
        "match_norm": "KRAS", "entity_class": "gene",
        "namespace": "DictionaryNER", "mention_confidence": 100,
        "candidates": [], "mappings": [],
    }


def test_stage_condition_gating():
    from kazu_ray.schemas import DOCS_SCHEMA, ENTITIES_COLUMN

    text = "KRAS V600E was observed."
    tbl = pa.Table.from_pylist(
        [_doc_row("a", text, [_gene_ent()]), _doc_row("b", text, [])],
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("spans", DOCS_SCHEMA.field("spans").type),
                ("entities", ENTITIES_COLUMN),
            ]
        ),
    )
    out = MutationNer()(tbl).column("entities").to_pylist()
    with_gene, without_gene = out
    muts = [e for e in with_gene if e["entity_class"] == "mutation"]
    assert len(muts) == 1 and muts[0]["match"] == "V600E"
    assert muts[0]["namespace"] == "MutationNER"
    # self-referential PROBABLE mapping, reference seth.py:118-129 shape
    m = muts[0]["mappings"][0]
    assert (m["idx"], m["source"], m["parser_name"]) == ("mutation", "mutation", "n/a")
    assert m["string_match_confidence"] == "PROBABLE"
    # prior entities preserved
    assert any(e["match"] == "KRAS" for e in with_gene)
    # condition: no gene entity -> untouched
    assert [e["entity_class"] for e in without_gene] == []
    # ungated variant processes every doc
    out2 = MutationNer(condition_classes=None)(tbl).column("entities").to_pylist()
    assert any(e["entity_class"] == "mutation" for e in out2[1])


def test_mutations_batch_flat_table():
    batch = pa.table({"doc_id": [7], "text": ["V600E plus rs42 here"]})
    t = mutations_batch(batch)
    assert t.column("match").to_pylist() == ["V600E", "rs42"]
    assert t.column("norm").to_pylist() == ["p.V600E", "rs42"]
    assert t.column("mutation_type").to_pylist() == ["SUBSTITUTION", "DBSNP_MENTION"]


def test_mutation_step_group(ray_session, compiled_dicts):
    import ray.data as rd

    from kazu_ray.pipelines.config import PipelineConfig, build
    from kazu_ray.sources.interleave import docs_from_texts

    docs = docs_from_texts(
        ["KRAS c.1799T>A mutation detected.", "asthma c.1799T>A without any gene"]
    )
    out = build(docs, compiled_dicts, PipelineConfig.from_group("mutation", concurrency=1))
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    ents0 = {(e["match"], e["entity_class"]) for e in rows[0]["entities"]}
    assert ("c.1799T>A", "mutation") in ents0
    assert ("KRAS", "gene") in ents0
    # second doc has no gene entity -> condition skips the mutation scan
    assert ("c.1799T>A", "mutation") not in {
        (e["match"], e["entity_class"]) for e in rows[1]["entities"]
    }


def test_oracle_query_parity_small(ray_session, tmp_path):
    """End-to-end: the registered query vs its DuckDB oracle on a tiny
    documents table (same comparison the driver runs at sf0.01)."""
    import pandas as pd

    from kazu_ray.stages.mutation_ner import mutation_oracle_sql, q_mutation_mentions

    df = pd.DataFrame(
        {"doc_id": list(range(8)), "text": [f"filler text {i}" for i in range(8)]}
    )
    df.to_parquet(tmp_path / "documents.parquet")
    ray_out = q_mutation_mentions(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    sql_out = con.sql(mutation_oracle_sql()).df()
    pd.testing.assert_frame_equal(
        ray_out.reset_index(drop=True),
        sql_out.astype(ray_out.dtypes.to_dict()).reset_index(drop=True),
    )
    assert len(ray_out) > 0


def test_mutations_flat_matches_per_row_path():
    """The vectorized polars path must agree with the per-row `re` path
    (same pattern string, both leftmost-first) — including injection."""
    from kazu_ray.stages.mutation_ner import _inject, mutations_flat

    texts = [
        "V600E plus rs42 here",
        "Carrier of c.1799T>A and p.Val600Glu; also Arg97fs.",
        "deletion c.76_78delACT, insertion c.51_52insT, dup c.88dupA",
        "nothing to see",
        "IVS2+1G>A boundary rs7 edge rsX non-hit",
    ]
    batch = pa.table({"doc_id": list(range(5)), "text": texts})
    for inject in (False, True):
        fn = _inject if inject else None
        slow = mutations_batch(batch, text_fn=fn)
        fast = mutations_flat(batch, inject=inject)
        assert fast.column("doc_id").to_pylist() == slow.column("doc_id").to_pylist()
        assert fast.column("match").to_pylist() == slow.column("match").to_pylist()
        assert (
            fast.column("mutation_type").to_pylist()
            == slow.column("mutation_type").to_pylist()
        )
