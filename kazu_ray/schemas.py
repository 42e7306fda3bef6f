"""Arrow schemas for every table that flows through the engine.

The reference's Python object graph (Document/Section/Entity/Mapping,
/root/reference/kazu/data/data.py:104-371) becomes nested Arrow columns:
one row per document, spans and entities as list<struct> columns, so
every stage is a zero-copy ``map_batches`` over ``pyarrow`` batches and
whole-document semantics (abbreviation expansion, disambiguation,
overlap merge) stay row-local — no shuffle needed until triple
canonicalization.
"""

import pyarrow as pa

# ---- input: interleaved text + media documents (BASELINE.json input_hint)
SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# ---- link candidates attached to an entity (SynonymTermWithMetrics shape)
CANDIDATE_STRUCT = pa.struct(
    [
        ("parser_name", pa.string()),
        ("term_norm", pa.string()),
        ("search_score", pa.float32()),
        ("exact_match", pa.bool_()),
    ]
)

# ---- final grounding (Mapping shape, data.py:171-207)
MAPPING_STRUCT = pa.struct(
    [
        ("parser_name", pa.string()),
        ("source", pa.string()),
        ("idx", pa.string()),
        ("default_label", pa.string()),
        ("string_match_strategy", pa.string()),
        ("string_match_confidence", pa.string()),
        ("disambiguation_strategy", pa.string()),
        ("disambiguation_confidence", pa.string()),
        # non-empty when this mapping was fanned out from another parser's
        # grounding via the xref table (reference Mapping.xref_source_parser_name)
        ("xref_source_parser_name", pa.string()),
    ]
)

ENTITY_STRUCT = pa.struct(
    [
        ("span_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("match", pa.string()),
        ("match_norm", pa.string()),
        ("entity_class", pa.string()),
        ("namespace", pa.string()),
        ("mention_confidence", pa.int32()),
        ("candidates", pa.list_(CANDIDATE_STRUCT)),
        ("mappings", pa.list_(MAPPING_STRUCT)),
    ]
)

ENTITIES_COLUMN = pa.list_(ENTITY_STRUCT)

# ---- triples / graph tables
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("doc_id", pa.string()),
        ("confidence", pa.int32()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("n_docs", pa.int64()),
        ("confidence", pa.int32()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("curie", pa.string()),
        ("source", pa.string()),
        ("default_label", pa.string()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("namespace", pa.string()),
        ("match", pa.string()),
        ("entity_class", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("mapping_id", pa.string()),
    ]
)
