"""Rule-pattern NER stage — the SpacyNerStep analogue.

The reference's SpacyNerStep (kazu/steps/ner/spacy_ner.py:8-44) runs an
arbitrary spaCy pipeline over each section and turns ``doc.ents`` into
entities.  In this sandbox no statistical spaCy model is available, but
the *pipeline* contract the step actually depends on — "something that
yields labelled char spans over text" — is fully served by a rule
pipeline: spaCy's own EntityRuler deployment mode, where ``doc.ents``
come from token patterns.  ``PatternNer`` is that analogue: an
actor-pool ``map_batches`` stage whose model is a per-entity-class set
of Matcher token patterns (the same spaCy-subset syntax as the class
filter, functions/token_matcher.py) and/or phrase strings.

Matches become entities with char offsets, longest-match-wins overlap
resolution per class (spaCy ``util.filter_spans``), and NO candidates —
linking happens downstream in TfIdfLinker, mirroring how reference
spaCy-NER output flows into DictionaryEntityLinkingStep.  A statistical
model drops into the same seam: anything implementing
``pipe(text) -> [(start, end, entity_class)]`` can replace the rule
engine via the ``pipeline`` constructor argument.
"""

from __future__ import annotations

import pyarrow as pa

from ..constants import NS_PATTERN_NER, PROBABLE
from ..functions.normalize import normalize
from ..functions.token_matcher import MatchToken, TokenMatcher
from ..functions.tokens import tokenize
from ..schemas import ENTITIES_COLUMN


class RulePipeline:
    """EntityRuler-style rule model: entity_class -> token patterns."""

    def __init__(self, rules: dict[str, list]):
        self.matchers: dict[str, TokenMatcher] = {}
        for cls, pats in rules.items():
            compiled = []
            for p in pats:
                if isinstance(p, str):
                    # phrase shorthand -> one LOWER spec per token
                    compiled.append(
                        [{"LOWER": t.text.lower()} for t in tokenize(p)]
                    )
                else:
                    compiled.append(p)
            self.matchers[cls] = TokenMatcher(compiled)

    def pipe(self, text: str) -> list[tuple[int, int, str]]:
        raw_toks = tokenize(text)
        toks = [MatchToken(t.text, t.text.lower(), frozenset()) for t in raw_toks]
        out = []
        for cls, matcher in self.matchers.items():
            for i, j in matcher.find_spans(toks):
                out.append((raw_toks[i].start, raw_toks[j - 1].end, cls))
        return out


class PatternNer:
    """Actor-pool UDF: rule-pipeline NER over doc rows (merges with any
    entities already on the row, like TransformerNer)."""

    def __init__(self, rules: dict[str, list] | None = None, pipeline=None):
        if pipeline is None:
            pipeline = RulePipeline(rules or {})
        self.pipeline = pipeline

    def tag_span_text(self, text: str, span_idx: int) -> list[dict]:
        out = []
        for start, end, cls in self.pipeline.pipe(text):
            match = text[start:end]
            out.append(
                {
                    "span_idx": span_idx,
                    "start": start,
                    "end": end,
                    "match": match,
                    "match_norm": normalize(match, cls),
                    "entity_class": cls,
                    "namespace": NS_PATTERN_NER,
                    "mention_confidence": PROBABLE,
                    "candidates": [],
                    "mappings": [],
                }
            )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents_col = (
            batch.column("entities").to_pylist()
            if "entities" in batch.schema.names
            else [[] for _ in range(len(batch))]
        )
        new_col = []
        for spans, ents in zip(batch.column("spans").to_pylist(), ents_col):
            added = list(ents)
            for i, sp in enumerate(spans):
                if sp["text"]:
                    added.extend(self.tag_span_text(sp["text"], i))
            new_col.append(added)
        if "entities" in batch.schema.names:
            batch = batch.drop_columns(["entities"])
        return batch.append_column("entities", pa.array(new_col, type=ENTITIES_COLUMN))


# ------------------------------------------------------------- query surface

# Rules for the queryable surface, chosen so each is ALSO expressible as
# an RE2 regex over the space-separated corpus — the DuckDB oracle then
# checks the token-pattern engine cross-engine (same contract as the
# mutation NER oracle): single-token IN set, fixed bigram phrase, and a
# one-or-more quantifier whose longest-match-wins resolution equals
# greedy regex matching.
PATTERN_QUERY_RULES: dict[str, list] = {
    "operation": [[{"LOWER": {"IN": ["sort", "merge", "join"]}}]],
    "scan_phrase": [[{"LOWER": "table"}, {"LOWER": "scan"}]],
    "batch_run": [[{"LOWER": "batch", "OP": "+"}]],
}

_PATTERN_QUERY_SQL = {
    "operation": r"\b(?:sort|merge|join)\b",
    "scan_phrase": r"\btable scan\b",
    "batch_run": r"\bbatch(?: batch)*\b",
}

_MENTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("entity_class", pa.string()),
        ("match", pa.string()),
    ]
)


def _pattern_mentions_batch(batch: pa.Table) -> pa.Table:
    pipeline = RulePipeline(PATTERN_QUERY_RULES)
    rows = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        for start, end, cls in pipeline.pipe(text):
            rows.append(
                {"doc_id": doc_id, "entity_class": cls, "match": text[start:end]}
            )
    return pa.Table.from_pylist(rows, schema=_MENTIONS_SCHEMA)


def q_pattern_entities(sf_dir: str):
    """Flat (doc_id, entity_class, match) mention table over documents —
    the SpacyNerStep-analogue queryable surface."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_pattern_mentions_batch, batch_format="pyarrow").sort(
        ["doc_id", "entity_class", "match"]
    )


def pattern_oracle_sql() -> str:
    selects = "\n          UNION ALL ".join(
        f"SELECT doc_id, '{cls}' AS entity_class,"
        f" unnest(regexp_extract_all(text, '{rx}')) AS match FROM documents"
        for cls, rx in _PATTERN_QUERY_SQL.items()
    )
    return f"""
        SELECT doc_id, entity_class, match
        FROM ({selects})
        ORDER BY doc_id, entity_class, match
    """
