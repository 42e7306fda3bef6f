"""Dictionary NER + exact linking: the joint string-matching stage.

Re-realizes the reference's ahocorasick step
(/root/reference/kazu/steps/joint_ner_and_linking/
memory_efficient_string_matching.py:26-191) as a Ray Data actor-pool
``map_batches`` stage.  Instead of a char-level automaton walked in
Python, matching is a token-n-gram hash join: tokenize once per span
(C-speed regex), then probe the broadcast surface-form dict only at
positions whose lowercased token is a known dictionary first-token.
Word-boundary validity is guaranteed by construction (candidates are
token-aligned), exactly the semantics the reference backfills via its
custom tokenizer (:97-100, 181-186); case-sensitivity and cross-parser
max-confidence resolution follow :102-106 and :152-175.

State (match table + synonym records) is built once per actor in
``__init__`` from the compiled parquet side tables.
"""

from __future__ import annotations

import pyarrow as pa

from ..constants import NS_DICT_NER
from ..functions.normalize import normalize
from ..functions.tokens import tokenize
from ..schemas import DOCS_SCHEMA, ENTITIES_COLUMN
from ..state.side_tables import load_match_table, load_synonyms


class DictionaryNer:
    """Actor-pool UDF: adds an ``entities`` list<struct> column to doc rows.

    The ``spans`` column passes through untouched (per-row span-sequence
    invariant).
    """

    def __init__(self, curations_path: str, synonyms_path: str):
        self.table = load_match_table(curations_path)
        self.synonyms = load_synonyms(synonyms_path)

    def match_span_text(self, text: str, span_idx: int, toks=None) -> list[dict]:
        if toks is None:
            toks = tokenize(text)
        ltext = text.lower()  # one pass; probe keys are slices of this
        if len(ltext) != len(text):  # rare unicode case-fold length change
            ltext = "".join(c.lower()[0] if c.lower() else c for c in text)
        lowered = [ltext[t.start:t.end] for t in toks]
        n_toks = len(toks)
        by_surface = self.table.by_surface
        first = self.table.first_tokens
        max_n = self.table.max_tokens
        found: list[dict] = []
        for i in range(n_toks):
            if lowered[i] not in first:
                continue
            start = toks[i].start
            for n in range(1, min(max_n, n_toks - i) + 1):
                end = toks[i + n - 1].end
                entries = by_surface.get(ltext[start:end])
                if not entries:
                    continue
                surface = text[start:end]
                # group by entity class; resolve confidence as max across
                # parsers; drop case-sensitive entries on case mismatch
                by_class: dict[str, list] = {}
                for e in entries:
                    if e.case_sensitive and surface != e.original_case:
                        continue
                    by_class.setdefault(e.entity_class, []).append(e)
                for entity_class, class_entries in by_class.items():
                    candidates = []
                    seen: set[tuple[str, str]] = set()
                    for e in class_entries:
                        key = (e.parser_name, e.term_norm)
                        if key in seen or key not in self.synonyms:
                            continue
                        seen.add(key)
                        candidates.append(
                            {
                                "parser_name": e.parser_name,
                                "term_norm": e.term_norm,
                                "search_score": 100.0,
                                "exact_match": True,
                            }
                        )
                    if not candidates:
                        continue
                    found.append(
                        {
                            "span_idx": span_idx,
                            "start": start,
                            "end": end,
                            "match": surface,
                            "match_norm": normalize(surface, entity_class),
                            "entity_class": entity_class,
                            "namespace": NS_DICT_NER,
                            "mention_confidence": max(
                                e.mention_confidence for e in class_entries
                            ),
                            "candidates": candidates,
                            "mappings": [],
                        }
                    )
        return found

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        errors = (
            batch.column("error").to_pylist()
            if "error" in batch.schema.names
            else [None] * len(batch)
        )
        entities_per_doc: list[list[dict]] = []
        for spans, err in zip(spans_col, errors):
            ents: list[dict] = []
            if err is None:
                for span_idx, span in enumerate(spans):
                    if span["text"]:
                        ents.extend(self.match_span_text(span["text"], span_idx))
            entities_per_doc.append(ents)
        ents_arr = pa.array(entities_per_doc, type=ENTITIES_COLUMN)
        if "entities" in batch.schema.names:
            batch = batch.drop_columns(["entities"])
        return batch.append_column("entities", ents_arr)
