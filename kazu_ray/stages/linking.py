"""Fuzzy entity linking: attach ontology candidates to NER entities that
don't already carry exact-match candidates (i.e. transformer-NER output).

Re-realizes DictionaryEntityLinkingStep (reference
steps/linking/dictionary.py:14-83 + utils/link_index.py:72-123): queries
are deduplicated per batch by (match_norm, entity_class) exactly as the
reference groups them (:56-64), searched once against the per-parser
TF-IDF indices (exact short-circuit at 100), optionally confirmed by
embedding cosine (the SapBERT-style path, strategies.py:457-528 uses
0.60), and the results broadcast back to every entity in the group.

Actor state: per-parser TfIdfIndex + the embedder, built once per actor.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.similarity_scorers import DEFAULT_CLASS_SCORERS, apply_boolean_scorers
from ..schemas import ENTITIES_COLUMN
from ..state.embedder import default_embedder
from ..state.side_tables import load_synonyms
from ..state.tfidf import build_indices

TOP_N = 20  # reference conf/DictionaryEntityLinkingStep/default.yaml
# StrongMatch threshold: the reference uses 80 for its sklearn TF-IDF
# score distribution (strategies.py:393-454); the hashed-trigram index
# scores near-identical surface forms slightly lower, so 75 is the
# calibrated equivalent here (plural of an 8-char term ~ 79).
MIN_SCORE = 75.0
EMBED_CONFIRM = 0.60  # SapBERT confirmation threshold, strategies.py:457-528


class TfIdfLinker:
    def __init__(
        self,
        synonyms_path: str,
        skip_ner_namespaces: tuple[str, ...] = (),
        class_scorers: dict | None = None,
    ):
        self.synonyms = load_synonyms(synonyms_path)
        self.indices = build_indices(synonyms_path)
        # real-weights SapBERT analogue (tiny trained checkpoint through
        # the numpy-BERT forward) for fuzzy-hit confirmation
        self.embedder = default_embedder()
        # per-class boolean gates on fuzzy hits (reference
        # link_index.py:113-121 + conf/StringScorers/default.yaml)
        self.class_scorers = (
            DEFAULT_CLASS_SCORERS if class_scorers is None else class_scorers
        )
        # parsers grouped by the entity class they link
        self.parsers_by_class: dict[str, list[str]] = {}
        for (parser, _tn), rec in self.synonyms.items():
            lst = self.parsers_by_class.setdefault(rec.entity_class, [])
            if parser not in lst:
                lst.append(parser)
        self.skip_ner_namespaces = set(skip_ner_namespaces)

    def link_one(self, match: str, match_norm: str, entity_class: str) -> list[dict]:
        candidates: list[dict] = []
        scorers = self.class_scorers.get(entity_class, ())
        for parser in self.parsers_by_class.get(entity_class, ()):
            index = self.indices.get(parser)
            if index is None:
                continue
            for term_norm, score in index.query(match_norm, TOP_N):
                exact = term_norm == match_norm
                if not exact:
                    if score < MIN_SCORE:
                        continue
                    # boolean precision gates (NumberMatch / subtype /
                    # noun-modifier), applied to fuzzy hits only —
                    # reference link_index.py:113-121
                    if scorers and not apply_boolean_scorers(
                        scorers, match_norm, term_norm
                    ):
                        continue
                    # embedding confirmation for fuzzy hits
                    if self.embedder.similarity(match_norm, term_norm) < EMBED_CONFIRM:
                        continue
                candidates.append(
                    {
                        "parser_name": parser,
                        "term_norm": term_norm,
                        "search_score": float(score),
                        "exact_match": exact,
                    }
                )
        return candidates

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents_col = batch.column("entities").to_pylist()
        cache: dict[tuple[str, str], list[dict]] = {}
        new_col = []
        for ents in ents_col:
            new_ents = []
            for e in ents:
                if e["namespace"] not in self.skip_ner_namespaces:
                    key = (e["match_norm"], e["entity_class"])
                    if key not in cache:
                        cache[key] = self.link_one(e["match"], *key)
                    if cache[key]:
                        merged = (
                            merge_candidates(e["candidates"], cache[key])
                            if e["candidates"]
                            else cache[key]
                        )
                        e = {**e, "candidates": merged}
                new_ents.append(e)
            new_col.append(new_ents)
        batch = batch.drop_columns(["entities"])
        return batch.append_column("entities", pa.array(new_col, type=ENTITIES_COLUMN))


def merge_candidates(existing: list[dict], new: list[dict]) -> list[dict]:
    """Per-term metric merge (reference Entity.update_terms,
    data/data.py:340-349 + SynonymTermWithMetrics.merge_metrics): the
    same (parser, term_norm) candidate attached twice keeps the best of
    each metric instead of duplicating or overwriting."""
    by_key: dict[tuple[str, str], dict] = {
        (c["parser_name"], c["term_norm"]): dict(c) for c in existing
    }
    for c in new:
        k = (c["parser_name"], c["term_norm"])
        m = by_key.get(k)
        if m is None:
            by_key[k] = dict(c)
        else:
            m["search_score"] = max(m["search_score"], c["search_score"])
            m["exact_match"] = bool(m["exact_match"] or c["exact_match"])
    return list(by_key.values())
