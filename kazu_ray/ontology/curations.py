"""Curated-term behaviours and global parser actions.

Data-driven control of NER/linking per surface form, mirroring the
reference's CuratedTerm / GlobalParserActions machinery
(/root/reference/kazu/data/data.py:826-913, 916-1062; applied in
ontology_preprocessing/base.py:363-524):

- ``IGNORE``: surface form neither matched (NER) nor linkable;
- ``ADD_FOR_NER_AND_LINKING``: default for autocurated forms;
- ``ADD_FOR_LINKING_ONLY``: not matched by NER, but its term_norm stays
  in the synonym table (e.g. dangerous short forms);
- ``DROP_SYNONYM_TERM_FOR_LINKING``: the whole term_norm record is
  removed from the synonym table for that parser;
- ``DROP_IDS_FROM_PARSER`` (global parser action): erase ids from a
  parser's synonym frame + metadata before compile.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

IGNORE = "IGNORE"
ADD_FOR_NER_AND_LINKING = "ADD_FOR_NER_AND_LINKING"
ADD_FOR_LINKING_ONLY = "ADD_FOR_LINKING_ONLY"
DROP_SYNONYM_TERM_FOR_LINKING = "DROP_SYNONYM_TERM_FOR_LINKING"

BEHAVIOURS = {
    IGNORE,
    ADD_FOR_NER_AND_LINKING,
    ADD_FOR_LINKING_ONLY,
    DROP_SYNONYM_TERM_FOR_LINKING,
}


@dataclass(frozen=True)
class CuratedTerm:
    parser_name: str
    curated_synonym: str
    behaviour: str = ADD_FOR_NER_AND_LINKING
    case_sensitive: bool | None = None  # None -> keep autocuration default
    mention_confidence: int | None = None


@dataclass(frozen=True)
class ParserAction:
    """Currently only DROP_IDS_FROM_PARSER (reference data.py:842-913)."""

    parser_name: str
    ids: frozenset[str] = field(default_factory=frozenset)
    action: str = "DROP_IDS_FROM_PARSER"


def apply_parser_actions(
    syn_df: pd.DataFrame, meta_df: pd.DataFrame, actions: list[ParserAction]
) -> tuple[pd.DataFrame, pd.DataFrame]:
    for act in actions:
        if act.action != "DROP_IDS_FROM_PARSER":
            raise ValueError(f"unknown parser action {act.action}")
        mask = (syn_df["parser_name"] == act.parser_name) & syn_df["idx"].isin(act.ids)
        syn_df = syn_df[~mask]
        mmask = (meta_df["parser_name"] == act.parser_name) & meta_df["idx"].isin(act.ids)
        meta_df = meta_df[~mmask]
    return syn_df.reset_index(drop=True), meta_df.reset_index(drop=True)


def apply_curations(
    syn_df: pd.DataFrame,
    ner_curations: pd.DataFrame,
    curated: list[CuratedTerm],
    term_norm_of,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Apply curated-term behaviours.

    :param syn_df: long-thin synonym frame (linking side)
    :param ner_curations: autocuration output (NER match table source)
    :param term_norm_of: fn(surface, entity_class) -> term_norm
    :return: (filtered syn_df, adjusted ner_curations)
    """
    for c in curated:
        if c.behaviour not in BEHAVIOURS:
            raise ValueError(f"unknown behaviour {c.behaviour}")
        ner_mask = (ner_curations["parser_name"] == c.parser_name) & (
            ner_curations["curated_synonym"] == c.curated_synonym
        )
        if c.behaviour in (IGNORE, ADD_FOR_LINKING_ONLY):
            ner_curations = ner_curations[~ner_mask]
        if c.behaviour in (IGNORE, DROP_SYNONYM_TERM_FOR_LINKING):
            # remove the whole normalized record for this parser
            classes = syn_df.loc[syn_df["parser_name"] == c.parser_name, "entity_class"]
            ec = classes.iloc[0] if len(classes) else None
            tn = term_norm_of(c.curated_synonym, ec)
            norms = [term_norm_of(s, e) for s, e in zip(syn_df["syn"], syn_df["entity_class"])]
            syn_df = syn_df[
                ~((syn_df["parser_name"] == c.parser_name) & (pd.Series(norms, index=syn_df.index) == tn))
            ]
        if c.behaviour == ADD_FOR_NER_AND_LINKING and ner_mask.any():
            if c.case_sensitive is not None:
                ner_curations.loc[ner_mask, "case_sensitive"] = c.case_sensitive
            if c.mention_confidence is not None:
                ner_curations.loc[ner_mask, "mention_confidence"] = c.mention_confidence
    return syn_df.reset_index(drop=True), ner_curations.reset_index(drop=True)
