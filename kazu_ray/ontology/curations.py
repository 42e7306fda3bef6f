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

from dataclasses import asdict, dataclass, field, replace

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
    # manually added on top of the ontology source (reference
    # CuratedTerm.additional_to_source) — upgrade reports bucket these
    # as 'extra' rather than 'obsolete' when the ontology drops them
    additional_to_source: bool = False
    # original ontology surface this curation was generated from, used
    # to group obsolete terms for review (reference source_term)
    source_term: str | None = None

    @property
    def control_aspects(self) -> tuple:
        """The human-decided behaviours a migration must preserve
        (reference CuratedTerm.control_aspects)."""
        return (self.behaviour, self.case_sensitive, self.mention_confidence)


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


# ------------------------------------------------------- upgrade report

@dataclass
class UpgradeReport:
    """Classification of an existing curation set against the terms of a
    NEW ontology version (reference utils/curation_report.py
    _OntologyUpgradeReport:48-180): six buckets driving the documented
    re-curation workflow."""

    matched: set[CuratedTerm] = field(default_factory=set)
    modified: set[CuratedTerm] = field(default_factory=set)
    case_warnings: dict[str, set[CuratedTerm]] = field(default_factory=dict)
    obsolete: dict[str, set[CuratedTerm]] = field(default_factory=dict)
    extra: set[CuratedTerm] = field(default_factory=set)
    novel: dict[str, set[CuratedTerm]] = field(default_factory=dict)

    def summary(self) -> dict[str, int]:
        return {
            "matched": len(self.matched),
            "modified": len(self.modified),
            "case_warnings": sum(len(v) for v in self.case_warnings.values()),
            "obsolete": sum(len(v) for v in self.obsolete.values()),
            "extra": len(self.extra),
            "novel": sum(len(v) for v in self.novel.values()),
        }


def upgrade_report(
    existing: list[CuratedTerm], incoming: list[CuratedTerm]
) -> UpgradeReport:
    """Reference two-pass semantics: exhaust every case-SENSITIVE match
    first (so case-insensitive matching cannot steal a term another
    curation already claimed), then classify the remainder:

    * exact synonym match              -> ``matched`` (keep as-is)
    * ci match, ONE behaviour set      -> ``modified`` (incoming term
      adopting the existing human behaviours)
    * ci match, conflicting behaviours -> ``case_warnings`` (recurate)
    * no match, additional_to_source   -> ``extra`` (manual add, keep)
    * no match otherwise               -> ``obsolete`` (grouped by
      source_term for review)
    * incoming never matched           -> ``novel`` (needs curation)
    """
    rep = UpgradeReport()
    inc_cs: dict[str, set[CuratedTerm]] = {}
    inc_ci: dict[str, set[CuratedTerm]] = {}
    for t in incoming:
        inc_cs.setdefault(t.curated_synonym, set()).add(t)
        inc_ci.setdefault(t.curated_synonym.lower(), set()).add(t)
    ex_cs: dict[str, set[CuratedTerm]] = {}
    for t in existing:
        ex_cs.setdefault(t.curated_synonym, set()).add(t)

    eliminated_ci: dict[str, set[CuratedTerm]] = {}
    remaining: dict[str, set[CuratedTerm]] = {}
    for surface, terms in ex_cs.items():
        hit = inc_cs.pop(surface, None)
        if hit is not None:
            rep.matched.update(terms)
            eliminated_ci.setdefault(surface.lower(), set()).update(hit)
        else:
            remaining[surface] = terms

    for surface, terms in remaining.items():
        hit_ci = inc_ci.pop(surface.lower(), None)
        if hit_ci is None:
            for t in terms:
                if t.additional_to_source:
                    rep.extra.add(t)
                else:
                    key = t.source_term or t.curated_synonym
                    rep.obsolete.setdefault(key, set()).add(t)
            continue
        unhandled = hit_ci - eliminated_ci.get(surface.lower(), set())
        if not unhandled:
            continue
        aspects = {t.control_aspects for t in terms}
        if len(aspects) == 1:
            behaviour, case_sensitive, conf = next(iter(aspects))
            for g in unhandled:
                rep.modified.add(
                    replace(
                        g,
                        behaviour=behaviour,
                        case_sensitive=case_sensitive,
                        mention_confidence=conf,
                    )
                )
        else:
            for g in unhandled:
                rep.case_warnings.setdefault(g.curated_synonym, set()).add(g)

    for lower, terms in inc_ci.items():
        unhandled = terms - eliminated_ci.get(lower, set())
        for t in unhandled:
            rep.novel.setdefault(t.curated_synonym, set()).add(t)
    return rep


def write_upgrade_report(rep: UpgradeReport, out_dir: str) -> dict[str, str]:
    """Reference-named jsonl outputs + instructions file
    (curation_report.py:23-44 filenames)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(name: str, terms) -> str:
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            for t in sorted(terms, key=lambda x: (x.parser_name, x.curated_synonym)):
                f.write(json.dumps(asdict(t)) + "\n")
        return path

    paths = {
        "migrated": dump("_migrated_terms.jsonl", rep.matched),
        "modified": dump("_modified_terms.jsonl", rep.modified),
        "case_warnings": dump(
            "_matched_terms_case_warnings.jsonl",
            {t for v in rep.case_warnings.values() for t in v},
        ),
        "obsolete": dump(
            "_obsolete_terms.jsonl", {t for v in rep.obsolete.values() for t in v}
        ),
        "extra": dump("_extra_ontology_terms.jsonl", rep.extra),
        "novel": dump(
            "_novel_terms.jsonl", {t for v in rep.novel.values() for t in v}
        ),
    }
    with open(os.path.join(out_dir, "README.txt"), "w") as f:
        f.write(
            "Ontology upgrade report: recurate *_case_warnings and "
            "*_novel files; obsolete files can be removed; migrated/"
            "modified/extra carry forward.\n"
            + json.dumps(rep.summary())
            + "\n"
        )
    return paths
