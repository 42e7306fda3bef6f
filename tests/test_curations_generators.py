"""Curated-term behaviours, global parser actions, synonym generators."""

import pandas as pd
import pytest

from kazu_ray.ontology.curations import (
    ADD_FOR_LINKING_ONLY,
    ADD_FOR_NER_AND_LINKING,
    DROP_SYNONYM_TERM_FOR_LINKING,
    IGNORE,
    CuratedTerm,
    ParserAction,
)
from kazu_ray.ontology.generate import (
    CombinatorialSynonymGenerator,
    DEFAULT_GENERATORS,
    ngram_hyphenation,
    separator_expansion,
    spelling_variation,
    stopword_remover,
)


# --- generators ------------------------------------------------------------


def test_separator_expansion():
    assert "NSCLC" in separator_expansion("NSCLC (non-small cell lung cancer)")
    assert separator_expansion("A/B ratio") == set()  # contains short parts
    assert {"alpha thalassemia", "beta thalassemia"} <= separator_expansion(
        "alpha thalassemia/beta thalassemia"
    )


def test_stopword_remover():
    assert stopword_remover("cancer of the lung") == {"cancer lung"}
    assert stopword_remover("melanoma") == set()


def test_spelling_variation():
    assert "hemophilia" in spelling_variation("haemophilia")
    assert "tumor" in spelling_variation("tumour")


def test_ngram_hyphenation():
    assert "non-small cell" in ngram_hyphenation("non small cell")
    assert "non small cell" in ngram_hyphenation("non-small cell")


def test_combinatorial():
    out = DEFAULT_GENERATORS("cancer of the lung")
    assert "cancer lung" in out
    assert "cancer of the lung" not in out


# --- behaviours / actions through the compile job --------------------------


@pytest.fixture(scope="module")
def curated_compile(ray_session, tmp_path_factory):
    from kazu_ray.ontology.compile import compile_dictionaries

    out = tmp_path_factory.mktemp("curated_dicts")
    return compile_dictionaries(
        str(out),
        curated_terms=[
            CuratedTerm("MONDO", "flu", behaviour=IGNORE),
            CuratedTerm("MONDO", "MS", behaviour=ADD_FOR_LINKING_ONLY),
            CuratedTerm("OT_TARGET", "NEU", behaviour=DROP_SYNONYM_TERM_FOR_LINKING),
            CuratedTerm("MONDO", "melanoma", behaviour=ADD_FOR_NER_AND_LINKING,
                        case_sensitive=True),
        ],
        parser_actions=[
            ParserAction("CHEMBL", frozenset({"CHEMBL192"}))  # drop sildenafil
        ],
    )


def test_ignore_removed_everywhere(curated_compile):
    from kazu_ray.state.side_tables import load_match_table, load_synonyms

    mt = load_match_table(curated_compile.curations_path)
    assert "flu" not in mt.by_surface
    syns = load_synonyms(curated_compile.synonyms_path)
    assert ("MONDO", "FLU") not in syns


def test_linking_only_not_in_ner(curated_compile):
    from kazu_ray.state.side_tables import load_match_table, load_synonyms

    mt = load_match_table(curated_compile.curations_path)
    assert "ms" not in mt.by_surface
    syns = load_synonyms(curated_compile.synonyms_path)
    assert ("MONDO", "MS") in syns  # still linkable


def test_drop_synonym_term_for_linking(curated_compile):
    from kazu_ray.state.side_tables import load_match_table, load_synonyms

    syns = load_synonyms(curated_compile.synonyms_path)
    assert ("OT_TARGET", "NEU") not in syns
    # the surface may still be matched by NER (behaviour only drops linking)
    mt = load_match_table(curated_compile.curations_path)
    assert "neu" in mt.by_surface


def test_curation_overrides_case(curated_compile):
    from kazu_ray.state.side_tables import load_match_table

    mt = load_match_table(curated_compile.curations_path)
    assert all(e.case_sensitive for e in mt.by_surface["melanoma"])


def test_parser_action_drops_ids(curated_compile):
    from kazu_ray.state.side_tables import load_metadata, load_synonyms

    syns = load_synonyms(curated_compile.synonyms_path)
    assert ("CHEMBL", "SILDENAFIL") not in syns
    meta = load_metadata(curated_compile.metadata_path)
    assert ("CHEMBL", "CHEMBL192") not in meta


def test_generators_through_compile(ray_session, tmp_path_factory):
    from kazu_ray.ontology.compile import compile_dictionaries
    from kazu_ray.state.side_tables import load_synonyms

    out = tmp_path_factory.mktemp("gen_dicts")
    d = compile_dictionaries(str(out), synonym_generators=DEFAULT_GENERATORS)
    syns = load_synonyms(d.synonyms_path)
    # spelling variant of "hemophilia A" generated and normalized
    assert any(
        "HAEMOPHILIA" in tn or "HEMOPHILIA" in tn
        for (p, tn) in syns
        if p == "MONDO"
    )


def test_verb_phrase_variants():
    """Reference VerbPhraseVariantGenerator semantics
    (synonym_generation.py:392-467) without the spaCy lemmatizer."""
    from kazu_ray.ontology.generate import make_verb_phrase_variants

    gen = make_verb_phrase_variants(
        ["{NOUN} {TARGET}", "{TARGET} in {NOUN}"],
        {"increase": ["increasing", "increased"]},
    )
    out = gen("blood pressure increased")
    assert "blood pressure increase" in out
    assert "blood pressure increasing" in out
    assert "increased in blood pressure" in out
    assert "increase in blood pressure" in out
    # no lemma match -> nothing generated
    assert gen("blood pressure high") == set()
    # bare lemma with no noun -> nothing
    assert gen("increase") == set()


def test_verb_phrase_in_combinatorial():
    from kazu_ray.ontology.generate import (
        CombinatorialSynonymGenerator,
        make_verb_phrase_variants,
    )

    gen = CombinatorialSynonymGenerator(
        [make_verb_phrase_variants(["{TARGET} of {NOUN}"], {"decrease": ["decreased"]})]
    )
    out = gen("appetite decreased")
    assert "decrease of appetite" in out


# ------------------------------------------------- ontology upgrade report

def test_upgrade_report_six_buckets(tmp_path):
    """One scenario per bucket, mirroring reference curation_report.py
    semantics (exact pass before case-insensitive pass; behaviour-set
    uniqueness gating auto-migration)."""
    from kazu_ray.ontology.curations import (
        CuratedTerm,
        upgrade_report,
        write_upgrade_report,
    )

    C = CuratedTerm
    existing = [
        C("p", "melanoma"),                                  # exact -> matched
        C("p", "EGFR", case_sensitive=True),                 # ci-only, single aspects -> modified
        C("p", "Asthma", behaviour="IGNORE"),                # ci-only, CONFLICTING aspects
        C("p", "Asthma", behaviour="ADD_FOR_NER_AND_LINKING"),
        C("p", "oldterm", source_term="old source"),         # gone -> obsolete
        C("p", "housebrand", additional_to_source=True),     # gone but manual -> extra
    ]
    incoming = [
        C("p", "melanoma"),
        C("p", "egfr"),
        C("p", "asthma"),
        C("p", "brandnew"),                                  # -> novel
    ]
    rep = upgrade_report(existing, incoming)
    assert rep.summary() == {
        "matched": 1, "modified": 1, "case_warnings": 1,
        "obsolete": 1, "extra": 1, "novel": 1,
    }
    # the migrated term keeps the incoming surface but the HUMAN aspects
    mod = next(iter(rep.modified))
    assert mod.curated_synonym == "egfr" and mod.case_sensitive is True
    assert "old source" in rep.obsolete
    assert next(iter(rep.novel)) == "brandnew"
    # exact match must pre-empt ci (reference pass order): the exactly
    # matched incoming term is eliminated; its distinct-cased twin is
    # NOVEL (the existing curation was already consumed by pass 1, so
    # nothing remains to migrate behaviours from)
    rep2 = upgrade_report([C("p", "BRCA1")], [C("p", "BRCA1"), C("p", "brca1")])
    assert rep2.summary()["matched"] == 1
    assert rep2.summary()["modified"] == 0
    assert rep2.summary()["novel"] == 1

    paths = write_upgrade_report(rep, str(tmp_path / "report"))
    import json, os
    assert os.path.exists(paths["novel"])
    lines = open(paths["modified"]).read().strip().splitlines()
    assert json.loads(lines[0])["curated_synonym"] == "egfr"
