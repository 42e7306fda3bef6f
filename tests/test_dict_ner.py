"""Dictionary NER semantics vs the reference string-matching step
(memory_efficient_string_matching.py:97-191)."""

import pytest


@pytest.fixture(scope="module")
def ner(compiled_dicts):
    from kazu_ray.stages.dict_ner import DictionaryNer

    return DictionaryNer(compiled_dicts.curations_path, compiled_dicts.synonyms_path)


def ents(ner, text):
    return ner.match_span_text(text, 0)


def test_simple_gene(ner):
    out = ents(ner, "EGFR is a gene")
    assert any(e["match"] == "EGFR" and e["entity_class"] == "gene" for e in out)
    e = next(e for e in out if e["match"] == "EGFR")
    assert e["start"] == 0 and e["end"] == 4
    assert e["candidates"][0]["parser_name"] == "OT_TARGET"
    assert e["candidates"][0]["exact_match"] is True


def test_case_insensitive_long_form(ner):
    out = ents(ner, "patients with non-small cell lung cancer respond")
    assert any(e["match"] == "non-small cell lung cancer" for e in out)


def test_case_sensitive_trap(ner):
    # "ALL" is a case-sensitive curation; lowercase must not match
    assert not any(e["match"] == "all" for e in ents(ner, "all patients responded"))
    out = ents(ner, "diagnosed with ALL last year")
    assert any(e["match"] == "ALL" and e["entity_class"] == "disease" for e in out)


def test_word_boundary(ner):
    # "EGFR" inside the single token "EGFR-positive" is not boundary-valid
    # (the reference tokenizer does not split hyphens)
    out = ents(ner, "the EGFR-positive cohort")
    assert not any(e["match"] == "EGFR" for e in out)
    # but "IL-6" is itself a dictionary surface form containing a hyphen
    out = ents(ner, "elevated IL-6 levels")
    assert any(e["match"] == "IL-6" for e in out)


def test_nested_matches_all_emitted(ner):
    # nested entities are all emitted (merge happens later)
    out = ents(ner, "history of lung cancer in family")
    matches = {e["match"] for e in out}
    assert {"lung cancer", "lung", "cancer"} <= matches


def test_ambiguous_candidates(ner):
    out = ents(ner, "expression of p27 was high")
    e = next(e for e in out if e["match"] == "p27")
    assert e["match_norm"] == "P 27"
    assert len(e["candidates"]) == 1  # one (parser, term_norm) candidate


def test_sentence_end_period(ner):
    out = ents(ner, "He was diagnosed with melanoma.")
    e = next(e for e in out if e["match"] == "melanoma")
    assert e["end"] == len("He was diagnosed with melanoma")
