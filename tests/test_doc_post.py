"""Doc-local post-processing semantics: Schwartz–Hearst abbreviation
expansion, the disambiguation cascade, cleanup and overlap merge."""

import pytest

from kazu_ray.constants import HIGHLY_LIKELY, NS_ABBREV, POSSIBLE, PROBABLE
from kazu_ray.functions.tokens import tokenize
from kazu_ray.stages.doc_post import (
    backmatch_abbreviation,
    cleanup_entities,
    find_abbreviation_definitions,
    merge_overlapping,
)


@pytest.fixture(scope="module")
def post(compiled_dicts):
    from kazu_ray.stages.doc_post import DocPostProcessor

    return DocPostProcessor(compiled_dicts.synonyms_path, compiled_dicts.metadata_path)


@pytest.fixture(scope="module")
def ner(compiled_dicts):
    from kazu_ray.stages.dict_ner import DictionaryNer

    return DictionaryNer(compiled_dicts.curations_path, compiled_dicts.synonyms_path)


def run_doc(ner, post, texts):
    spans = [
        {"kind": "text", "text": t, "media_ref": "", "offset": 0} for t in texts
    ]
    ents = []
    for i, t in enumerate(texts):
        ents.extend(ner.match_span_text(t, i))
    return post.process_doc(spans, ents)


# --- Schwartz–Hearst -------------------------------------------------------


def test_backmatch_basic():
    toks = tokenize("the epidermal growth factor receptor")
    idx = backmatch_abbreviation(toks, "EGFR")
    assert toks[idx].text == "epidermal"


def test_backmatch_first_char_word_start():
    # first short char must start a word: "XYZ" can't match "wxyz tail"
    toks = tokenize("wxyz tail")
    assert backmatch_abbreviation(toks, "XZT") is None


def test_find_definitions():
    text = "Treatment of acute lymphoblastic leukemia (ALL) with chemotherapy."
    defs = find_abbreviation_definitions(tokenize(text), text)
    assert len(defs) == 1
    long_span, short_span, short_text = defs[0]
    assert text[long_span[0]:long_span[1]] == "acute lymphoblastic leukemia"
    assert short_text == "ALL"


def test_abbrev_override_copies_source(ner, post):
    out = run_doc(ner, post, ["epidermal growth factor receptor (EGFR) signaling."])
    egfr = [e for e in out if e["match"] == "EGFR"]
    assert len(egfr) == 1
    assert egfr[0]["namespace"] == NS_ABBREV
    assert egfr[0]["mention_confidence"] == HIGHLY_LIKELY
    assert {m["idx"] for m in egfr[0]["mappings"]} == {"ENSG00000146648"}


def test_abbrev_override_document_wide(ner, post):
    # definition in span 0; bare usage in span 1 is also overridden
    out = run_doc(
        ner, post,
        ["Alzheimer's disease (AD) progression.", "AD worsens with age."],
    )
    ads = [e for e in out if e["match"] == "AD"]
    assert len(ads) == 2
    assert all(m["idx"] == "MONDO_0004975" for e in ads for m in e["mappings"])


# --- cascade ---------------------------------------------------------------


def test_defined_elsewhere_disambiguation(ner, post):
    out = run_doc(ner, post, ["Expression of p27 in CDKN1B knockouts."])
    p27 = next(e for e in out if e["match"] == "p27")
    assert {m["idx"] for m in p27["mappings"]} == {"ENSG00000111276"}
    assert p27["mappings"][0]["disambiguation_strategy"] == "DefinedElsewhereInDocument"


def test_annotation_level_disambiguation(ner, post):
    out = run_doc(ner, post, ["Levels of p27 were measured."])
    p27 = next(e for e in out if e["match"] == "p27")
    assert {m["idx"] for m in p27["mappings"]} == {"ENSG00000111276"}
    assert p27["mappings"][0]["disambiguation_strategy"] == "AnnotationLevel"


def test_unresolvable_ambiguity_dropped(ner, post):
    out = run_doc(ner, post, ["The role of COX1 remains unclear."])
    cox1 = next(e for e in out if e["match"] == "COX1")
    # AMBIGUOUS mappings dropped by cleanup; PROBABLE entity survives unmapped
    assert cox1["mappings"] == []
    assert cox1["mention_confidence"] == PROBABLE


# --- cleanup ---------------------------------------------------------------


def _ent(**kw):
    base = dict(
        span_idx=0, start=0, end=4, match="x", match_norm="X",
        entity_class="gene", namespace="t", mention_confidence=PROBABLE,
        candidates=[], mappings=[],
    )
    base.update(kw)
    return base


def test_cleanup_drops_ambiguous_mappings_and_weak_unmapped():
    amb = {"parser_name": "p", "source": "s", "idx": "I1", "default_label": "l",
           "string_match_strategy": "e", "string_match_confidence": "HIGHLY_LIKELY",
           "disambiguation_strategy": "n", "disambiguation_confidence": "AMBIGUOUS"}
    ents = [
        _ent(mappings=[amb]),                      # -> unmapped, PROBABLE: kept
        _ent(mention_confidence=POSSIBLE),         # unmapped POSSIBLE: dropped
    ]
    out = cleanup_entities(ents)
    assert len(out) == 1 and out[0]["mappings"] == []


def test_cleanup_strips_uris():
    m = {"parser_name": "p", "source": "s",
         "idx": "http://purl.obolibrary.org/obo/MONDO_0004979",
         "default_label": "l", "string_match_strategy": "e",
         "string_match_confidence": "HIGHLY_LIKELY",
         "disambiguation_strategy": "n", "disambiguation_confidence": "PROBABLE"}
    out = cleanup_entities([_ent(mappings=[m])])
    assert out[0]["mappings"][0]["idx"] == "MONDO_0004979"


# --- overlap merge ---------------------------------------------------------


def test_merge_prefers_longest(compiled_dicts, ner, post):
    out = run_doc(ner, post, ["history of lung cancer confirmed."])
    matches = {e["match"] for e in out}
    assert "lung cancer" in matches
    assert "lung" not in matches and "cancer" not in matches


def test_merge_prefers_mapped():
    mapped = {"parser_name": "p", "source": "s", "idx": "I", "default_label": "l",
              "string_match_strategy": "e", "string_match_confidence": "HIGHLY_LIKELY",
              "disambiguation_strategy": "n", "disambiguation_confidence": "PROBABLE"}
    a = _ent(start=0, end=10, match="longer")                      # longer, unmapped
    b = _ent(start=0, end=6, match="short", mappings=[mapped])     # shorter, mapped
    out = merge_overlapping([a, b])
    assert len(out) == 1 and out[0]["match"] == "short"


def test_merge_separate_locations_kept():
    a = _ent(start=0, end=4)
    b = _ent(start=10, end=14)
    assert len(merge_overlapping([a, b])) == 2


def test_merge_transitive_overlap_one_location():
    # A overlaps B, B overlaps C, A doesn't overlap C -> one location
    a = _ent(start=0, end=5)
    b = _ent(start=4, end=9)
    c = _ent(start=8, end=12)
    assert len(merge_overlapping([a, b, c])) == 1
