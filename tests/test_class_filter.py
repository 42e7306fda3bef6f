"""Rules-based entity-class disambiguation filter semantics
(reference rules_based_disambiguation.py:37-260)."""

import pytest

from kazu_ray.constants import PROBABLE
from kazu_ray.stages.class_filter import ClassDisambiguationFilter


def _ent(match, cls, span_idx=0, start=0):
    return dict(
        span_idx=span_idx, start=start, end=start + len(match), match=match,
        match_norm=match.upper(), entity_class=cls, namespace="t",
        mention_confidence=PROBABLE, candidates=[], mappings=[],
    )


def _spans(*texts):
    return [{"kind": "text", "text": t, "media_ref": "", "offset": 0} for t in texts]


MENTION_RULES = {
    "disease": {
        "MS": {"tp": ["sclerosis", "patient"], "fp": ["millisecond"]},
    }
}


def test_tp_hit_keeps():
    f = ClassDisambiguationFilter(mention_rules=MENTION_RULES)
    spans = _spans("MS patients showed improvement.")
    ents = [_ent("MS", "disease")]
    assert f.apply(spans, ents) == ents


def test_tp_miss_drops():
    f = ClassDisambiguationFilter(mention_rules=MENTION_RULES)
    spans = _spans("MS was discussed at length.")
    assert f.apply(spans, [_ent("MS", "disease")]) == []


def test_fp_hit_drops_even_with_tp():
    f = ClassDisambiguationFilter(mention_rules=MENTION_RULES)
    spans = _spans("MS patients: latency under one millisecond.")
    assert f.apply(spans, [_ent("MS", "disease")]) == []


def test_doc_wide_validation():
    # tp hit in ONE sentence validates the key everywhere in the doc
    f = ClassDisambiguationFilter(mention_rules=MENTION_RULES)
    spans = _spans("MS patients improved. Severity of MS varied.")
    ents = [_ent("MS", "disease", start=0),
            _ent("MS", "disease", start=34)]
    assert f.apply(spans, ents) == ents


def test_class_rules():
    f = ClassDisambiguationFilter(
        class_rules={"gene": {"tp": ["expression", "mutation"], "fp": None}}
    )
    spans = _spans("EGFR mutation detected.")
    kept = f.apply(spans, [_ent("EGFR", "gene"), _ent("flu", "disease")])
    assert len(kept) == 2  # gene validated; disease unconfigured -> untouched
    spans2 = _spans("EGFR is popular.")
    kept2 = f.apply(spans2, [_ent("EGFR", "gene"), _ent("flu", "disease")])
    assert [e["match"] for e in kept2] == ["flu"]


def test_no_rules_noop():
    f = ClassDisambiguationFilter()
    ents = [_ent("EGFR", "gene")]
    assert f.apply(_spans("anything"), ents) is ents


def test_through_doc_post(compiled_dicts):
    from kazu_ray.stages.dict_ner import DictionaryNer
    from kazu_ray.stages.doc_post import DocPostProcessor

    ner = DictionaryNer(compiled_dicts.curations_path, compiled_dicts.synonyms_path)
    post = DocPostProcessor(
        compiled_dicts.synonyms_path, compiled_dicts.metadata_path,
        mention_rules={"disease": {"influenza": {"tp": ["outbreak"], "fp": None}}},
    )
    spans = _spans("The influenza outbreak spread.")
    out = post.process_doc(spans, ner.match_span_text(spans[0]["text"], 0))
    assert any(e["match"] == "influenza" for e in out)
    spans2 = _spans("Questions about influenza remained.")
    out2 = post.process_doc(spans2, ner.match_span_text(spans2[0]["text"], 0))
    assert not any(e["match"] == "influenza" for e in out2)


# -- spaCy-Matcher-subset token patterns (reference conf rules port) --------


def test_token_matcher_engine():
    from kazu_ray.functions.token_matcher import TokenMatcher, annotate_tokens

    toks = annotate_tokens("Quality of life improved in 20 patients.", 0, [])
    m = TokenMatcher([[{"LOWER": "quality"}, {"LOWER": "of"}, {"LOWER": "life"}]])
    assert m(toks)
    # IN value spec
    m2 = TokenMatcher([[{"LOWER": {"IN": ["cells", "cell"]}}]])
    assert not m2(toks)
    # IS_DIGIT + quantifiers
    m3 = TokenMatcher([[{"IS_DIGIT": True}, {"LOWER": "patients"}]])
    assert m3(toks)
    m4 = TokenMatcher([[{"LOWER": "of"}, {"LOWER": "x", "OP": "?"}, {"LOWER": "life"}]])
    assert m4(toks)
    m5 = TokenMatcher([[{"LOWER": "quality"}, {"OP": "+"},
                        {"LOWER": "patients"}]])
    assert m5(toks)  # bare wildcard spec spans "of life improved in 20"
    m5b = TokenMatcher([[{"LOWER": "quality"}, {"IS_ALPHA": True, "OP": "+"},
                         {"LOWER": "patients"}]])
    assert not m5b(toks)  # the non-alpha "20" breaks the + run
    m6 = TokenMatcher([[{"LOWER": "improved"}, {"LOWER": "in", "OP": "*"},
                        {"IS_DIGIT": True}]])
    assert m6(toks)
    # unsupported syntax rejected at compile time
    with pytest.raises(ValueError):
        TokenMatcher([[{"LEMMA": "improve"}]])
    with pytest.raises(ValueError):
        TokenMatcher([[{"LOWER": "x", "OP": "{2}"}]])


def test_token_matcher_entity_class_extension():
    from kazu_ray.functions.token_matcher import TokenMatcher, annotate_tokens

    text = "HEK293 cells were transfected."
    ents = [_ent("HEK293", "cell_line", start=0)]
    toks = annotate_tokens(text, 0, ents)
    # reference cell_line tp rule: entity token followed by cell/cells
    m = TokenMatcher([[{"_": {"cell_line": True}},
                       {"LOWER": {"IN": ["cell", "cells"]}}]])
    assert m(toks)
    assert not m(annotate_tokens("HEK293 was profiled.", 0,
                                 [_ent("HEK293", "cell_line", start=0)]))


CELL_LINE_CLASS_RULES = {
    # direct port of conf/RulesBasedEntityClassDisambiguationFilterStep/
    # default.yaml cell_line tp patterns
    "cell_line": {
        "tp": [
            [{"_": {"cell_line": True}}, {"LOWER": {"IN": ["cell", "cells"]}}],
            [{"LOWER": "cell"}, {"LOWER": "line"}, {"_": {"cell_line": True}}],
            [{"LOWER": "cell"}, {"LOWER": "type"}, {"_": {"cell_line": True}}],
        ],
        "fp": None,
    }
}


def test_class_rules_as_token_patterns():
    f = ClassDisambiguationFilter(class_rules=CELL_LINE_CLASS_RULES)
    spans = _spans("HEK293 cells were grown overnight.")
    ents = [_ent("HEK293", "cell_line")]
    assert f.apply(spans, ents) == ents
    spans2 = _spans("The cell line HEK293 was used.")
    ents2 = [_ent("HEK293", "cell_line", start=14)]
    assert f.apply(spans2, ents2) == ents2
    # no validating context anywhere in the doc -> dropped
    spans3 = _spans("HEK293 was discussed in passing.")
    assert f.apply(spans3, [_ent("HEK293", "cell_line")]) == []


def test_fp_token_pattern_with_optional_op():
    # reference anatomy fp rule: quality -?) of -?) <anatomy>(life)
    f = ClassDisambiguationFilter(class_rules={
        "anatomy": {
            "tp": None,
            "fp": [[{"LOWER": "quality"}, {"LOWER": "-", "OP": "?"},
                    {"LOWER": "of"}, {"LOWER": "-", "OP": "?"},
                    {"_": {"anatomy": True}, "LOWER": "life"}]],
        }
    })
    spans = _spans("Quality of life was the endpoint.")
    ents = [_ent("life", "anatomy", start=11)]
    assert f.apply(spans, ents) == []
    # same mention, no fp context -> kept
    spans2 = _spans("The life cycle of the parasite.")
    ents2 = [_ent("life", "anatomy", start=4)]
    assert f.apply(spans2, ents2) == ents2


def test_mention_rules_mixed_phrase_and_pattern():
    f = ClassDisambiguationFilter(mention_rules={
        "disease": {
            "MS": {"tp": ["sclerosis", [{"LOWER": "patients"}]],
                   "fp": [[{"NORM": "millisecond"}]]},
        }
    })
    spans = _spans("MS patients improved.")
    ents = [_ent("MS", "disease")]
    assert f.apply(spans, ents) == ents
    spans2 = _spans("Latency of MS under one millisecond.")
    assert f.apply(spans2, [_ent("MS", "disease", start=11)]) == []
