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
