"""String-match strategy ladder semantics (reference
mapping_strategies/strategies.py:281-528)."""

import pytest

from kazu_ray.constants import PROBABLE
from kazu_ray.stages.doc_post import MappingCascade


@pytest.fixture(scope="module")
def cascade(compiled_dicts):
    from kazu_ray.stages.doc_post import DocPostProcessor

    return DocPostProcessor(
        compiled_dicts.synonyms_path, compiled_dicts.metadata_path
    ).cascade


def _ent(match_norm, entity_class="gene", cands=()):
    return dict(
        span_idx=0, start=0, end=4, match=match_norm, match_norm=match_norm,
        entity_class=entity_class, namespace="t", mention_confidence=PROBABLE,
        candidates=list(cands), mappings=[],
    )


def cand(parser, term_norm, score=100.0, exact=False):
    return {"parser_name": parser, "term_norm": term_norm,
            "search_score": score, "exact_match": exact}


def test_symbols_match():
    m = MappingCascade._symbols_match
    assert m("MAP K 8", "MAPK8")
    assert m("MAPK8", "MAP K 8")
    assert not m("MAP K 8", "MAPK9")
    assert not m("MAP K", "MAPK8")  # leftover '8' unmatched


def test_ladder_prefers_exact(cascade):
    e = _ent("EGFR", cands=[
        cand("OT_TARGET", "EGFR", 100.0, exact=True),
        cand("OT_TARGET", "ERBB 2", 90.0, exact=False),
    ])
    sel, strategy, conf = cascade._select_terms(e, "OT_TARGET", e["candidates"])
    assert strategy == "ExactMatchMappingStrategy"
    assert [c["term_norm"] for c in sel] == ["EGFR"]


def test_ladder_symbol_match(cascade):
    # "TP 53" mention vs dictionary term "TP 53"? use a spaced variant:
    e = _ent("TP53")
    cands = [cand("OT_TARGET", "TP 53", 85.0, exact=False)]
    sel, strategy, _ = cascade._select_terms(e, "OT_TARGET", cands)
    assert strategy == "SymbolMatchMappingStrategy"


def test_ladder_substring(cascade):
    # "TESTIN gene" -> normalized "TESTIN GENE"; term "TESTIN" is a token
    e = _ent("TESTIN GENE")
    cands = [cand("OT_TARGET", "TESTIN", 70.0, exact=False)]
    sel, strategy, _ = cascade._select_terms(e, "OT_TARGET", cands)
    assert strategy == "TermNormIsSubStringMappingStrategy"


def test_ladder_strong_match_differential(cascade):
    e = _ent("MELANOMAS", entity_class="disease")
    cands = [
        cand("MONDO", "MELANOMA", 79.0, exact=False),
        cand("MONDO", "MALIGNANT MELANOMA", 76.0, exact=False),  # outside diff 2.0
    ]
    sel, strategy, _ = cascade._select_terms(e, "MONDO", cands)
    assert strategy == "StrongMatchWithEmbeddingConfirmationStringMatchingStrategy"
    assert [c["term_norm"] for c in sel] == ["MELANOMA"]


def test_ladder_no_match(cascade):
    e = _ent("XYZ")
    assert cascade._select_terms(e, "OT_TARGET", []) is None
