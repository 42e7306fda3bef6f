"""Boolean + fuzz similarity scorers (VERDICT r1 item 4): semantics
ported from reference kazu/tests/test_string_similarity_scorers.py,
plus the linking-stage integration gate."""

import pytest

from kazu_ray.functions.normalize import normalize
from kazu_ray.functions.similarity_scorers import (
    DEFAULT_CLASS_SCORERS,
    EntityNounModifierScorer,
    entity_subtype_scorer,
    fuzz_scorer,
    number_match_scorer,
    partial_ratio,
    ratio,
    token_set_ratio,
    token_sort_ratio,
    wratio,
)


@pytest.mark.parametrize(
    ("scorer", "ent_match", "matching", "not_matching"),
    (
        (
            entity_subtype_scorer,
            "diabetes, type 2",
            ["type II diabetes", "type 2 diabetes"],
            ["type I diabetes", "type 1 diabetes"],
        ),
        (number_match_scorer, "MAP1LC3A gene", ["MAP1LC3A"], ["MAP2LC3A"]),
        (
            EntityNounModifierScorer(["LIKE"]),
            "CPI17 like",
            ["CPI17-like"],
            ["CPI17"],
        ),
        (
            EntityNounModifierScorer(["PSEUDOGENE"]),
            "CPI17",
            ["CPI17"],
            ["CPI17 pseudogene"],
        ),
        (
            EntityNounModifierScorer(["RECEPTOR"]),
            "EGF receptor",
            ["epidermal growth factor receptor"],
            ["epidermal growth factor"],
        ),
    ),
)
def test_boolean_scorer(scorer, ent_match, matching, not_matching):
    ref = normalize(ent_match)
    for m in matching:
        assert scorer(ref, normalize(m)), (ent_match, m)
    for m in not_matching:
        assert not scorer(ref, normalize(m)), (ent_match, m)


def test_subtype_scorer_keeps_unsubtyped_reference():
    # 'DIABETES' alone must keep typed candidates for later context
    # disambiguation (reference :54-63 comment)
    assert entity_subtype_scorer(normalize("diabetes"), normalize("type II diabetes"))


def test_fuzz_ratios_basic():
    assert ratio("abc", "abc") == 100.0
    assert ratio("abc", "xyz") == 0.0
    assert token_sort_ratio("cancer bowel", "bowel cancer") == 100.0
    assert token_set_ratio("bowel cancer", "cancer of the bowel cancer") > 80.0
    assert partial_ratio("cancer", "bowel cancer") == 100.0
    assert 0.0 < wratio("bowels cancer", "bowel cancer") <= 100.0


def test_fuzz_scorer_reference_case():
    # reference test_RapidFuzzStringSimilarityScorer
    assert fuzz_scorer(normalize("bowels cancer"), normalize("bowel cancer")) > 0.0
    # long multi-token reference routes through token_sort_ratio
    long_ref = normalize("protein phosphatase one regulatory inhibitor subunit")
    assert fuzz_scorer(long_ref, long_ref) == 100.0


def test_linker_boolean_gate_filters_number_mismatch(ray_session, tmp_path):
    """Fuzzy linking drops candidates whose numbers mismatch the mention
    (reference link_index.py:113-121): MAP1LC3A-like query must not
    surface the MAP2LC3A synonym even though the trigram score is high."""
    import pandas as pd

    from kazu_ray.ontology.compile import compile_dictionaries
    from kazu_ray.stages.linking import TfIdfLinker

    rows = []
    for idx, label in (
        ("M:1", "type 2 diabetes mellitus"),
        ("M:2", "type 1 diabetes mellitus"),
    ):
        rows.append(("MONDO_TEST", idx, label, label, "lbl", "disease"))
    frame = pd.DataFrame(
        rows,
        columns=["parser_name", "idx", "default_label", "syn", "mapping_type", "entity_class"],
    )
    out = compile_dictionaries(str(tmp_path / "d"), source_df=frame)
    query = "diabetes mellitus type 2 condition"  # fuzzy: extra token
    match_norm = normalize(query, "disease")
    wrong = normalize("type 1 diabetes mellitus", "disease")
    right = normalize("type 2 diabetes mellitus", "disease")
    gated = {
        c["term_norm"]
        for c in TfIdfLinker(out.synonyms_path).link_one(query, match_norm, "disease")
    }
    assert right in gated and wrong not in gated
    # layered defense: even without the boolean gate, the real-weights
    # embedding confirmation now ALSO rejects the number mismatch
    embed_only = {
        c["term_norm"]
        for c in TfIdfLinker(out.synonyms_path, class_scorers={}).link_one(
            query, match_norm, "disease"
        )
    }
    assert wrong not in embed_only

    # isolate the boolean gate: with a permissive embedder and no
    # scorers the number-mismatched candidate WOULD surface
    class _Permissive:
        def similarity(self, a, b):
            return 1.0

    linker = TfIdfLinker(out.synonyms_path, class_scorers={})
    linker.embedder = _Permissive()
    ungated = {c["term_norm"] for c in linker.link_one(query, match_norm, "disease")}
    assert wrong in ungated
    assert DEFAULT_CLASS_SCORERS["gene"] and DEFAULT_CLASS_SCORERS["disease"]


def test_merge_candidates_metric_merge():
    """Entity.update_terms parity (reference data.py:340-349): same term
    twice keeps best-of-each-metric, distinct terms accumulate."""
    from kazu_ray.stages.linking import merge_candidates

    existing = [{"parser_name": "P", "term_norm": "T", "search_score": 80.0, "exact_match": False}]
    new = [
        {"parser_name": "P", "term_norm": "T", "search_score": 100.0, "exact_match": True},
        {"parser_name": "P", "term_norm": "U", "search_score": 77.0, "exact_match": False},
    ]
    out = {(c["parser_name"], c["term_norm"]): c for c in merge_candidates(existing, new)}
    assert len(out) == 2
    assert out[("P", "T")]["search_score"] == 100.0
    assert out[("P", "T")]["exact_match"] is True
    assert out[("P", "U")]["search_score"] == 77.0


def test_tfidf_frozen_score_vectors():
    """Pin the hashed-trigram TF-IDF score distribution that justifies
    MIN_SCORE=75 (linking.py) vs the reference's 80: inflected variants
    of vocab terms land in [MIN_SCORE, 100), unrelated strings below
    MIN_SCORE.  The exact frozen values keep the index from drifting
    silently (hash fn, idf formula, normalization are all covered)."""
    from kazu_ray.stages.linking import MIN_SCORE
    from kazu_ray.state.tfidf import TfIdfIndex

    vocab = sorted(
        {"melanoma", "asthma", "aspirin", "diabetes", "leukemia",
         "carcinoma", "sarcomas", "fibrosis", "erlotinib", "gefitinib"}
    )
    idx = TfIdfIndex(vocab)
    frozen = {
        "melanomas": ("melanoma", 83.481),
        "asthmatic": ("asthma", 94.613),
        "aspirins": ("aspirin", 92.263),
        "diabete": ("diabetes", 86.603),
        "leukemias": ("leukemia", 90.051),
        "carcinomas": ("carcinoma", 84.588),
        "fibrosi": ("fibrosis", 86.603),
    }
    for q, (want_term, want_score) in frozen.items():
        (term, score), *_ = idx.query(q, 3)
        assert term == want_term, q
        assert abs(score - want_score) < 0.01, (q, score)
        assert MIN_SCORE <= score < 100.0
    # second-best hits are well below the threshold (the gate separates)
    for q in ("melanomas", "carcinomas"):
        rest = idx.query(q, 3)[1:]
        assert all(s < MIN_SCORE for _t, s in rest)
    assert idx.query("random junk", 3) == []
    # exact match short-circuits at exactly 100
    assert idx.query("melanoma", 3) == [("melanoma", 100.0)]
