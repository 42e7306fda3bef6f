"""Transformer NER machinery: windowing, BIO decode, suffix strip,
numerical-list splitting, and the TF-IDF linking stage."""

import numpy as np
import pytest

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
