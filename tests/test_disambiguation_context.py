"""Context-driven disambiguation additions (VERDICT r1 item 5):
Gilda-style per-ID context vectors and the opt-in
PreferNearestEmbeddingToDefaultLabel fallback — both resolving cases
that previously fell through to AMBIGUOUS."""

import pandas as pd
import pytest

from kazu_ray.constants import PROBABLE
from kazu_ray.functions.normalize import normalize


@pytest.fixture(scope="module")
def ambiguous_dicts(ray_session, tmp_path_factory):
    """Two diseases sharing the symbolic synonym PFIB7 -> the compile
    job keeps them as two separate equivalent-id sets (ambiguous)."""
    from kazu_ray.ontology.compile import compile_dictionaries

    rows = []
    for idx, label, syns in (
        ("D:1", "pulmonary fibrosis", ["pulmonary fibrosis", "PFIB7"]),
        ("D:2", "cystic fibrosis", ["cystic fibrosis", "PFIB7"]),
    ):
        for s in syns:
            rows.append(("P", idx, label, s, "lbl", "disease"))
    frame = pd.DataFrame(
        rows,
        columns=["parser_name", "idx", "default_label", "syn", "mapping_type", "entity_class"],
    )
    out = tmp_path_factory.mktemp("ambig")
    return compile_dictionaries(str(out), source_df=frame)


def _entity(match, entity_class="disease", cands=()):
    return dict(
        span_idx=0, start=0, end=len(match), match=match,
        match_norm=normalize(match, entity_class), entity_class=entity_class,
        namespace="t", mention_confidence=PROBABLE,
        candidates=list(cands), mappings=[],
    )


def _cand(parser, term_norm, score=100.0, exact=True):
    return {"parser_name": parser, "term_norm": term_norm,
            "search_score": score, "exact_match": exact}


def _spans(text):
    return [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]


def test_compile_emits_contexts_table(ambiguous_dicts):
    import pyarrow.parquet as pq

    assert ambiguous_dicts.contexts_path is not None
    ctx = {(r["parser_name"], r["idx"]): r["context"]
           for r in pq.read_table(ambiguous_dicts.contexts_path).to_pylist()}
    assert "cystic fibrosis" in ctx[("P", "D:2")]
    assert "PFIB7" in ctx[("P", "D:2")]


def _make_post(dicts, **kw):
    from kazu_ray.stages.doc_post import DocPostProcessor

    return DocPostProcessor(
        dicts.synonyms_path, dicts.metadata_path,
        contexts_path=dicts.contexts_path, **kw,
    )


def test_gilda_context_resolves_ambiguous(ambiguous_dicts):
    """Doc context mentioning cystic tissue selects D:2 via the per-ID
    context vectors; without contexts the same doc stays AMBIGUOUS."""
    post = _make_post(ambiguous_dicts)
    tn = normalize("PFIB7", "disease")
    e = _entity("PFIB7", cands=[_cand("P", tn)])
    spans = _spans("PFIB7 activity was elevated in cystic lung samples from fibrosis patients.")
    post.cascade.run(spans, [e])
    strategies = {m["disambiguation_strategy"] for m in e["mappings"]}
    assert "GildaTfIdfContext" in strategies or "ContextSimilarity" in strategies
    gilda_or_ctx = [m for m in e["mappings"]
                    if m["disambiguation_strategy"] in ("GildaTfIdfContext", "ContextSimilarity")]
    assert {m["idx"] for m in gilda_or_ctx} == {"D:2"}

    # control: no id_contexts AND a context too weak for ContextSimilarity
    from kazu_ray.stages.doc_post import DocPostProcessor

    bare = DocPostProcessor(ambiguous_dicts.synonyms_path, ambiguous_dicts.metadata_path)
    e2 = _entity("PFIB7", cands=[_cand("P", tn)])
    spans2 = _spans("PFIB7 activity was elevated in cystic lung samples.")
    bare.cascade.run(spans2, [e2])
    confs = {m["disambiguation_confidence"] for m in e2["mappings"]}
    gilda2 = {m["disambiguation_strategy"] for m in e2["mappings"]}
    assert "GildaTfIdfContext" not in gilda2


def test_gilda_delta_too_small_fails(ambiguous_dicts):
    """Ids whose contexts score within the delta must NOT resolve (gate,
    reference strategies.py:344-352): identical contexts -> exact tie."""
    post = _make_post(ambiguous_dicts)
    cascade = post.cascade
    cascade.id_contexts = {
        ("P", "D:1"): "fibrosis of the lung",
        ("P", "D:2"): "fibrosis of the lung",
    }
    cascade._ctx_vec_cache.clear()
    sets = [frozenset({("D:1", "P")}), frozenset({("D:2", "P")})]
    ctx_vec = cascade.embedder.encode("fibrosis")
    assert cascade._gilda_disambiguate("P", sets, ctx_vec) is None
    # and with a discriminating context it resolves
    cascade.id_contexts[("P", "D:2")] = "cystic fibrosis of the lung"
    cascade._ctx_vec_cache.clear()
    ctx_vec2 = cascade.embedder.encode("cystic tissue")
    assert cascade._gilda_disambiguate("P", sets, ctx_vec2) == frozenset({("D:2", "P")})


def test_prefer_nearest_embedding_fallback(ambiguous_dicts):
    """Opt-in strategy 5: a typo'd mention resolves to the nearest
    default label when everything else fails; off by default."""
    tn = normalize("PFIB7", "disease")
    on = _make_post(ambiguous_dicts, use_nearest_embedding_fallback=True)
    # no doc context at all -> strategies 2/2b skipped
    e = _entity("cystic fybrosis", cands=[_cand("P", tn)])
    on.cascade.run(_spans(""), [e])
    by_strategy = {m["disambiguation_strategy"]: m for m in e["mappings"]}
    assert "PreferNearestEmbeddingToDefaultLabel" in by_strategy
    assert by_strategy["PreferNearestEmbeddingToDefaultLabel"]["idx"] == "D:2"

    off = _make_post(ambiguous_dicts)
    e2 = _entity("cystic fybrosis", cands=[_cand("P", tn)])
    off.cascade.run(_spans(""), [e2])
    assert "PreferNearestEmbeddingToDefaultLabel" not in {
        m["disambiguation_strategy"] for m in e2["mappings"]
    }
