"""Rule-pipeline NER stage (SpacyNerStep analogue).

Reference: kazu/steps/ner/spacy_ner.py:8-44 turns an arbitrary spaCy
pipeline's ``doc.ents`` into entities; the EntityRuler deployment mode of
that contract is token-pattern rules, which PatternNer implements over
our offset-preserving tokenizer (functions/token_matcher.py)."""

import pyarrow as pa
import pytest

from kazu_ray.functions.token_matcher import TokenMatcher, annotate_tokens
from kazu_ray.stages.pattern_ner import PatternNer, RulePipeline


def _toks(text):
    return annotate_tokens(text, 0, [])


def test_find_spans_quantifiers():
    m = TokenMatcher(
        [[{"LOWER": "growth"}, {"IS_ALPHA": True, "OP": "*"}, {"LOWER": "receptor"}]]
    )
    toks = _toks("epidermal growth factor receptor pathway")
    assert m.find_spans(toks) == [(1, 4)]


def test_find_spans_plus_requires_one():
    m = TokenMatcher([[{"LOWER": "type"}, {"IS_DIGIT": True, "OP": "+"}]])
    assert m.find_spans(_toks("type 2 diabetes")) == [(0, 2)]
    assert m.find_spans(_toks("type of diabetes")) == []


def test_find_spans_longest_match_wins():
    # two patterns, the longer hit should suppress the nested shorter one
    m = TokenMatcher([[{"LOWER": "breast"}], [{"LOWER": "breast"}, {"LOWER": "cancer"}]])
    assert m.find_spans(_toks("metastatic breast cancer")) == [(1, 3)]


def test_find_spans_greedy_takes_max_end():
    m = TokenMatcher([[{"LOWER": "acute"}, {"IS_ALPHA": True, "OP": "*"}]])
    toks = _toks("acute myeloid leukemia today")
    assert m.find_spans(toks) == [(0, 4)]


def test_find_spans_non_overlapping_left_to_right():
    m = TokenMatcher([[{"IS_ALPHA": True}, {"IS_ALPHA": True}]])
    # ties in length resolve to earlier start; remaining hits must not overlap
    assert m.find_spans(_toks("a b c d e")) == [(0, 2), (2, 4)]


def test_rule_pipeline_phrase_shorthand_char_offsets():
    rp = RulePipeline({"disease": ["breast cancer"], "drug": ["aspirin"]})
    text = "Aspirin for early breast cancer."
    got = {(text[s:e], c) for s, e, c in rp.pipe(text)}
    assert got == {("Aspirin", "drug"), ("breast cancer", "disease")}


def test_pattern_ner_udf_merges_existing_entities():
    ner = PatternNer(
        rules={"disease": [[{"LOWER": "asthma"}]], "drug": ["aspirin"]}
    )
    prior = {
        "span_idx": 0,
        "start": 0,
        "end": 3,
        "match": "Old",
        "match_norm": "OLD",
        "entity_class": "disease",
        "namespace": "DictionaryNER",
        "mention_confidence": 100,
        "candidates": [],
        "mappings": [],
    }
    batch = pa.table(
        {
            "doc_id": ["d1"],
            "spans": [
                [
                    {"kind": "text", "text": "Asthma was treated.", "media_ref": "", "offset": 0},
                    {"kind": "text", "text": "We used aspirin.", "media_ref": "", "offset": 0},
                ]
            ],
            "entities": pa.array(
                [[prior]],
                type=pa.list_(
                    pa.struct(
                        [
                            ("span_idx", pa.int32()),
                            ("start", pa.int32()),
                            ("end", pa.int32()),
                            ("match", pa.string()),
                            ("match_norm", pa.string()),
                            ("entity_class", pa.string()),
                            ("namespace", pa.string()),
                            ("mention_confidence", pa.int32()),
                            ("candidates", pa.list_(pa.struct([("parser_name", pa.string())]))),
                            ("mappings", pa.list_(pa.struct([("parser_name", pa.string())]))),
                        ]
                    )
                ),
            ),
        }
    )
    out = ner(batch)
    ents = out.column("entities").to_pylist()[0]
    got = {(e["match"], e["entity_class"], e["span_idx"], e["namespace"]) for e in ents}
    assert ("Old", "disease", 0, "DictionaryNER") in got
    assert ("Asthma", "disease", 0, "PatternNER") in got
    assert ("aspirin", "drug", 1, "PatternNER") in got
    # char offsets are span-local
    a = next(e for e in ents if e["match"] == "aspirin")
    assert (a["start"], a["end"]) == (8, 15)
    assert a["match_norm"]  # normalizer ran


def test_pattern_ner_step_group_links_entities(ray_session, compiled_dicts):
    import ray.data as rd

    from kazu_ray.pipelines.config import PipelineConfig, build
    from kazu_ray.sources.interleave import interleave_batch

    docs = rd.from_arrow(
        pa.table({"doc_id": [1], "text": ["Asthma was treated with aspirin."]})
    ).map_batches(interleave_batch, batch_format="pyarrow")
    cfg = PipelineConfig.from_group(
        "pattern_ner",
        concurrency=1,
        pattern_rules={"disease": [[{"LOWER": "asthma"}]], "drug": ["aspirin"]},
    )
    out = build(docs, compiled_dicts, cfg)
    rows = out.take_all()
    ents = rows[0]["entities"]
    by_match = {e["match"].lower(): e for e in ents}
    assert "asthma" in by_match and "aspirin" in by_match
    # downstream linking + mapping grounded the rule hits against the dicts
    asthma = by_match["asthma"]
    assert any(m["idx"] == "MONDO_0004766" for m in asthma["mappings"])
    aspirin = by_match["aspirin"]
    assert any(m["idx"] == "CHEMBL25" for m in aspirin["mappings"])


def test_custom_pipeline_seam():
    class Fake:
        def pipe(self, text):
            return [(0, 4, "gene")]

    ner = PatternNer(pipeline=Fake())
    assert ner.tag_span_text("KRAS mutation", 0)[0]["match"] == "KRAS"


def test_bad_op_raises_at_compile():
    with pytest.raises(ValueError):
        RulePipeline({"x": [[{"LOWER": "a", "OP": "!"}]]})


def test_pattern_query_duckdb_parity():
    """Oracle contract for the pattern_entities query: greedy RE2
    extraction must equal token-pattern find_spans over word-salad text,
    including the one-or-more quantifier's longest-match resolution."""
    import duckdb

    from kazu_ray.stages.pattern_ner import (
        _PATTERN_QUERY_SQL,
        PATTERN_QUERY_RULES,
        RulePipeline,
    )

    texts = [
        "the fast sort merge join table scan batch batch batch stream",
        "table table scan scan batch merge batch batch sort",
        "no matches in this sentence at all",
        "batch",
        "join join table scan table scan batch batch",
    ]
    con = duckdb.connect()
    pipeline = RulePipeline(PATTERN_QUERY_RULES)
    for text in texts:
        got_py = sorted(
            (cls, text[s:e]) for s, e, cls in pipeline.pipe(text)
        )
        got_sql = []
        for cls, rx in _PATTERN_QUERY_SQL.items():
            rows = con.execute(
                f"SELECT unnest(regexp_extract_all(?, '{rx}'))", [text]
            ).fetchall()
            got_sql.extend((cls, r[0]) for r in rows)
        assert got_py == sorted(got_sql), text
