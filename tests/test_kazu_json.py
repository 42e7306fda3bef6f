"""KAZU Document-JSON round trip (SURVEY §2 item 2): annotated docs ->
reference-shaped JSONL -> back, preserving sections, entities, mappings
and the span sequence."""

import json


def test_doc_dict_shapes(ray_session, compiled_dicts):
    from kazu_ray.pipelines.config import PipelineConfig, build
    from kazu_ray.sources.interleave import interleave_batch
    from kazu_ray.sources.kazu_json import row_to_kazu_doc_dict

    import pyarrow as pa
    import ray.data as rd

    docs = rd.from_arrow(
        pa.table({"doc_id": [7], "text": ["Asthma patients took aspirin."]})
    ).map_batches(interleave_batch, batch_format="pyarrow")
    rows = build(docs, compiled_dicts, PipelineConfig(concurrency=1)).take_all()
    doc = row_to_kazu_doc_dict(rows[0])
    assert set(doc) == {"idx", "sections"}
    sec = next(s for s in doc["sections"] if s.get("entities"))
    ent = sec["entities"][0]
    # reference Entity/Mapping field names
    assert {"match", "entity_class", "spans", "namespace", "mention_confidence"} <= set(ent)
    assert ent["mention_confidence"] in ("HIGHLY_LIKELY", "PROBABLE", "POSSIBLE")
    if "mappings" in ent:
        m = ent["mappings"][0]
        assert {"default_label", "source", "parser_name", "idx",
                "string_match_strategy", "string_match_confidence"} <= set(m)
    # valid JSON end to end
    json.loads(json.dumps(doc))


def test_jsonl_round_trip(ray_session, compiled_dicts, tmp_path):
    from kazu_ray.pipelines.config import PipelineConfig, build
    from kazu_ray.sources.interleave import interleave_batch
    from kazu_ray.sources.kazu_json import read_kazu_jsonl, write_kazu_jsonl

    import pyarrow as pa
    import ray.data as rd

    texts = ["Asthma patients took aspirin.", "EGFR is mutated in melanoma."]
    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": texts})
    ).map_batches(interleave_batch, batch_format="pyarrow")
    annotated = build(docs, compiled_dicts, PipelineConfig(concurrency=1)).materialize()
    out = str(tmp_path / "kazu_json")
    manifest = write_kazu_jsonl(annotated, out).take_all()
    assert sum(m["n_docs"] for m in manifest) == 2

    def key(rows):
        out = {}
        for r in rows:
            ents = sorted(
                (e["span_idx"], e["start"], e["end"], e["match"], e["entity_class"],
                 tuple(sorted(m["idx"] for m in e["mappings"])))
                for e in r["entities"]
            )
            spans = [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
            out[str(r["doc_id"])] = (spans, ents)
        return out

    orig = key(annotated.take_all())
    back = key(read_kazu_jsonl(out).take_all())
    assert orig == back
