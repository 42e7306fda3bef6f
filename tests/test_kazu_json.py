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


def test_multispan_entity_expands_per_span():
    """A reference entity carrying multiple (non-contiguous) spans becomes
    one entity row PER span with equal match/class/mappings — span
    coverage is lossless, only the grouping is flattened."""
    from kazu_ray.sources.kazu_json import kazu_doc_dict_to_row

    doc = {
        "idx": "d1",
        "sections": [
            {
                "text": "alpha and gamma secretase",
                "metadata": {"kind": "text"},
                "entities": [
                    {
                        "match": "alpha secretase",
                        "entity_class": "gene",
                        "spans": [{"start": 0, "end": 5}, {"start": 16, "end": 25}],
                        "namespace": "TestStep",
                        "mention_confidence": "PROBABLE",
                        "mappings": [{"idx": "X:1", "source": "X"}],
                    }
                ],
            }
        ],
    }
    row = kazu_doc_dict_to_row(doc)
    assert [(e["start"], e["end"]) for e in row["entities"]] == [(0, 5), (16, 25)]
    for e in row["entities"]:
        assert e["match"] == "alpha secretase"
        assert e["entity_class"] == "gene"
        assert e["mappings"][0]["idx"] == "X:1"
