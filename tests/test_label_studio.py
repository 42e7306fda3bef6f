"""Label Studio interchange (sources/label_studio.py).

Round-trip: annotated doc rows → LS task JSON (reference region
structure: ner labels + taxonomy + non-contig relations) → gold-entity
rows; plus a reference-produced-style task with a non-contiguous
entity merged through its relation link."""

import json

import pyarrow as pa

from kazu_ray.schemas import ENTITIES_COLUMN, SPAN_STRUCT
from kazu_ray.sources.label_studio import (
    doc_row_to_tasks,
    read_label_studio,
    tasks_to_gold_rows,
    write_label_studio_tasks,
)


def _mapping(idx="MONDO:1", label="melanoma", source="MONDO"):
    return {
        "parser_name": "p", "source": source, "idx": idx,
        "default_label": label, "string_match_strategy": "s",
        "string_match_confidence": "HIGHLY_LIKELY",
        "disambiguation_strategy": "", "disambiguation_confidence": "",
        "xref_source_parser_name": "",
    }


def _row():
    text = "melanoma was observed in EGFR patients"
    ents = [
        {
            "span_idx": 0, "start": 0, "end": 8, "match": "melanoma",
            "match_norm": "MELANOMA", "entity_class": "disease",
            "namespace": "DictionaryNER", "mention_confidence": 100,
            "candidates": [], "mappings": [_mapping()],
        },
        {
            "span_idx": 0, "start": 25, "end": 29, "match": "EGFR",
            "match_norm": "EGFR", "entity_class": "gene",
            "namespace": "DictionaryNER", "mention_confidence": 100,
            "candidates": [], "mappings": [],
        },
    ]
    return {
        "doc_id": "d1",
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        "entities": ents,
    }


def test_export_region_structure():
    tasks = doc_row_to_tasks(_row())
    assert len(tasks) == 1
    t = tasks[0]
    assert t["data"]["id"] == "d1_text_0"
    result = t["annotations"][0]["result"]
    # two entities -> 2 ner regions + 2 taxonomy regions
    ner = [r for r in result if r["type"] == "labels"]
    tax = [r for r in result if r["type"] == "taxonomy"]
    assert len(ner) == 2 and len(tax) == 2
    assert ner[0]["value"]["labels"] == ["disease"]
    assert ner[0]["value"]["text"] == "melanoma"
    # mapped entity encodes (source, "label|idx"); unmapped the sentinel
    assert tax[0]["value"]["taxonomy"] == [["MONDO", "melanoma|MONDO:1"]]
    assert tax[1]["value"]["taxonomy"] == [["None", "unmapped|unmapped"]]


def test_round_trip_to_gold_rows():
    tasks = doc_row_to_tasks(_row())
    gold = tasks_to_gold_rows(tasks).to_pylist()
    by_match = {g["match"]: g for g in gold}
    assert by_match["melanoma"]["entity_class"] == "disease"
    assert by_match["melanoma"]["mapping_idx"] == "MONDO:1"
    assert by_match["melanoma"]["mapping_label"] == "melanoma"
    assert by_match["EGFR"]["mapping_source"] == "None"
    assert by_match["EGFR"]["mapping_idx"] == "unmapped"


def test_non_contig_relation_merged():
    """A reference-KAZU-style task: two regions linked by a non-contig
    relation collapse into ONE gold group with both spans."""
    text = "estrogen and progesterone receptor"
    task = {
        "id": 1,
        "data": {"text": text, "id": "t1"},
        "annotations": [{
            "id": "t1",
            "result": [
                {"id": "r1", "from_name": "ner", "to_name": "text",
                 "type": "labels",
                 "value": {"start": 0, "end": 8, "text": "estrogen",
                           "labels": ["gene"]}},
                {"id": "r2", "from_name": "ner", "to_name": "text",
                 "type": "labels",
                 "value": {"start": 13, "end": 34,
                           "text": "progesterone receptor",
                           "labels": ["gene"]}},
                {"id": "r1", "from_name": "taxonomy", "to_name": "text",
                 "type": "taxonomy",
                 "value": {"start": 0, "end": 8, "text": "estrogen",
                           "taxonomy": [["HGNC", "ESR1|HGNC:3467"]]}},
                {"from_id": "r1", "to_id": "r2", "type": "relation",
                 "direction": "right", "labels": ["non-contig"]},
            ],
        }],
    }
    gold = tasks_to_gold_rows([task]).to_pylist()
    # one group, two span rows, sharing class + mapping
    assert {g["group_id"] for g in gold} == {"r1"}
    assert sorted((g["start"], g["end"]) for g in gold) == [(0, 8), (13, 34)]
    assert all(g["entity_class"] == "gene" for g in gold)
    assert all(g["mapping_idx"] == "HGNC:3467" for g in gold)


def test_streamed_sink_and_reader(ray_session, tmp_path):
    import ray.data as rd

    row = _row()
    batch = pa.table(
        {
            "doc_id": pa.array([row["doc_id"]]),
            "spans": pa.array([row["spans"]], type=pa.list_(SPAN_STRUCT)),
            "entities": pa.array([row["entities"]], type=ENTITIES_COLUMN),
        }
    )
    out = str(tmp_path / "ls")
    paths = write_label_studio_tasks(rd.from_arrow(batch), out)
    assert paths and all(p.endswith(".json") for p in paths)
    with open(paths[0]) as f:
        assert json.load(f)[0]["data"]["id"] == "d1_text_0"
    gold = read_label_studio(out).to_pylist()
    assert {g["match"] for g in gold} == {"melanoma", "EGFR"}
