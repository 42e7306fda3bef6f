"""Label Studio interchange (annotation workflow sink/source).

Reference: kazu/annotation/label_studio.py — KazuToLabelStudioConverter
(:30-148) emits one Label Studio task per Section with, per entity
span, a ``labels`` NER region + a ``taxonomy`` region encoding mappings
as ``(source, "default_label|idx")`` pairs, and ``relation`` entries
labelled ``non-contig`` linking the spans of non-contiguous entities;
LSToKazuConversion (:151-260) reads the same structure back into gold
entities.  The HTTP client half (LabelStudioManager, requests-based
project CRUD) is out of scope here — this module covers the data
interchange: export doc rows as task JSON and read annotated task JSON
back into flat gold-entity rows.

Ray-native shape: export is a streamed ``map_batches`` JSON sink
(shard per batch + manifest, same contract as sources/kazu_json.py —
``out_dir`` must be shared storage on a multi-node cluster); import is
driver-side by design, because annotation sets are human-bounded (the
same small-side argument as benchmark decontamination).

Row-schema note: our Arrow entity struct is one contiguous (start,
end) per row, so export emits one region pair per entity row and no
``non-contig`` relations (the reference itself warns it can't handle
>2-span entities, label_studio.py:64-71); import DOES merge
relation-linked regions into one gold entity, so annotations produced
by reference KAZU round-trip correctly.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa

_TAX_NAME = "taxonomy"

GOLD_ENTITY_SCHEMA = pa.schema(
    [
        ("task_id", pa.string()),
        ("group_id", pa.string()),  # merges non-contig regions
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("match", pa.string()),
        ("entity_class", pa.string()),
        ("mapping_source", pa.string()),
        ("mapping_label", pa.string()),
        ("mapping_idx", pa.string()),
    ]
)


def _taxonomy_value(ent: dict) -> list[list[str]]:
    pairs = sorted(
        {
            (m["source"], f"{m['default_label']}|{m['idx']}")
            for m in ent["mappings"]
        }
    )
    if not pairs:
        pairs = [("None", "unmapped|unmapped")]
    return [list(p) for p in pairs]


def doc_row_to_tasks(row: dict) -> list[dict]:
    """One Label Studio task per text span (Section analogue), with the
    reference's region structure (ner labels + taxonomy per entity)."""
    tasks = []
    for i, sp in enumerate(row["spans"]):
        if not sp["text"]:
            continue
        idx = f"{row['doc_id']}_{sp['kind']}_{i}"
        result: list[dict[str, Any]] = []
        for j, ent in enumerate(row["entities"]):
            if ent["span_idx"] != i:
                continue
            region_id = f"{idx}_e{j}"
            match = sp["text"][ent["start"] : ent["end"]]
            result.append(
                {
                    "id": region_id,
                    "from_name": "ner",
                    "to_name": "text",
                    "type": "labels",
                    "origin": "manual",
                    "value": {
                        "start": ent["start"],
                        "end": ent["end"],
                        "score": 1.0,
                        "text": match,
                        "labels": [ent["entity_class"]],
                    },
                }
            )
            result.append(
                {
                    "id": region_id,
                    "from_name": _TAX_NAME,
                    "to_name": "text",
                    "type": "taxonomy",
                    "origin": "manual",
                    "value": {
                        "start": ent["start"],
                        "end": ent["end"],
                        "text": match,
                        "taxonomy": _taxonomy_value(ent),
                    },
                }
            )
        tasks.append(
            {
                "data": {"text": sp["text"], "id": idx},
                "annotations": [{"id": idx, "result": result}],
            }
        )
    return tasks


def write_label_studio_tasks(docs_ds, out_dir: str) -> list[str]:
    """Streamed task export: one JSON shard per batch + manifest.
    ``out_dir`` MUST be on storage shared by every worker node."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        tasks = [t for r in rows for t in doc_row_to_tasks(r)]
        first = rows[0]["doc_id"] if rows else "empty"
        path = os.path.join(out_dir, f"tasks-{first}-{len(tasks)}.json")
        with open(path, "w") as f:
            json.dump(tasks, f)
        return pa.Table.from_pydict(
            {"path": [path], "n_tasks": [len(tasks)]},
            schema=pa.schema([("path", pa.string()), ("n_tasks", pa.int64())]),
        )

    manifest = docs_ds.map_batches(write_batch, batch_format="pyarrow").take_all()
    paths = sorted(m["path"] for m in manifest)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(paths, f)
    return paths


def tasks_to_gold_rows(tasks: list[dict]) -> pa.Table:
    """Annotated LS tasks → flat gold-entity rows (one row per mapping
    per merged region group) — reference LSToKazuConversion semantics:
    regions carry spans/labels/taxonomy; ``non-contig`` relations merge
    regions into one entity (group keyed by the earliest region id)."""
    rows = []
    for task in tasks:
        data_id = task["data"]["id"]
        if not task.get("annotations"):
            continue
        result = task["annotations"][0]["result"]
        spans: dict[str, tuple[int, int]] = {}
        labels: dict[str, set[str]] = {}
        taxos: dict[str, set[tuple[str, str]]] = {}
        links: dict[str, set[str]] = {}
        linked: set[str] = set()
        for rd in result:
            if "id" in rd:
                rid = rd["id"]
                v = rd["value"]
                spans[rid] = (v["start"], v["end"])
                if rd["type"] == "labels":
                    labels.setdefault(rid, set()).update(v["labels"])
                elif rd["type"] == "taxonomy":
                    taxos.setdefault(rid, set()).update(
                        (t[0], t[1]) for t in v["taxonomy"] if len(t) == 2
                    )
            else:
                links.setdefault(rd["from_id"], set()).add(rd["to_id"])
                linked.add(rd["from_id"])
                linked.add(rd["to_id"])
        # group regions: relation roots absorb their targets
        absorbed = {t for ts in links.values() for t in ts}
        groups: dict[str, list[str]] = {}
        for rid in spans:
            if rid in absorbed:
                continue
            members = [rid] + sorted(links.get(rid, ()))
            groups[rid] = members
        text = task["data"]["text"]
        for gid, members in groups.items():
            g_labels = sorted({l for m in members for l in labels.get(m, ())})
            g_taxos = sorted({t for m in members for t in taxos.get(m, ())})
            starts = [spans[m][0] for m in members]
            ends = [spans[m][1] for m in members]
            for start, end in sorted(zip(starts, ends)):
                for cls in g_labels or [""]:
                    for source, idx_str in g_taxos or [("", "|")]:
                        label, _, idx = idx_str.partition("|")
                        rows.append(
                            {
                                "task_id": data_id,
                                "group_id": gid,
                                "start": start,
                                "end": end,
                                "match": text[start:end],
                                "entity_class": cls,
                                "mapping_source": source,
                                "mapping_label": label,
                                "mapping_idx": idx,
                            }
                        )
    return pa.Table.from_pylist(rows, schema=GOLD_ENTITY_SCHEMA)


def read_label_studio(out_dir_or_file: str) -> pa.Table:
    """Load exported/annotated task JSON (a manifest dir from
    write_label_studio_tasks, a single file, or a dir of *.json) into
    gold-entity rows.  Driver-side by design: annotation sets are
    human-bounded."""
    paths: list[str] = []
    if os.path.isdir(out_dir_or_file):
        man = os.path.join(out_dir_or_file, "manifest.json")
        if os.path.exists(man):
            with open(man) as f:
                paths = json.load(f)
        else:
            paths = sorted(
                os.path.join(out_dir_or_file, p)
                for p in os.listdir(out_dir_or_file)
                if p.endswith(".json")
            )
    else:
        paths = [out_dir_or_file]
    tasks: list[dict] = []
    for p in paths:
        with open(p) as f:
            loaded = json.load(f)
        tasks.extend(loaded if isinstance(loaded, list) else [loaded])
    return tasks_to_gold_rows(tasks)
