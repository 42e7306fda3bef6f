"""KAZU Document-JSON interchange: write/read the reference's document
serialization so reference users can exchange corpora with this engine.

Shape follows reference kazu/data/data.py: ``Document.json`` /
``Document.from_json`` (:589-675) — a document dict with ``idx``,
``sections`` (text, name, entities) and ``metadata``; entities carry
``match``, ``entity_class``, ``spans`` ([{start, end}]), ``namespace``,
``mention_confidence`` (enum NAME), ``match_norm`` and ``mappings`` with
the Mapping field names (:172-192).  ``remove_empty_elements`` semantics
are honored on write (empty mappings/metadata omitted), and reads
tolerate their absence.

The sink streams: each batch's docs are written as one JSONL shard from
the worker (no driver collection); the returned manifest dataset has one
row per shard.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

# MentionConfidence enum <-> int (reference serializes enums by NAME)
_CONF_NAME = {100: "HIGHLY_LIKELY", 50: "PROBABLE", 10: "POSSIBLE"}
_CONF_VALUE = {v: k for k, v in _CONF_NAME.items()}


def entity_to_kazu_dict(e: dict) -> dict:
    out = {
        "match": e["match"],
        "entity_class": e["entity_class"],
        "spans": [{"start": e["start"], "end": e["end"]}],
        "namespace": e["namespace"],
        "mention_confidence": _CONF_NAME.get(e["mention_confidence"], "PROBABLE"),
        "match_norm": e["match_norm"],
        "start": e["start"],
        "end": e["end"],
    }
    mappings = []
    for m in e.get("mappings", []):
        md = {
            "default_label": m["default_label"],
            "source": m["source"],
            "parser_name": m["parser_name"],
            "idx": m["idx"],
            "string_match_strategy": m["string_match_strategy"],
            "string_match_confidence": m["string_match_confidence"],
            "disambiguation_confidence": m["disambiguation_confidence"],
            "disambiguation_strategy": m["disambiguation_strategy"],
        }
        if m.get("xref_source_parser_name"):
            md["xref_source_parser_name"] = m["xref_source_parser_name"]
        mappings.append({k: v for k, v in md.items() if v not in (None, "")})
    if mappings:
        out["mappings"] = mappings
    return out


def row_to_kazu_doc_dict(row: dict) -> dict:
    """Annotated doc row (doc_id, spans, entities) -> KAZU Document dict.
    Each text span becomes a Section; entities attach by span_idx."""
    sections = []
    for i, sp in enumerate(row["spans"]):
        if sp["media_ref"]:
            # media spans carry no text; preserved as named empty
            # sections with the ref in metadata so round-trips keep the
            # span sequence (kind, text, media_ref, order)
            sections.append(
                {"text": "", "name": f"media-{i}", "metadata": {"media_ref": sp["media_ref"], "kind": sp["kind"]}}
            )
            continue
        ents = [
            entity_to_kazu_dict(e)
            for e in row.get("entities", [])
            if e["span_idx"] == i
        ]
        sec = {"text": sp["text"], "name": f"section-{i}", "metadata": {"kind": sp["kind"]}}
        if ents:
            sec["entities"] = ents
        sections.append(sec)
    return {"idx": str(row["doc_id"]), "sections": sections}


def kazu_doc_dict_to_row(doc: dict) -> dict:
    """Inverse: KAZU Document dict -> our doc row shape."""
    spans, entities = [], []
    for i, sec in enumerate(doc.get("sections", [])):
        meta = sec.get("metadata") or {}
        if meta.get("media_ref"):
            spans.append(
                {"kind": meta.get("kind", "media"), "text": "", "media_ref": meta["media_ref"], "offset": i}
            )
            continue
        spans.append(
            {"kind": meta.get("kind", "text"), "text": sec.get("text", ""), "media_ref": "", "offset": i}
        )
        for e in sec.get("entities", []):
            # a reference Entity may carry MULTIPLE spans (non-contiguous
            # mention, data.py Entity.spans); our row shape is one
            # contiguous (start, end) per entity row, so each span
            # becomes its own row with equal match/class/mappings —
            # mirroring how NonContiguousEntitySplitter emits pieces.
            # Span coverage is lossless; only the grouping is flattened.
            e_spans = e.get("spans") or [
                {"start": e.get("start", 0), "end": e.get("end", 0)}
            ]
            for sp0 in e_spans:
                entities.append(
                    {
                        "span_idx": i,
                        "start": sp0["start"],
                        "end": sp0["end"],
                        "match": e["match"],
                        "match_norm": e.get("match_norm", ""),
                        "entity_class": e["entity_class"],
                        "namespace": e.get("namespace", ""),
                        "mention_confidence": _CONF_VALUE.get(
                            e.get("mention_confidence", "PROBABLE"), 50
                        ),
                        "candidates": [],
                        "mappings": [
                            {
                                "parser_name": m.get("parser_name", ""),
                                "source": m.get("source", ""),
                                "idx": m.get("idx", ""),
                                "default_label": m.get("default_label", ""),
                                "string_match_strategy": m.get("string_match_strategy", ""),
                                "string_match_confidence": m.get("string_match_confidence", ""),
                                "disambiguation_strategy": m.get("disambiguation_strategy", ""),
                                "disambiguation_confidence": m.get("disambiguation_confidence", ""),
                                "xref_source_parser_name": m.get("xref_source_parser_name", ""),
                            }
                            for m in e.get("mappings", [])
                        ],
                    }
                )
    doc_id = doc.get("idx", "")
    return {"doc_id": doc_id, "spans": spans, "entities": entities}


def write_kazu_jsonl(annotated_ds, out_dir: str):
    """Streaming sink: one JSONL shard per batch, written worker-side.
    Returns the manifest Dataset (path, n_docs per shard); consume it to
    drive the write.

    ``out_dir`` MUST be on storage shared by every worker node (NFS,
    fuse-mounted object store, ...) — the shards are opened inside
    ``map_batches`` workers, exactly like ``Dataset.write_parquet``'s
    local-path semantics, so on a multi-node cluster a node-local path
    scatters shards across machines and the manifest paths are
    unreadable from the driver."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        path = os.path.join(out_dir, f"docs-{uuid.uuid4().hex}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for row in rows:
                f.write(json.dumps(row_to_kazu_doc_dict(row)) + "\n")
        return pa.table({"path": [path], "n_docs": [len(rows)]})

    return annotated_ds.map_batches(write_shard, batch_format="pyarrow")


def read_kazu_jsonl(path: str):
    """Read a KAZU-JSONL directory/file back into annotated doc rows."""
    import ray.data as rd

    if os.path.isdir(path):
        files = [
            os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".jsonl")
        ]
    else:
        files = [path]

    def parse(t: pa.Table) -> pa.Table:
        from ..schemas import DOCS_SCHEMA, ENTITIES_COLUMN

        annotated_schema = DOCS_SCHEMA.append(pa.field("entities", ENTITIES_COLUMN))
        rows = [kazu_doc_dict_to_row(json.loads(line)) for line in t.column("text").to_pylist()]
        return pa.Table.from_pylist(rows, schema=annotated_schema)

    return rd.read_text(files).map_batches(parse, batch_format="pyarrow")
