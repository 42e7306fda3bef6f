"""Frozen golden fixture for the REAL-checkpoint transformer path.

The reference gates its model pack with acceptance-test golden docs
(kazu/annotation/acceptance_test.py:26-29, golden CSVs under
tests/test_assets/full_pipeline/).  This is the analogue for the
repo's trained tiny checkpoint (kazu_ray/assets/tiny_bert_ner): static
docs + expected final entities, checked in as CSVs so the oracle cannot
co-vary with pipeline code.

Eight of the expected rows carry surface forms UNKNOWN to both the
dictionary-NER automaton and the mock gazetteer ("melanomas",
"asthmatics", "aspirins", "paracetamols", "lung cancers",
"breast cancers") — recall 1.0 REQUIRES the trained checkpoint's
forward + the TF-IDF linker: any regression in the numpy-BERT encoder,
WordPiece tokenizer, checkpoint loader, window/decode, linking, or the
mapping cascade breaks the gate.
"""

from __future__ import annotations

import os

import pyarrow as pa

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "_golden")


def transformer_golden_docs():
    """Dataset of the fixture docs (DOCS_SCHEMA, one text span each)."""
    import pyarrow.csv as pcsv
    import ray.data as rd

    from ..schemas import DOCS_SCHEMA

    tbl = pcsv.read_csv(os.path.join(_GOLDEN_DIR, "transformer_docs.csv"))
    rows = [
        {
            "doc_id": d,
            "spans": [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
        }
        for d, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))


def transformer_golden_table() -> pa.Table:
    """Expected final entities (doc_id, match, entity_class, start, end,
    namespace, mapping_id)."""
    import pyarrow.csv as pcsv

    return pcsv.read_csv(os.path.join(_GOLDEN_DIR, "transformer_golden.csv"))


def run_transformer_golden(dicts, concurrency: int = 1, transformer_tagger: str | None = None):
    """Full-group pipeline over the fixture docs.  The tagger defaults
    to the trained teacher checkpoint; the distillation gate passes the
    exported STUDENT checkpoint dir to run the identical pipeline."""
    from ..assets import TINY_BERT_NER
    from ..pipelines.config import PipelineConfig, build

    cfg = PipelineConfig.from_group(
        "full",
        concurrency=concurrency,
        transformer_tagger=transformer_tagger or TINY_BERT_NER,
    )
    return build(transformer_golden_docs(), dicts, cfg)


def evaluate_transformer_golden(dicts, transformer_tagger: str | None = None):
    """P/R of the real-checkpoint pipeline vs the frozen golden.

    Keyed on (doc_id, match, entity_class, start, end, mapping_id) —
    exact spans AND exact grounding must both be right."""
    import pandas as pd

    got = set()
    for row in run_transformer_golden(
        dicts, transformer_tagger=transformer_tagger
    ).take_all():
        for e in row["entities"]:
            ids = sorted({m["idx"] for m in e["mappings"]}) or [""]
            for idx in ids:
                got.add(
                    (row["doc_id"], e["match"], e["entity_class"], e["start"], e["end"], idx)
                )
    g = transformer_golden_table()
    exp = set(
        zip(
            g.column("doc_id").to_pylist(),
            g.column("match").to_pylist(),
            g.column("entity_class").to_pylist(),
            g.column("start").to_pylist(),
            g.column("end").to_pylist(),
            g.column("mapping_id").to_pylist(),
        )
    )
    tp = len(got & exp)
    n_transformer = sum(
        1 for r in zip(g.column("namespace").to_pylist()) if r[0] == "TransformerNER"
    )
    return pd.DataFrame(
        {
            "precision": [round(tp / max(1, len(got)), 6)],
            "recall": [round(tp / max(1, len(exp)), 6)],
            "n_got": [len(got)],
            "n_golden": [len(exp)],
            "n_transformer_required": [n_transformer],
        }
    )
