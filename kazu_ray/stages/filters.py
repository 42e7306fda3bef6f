"""Document-level predicates and sinks.

- ``filter_docs_with_entity_class``: the reference's EntityClassFilter
  (/root/reference/kazu/utils/utils.py:126-140, used to gate SethStep) as
  a vectorized Dataset filter.
- ``dead_letter``: docs whose ``error`` column is set (the reference's
  FailedDocsFileHandler, pipeline/pipeline.py:92-117, becomes a
  dead-letter parquet partition).
- ``write_annotated``: Document-JSON-style sink (reference
  Document.json, data.py:589-612) — parquet by default, json for debug.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def filter_docs_with_entity_class(annotated_ds, entity_class: str):
    """Keep docs containing >=1 entity of the given class."""

    def keep(t: pa.Table) -> pa.Table:
        mask = [
            any(e["entity_class"] == entity_class for e in ents)
            for ents in t.column("entities").to_pylist()
        ]
        return t.filter(pa.array(mask, type=pa.bool_()))

    return annotated_ds.map_batches(keep, batch_format="pyarrow")


def dead_letter(docs_with_error_ds):
    """Rows with a non-null ``error`` column (failed-doc isolation)."""
    return docs_with_error_ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["error"])), batch_format="pyarrow"
    )


def write_annotated(annotated_ds, out_dir: str, fmt: str = "parquet"):
    if fmt == "parquet":
        annotated_ds.write_parquet(out_dir)
    elif fmt == "json":
        annotated_ds.write_json(out_dir)
    else:
        raise ValueError(fmt)
