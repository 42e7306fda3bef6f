"""Table sinks: Lance when available, partitioned Parquet otherwise.

The north-star materialization target is Lance node/edge tables.  The
``lance``/``lancedb`` packages are not installed in this container, so
every writer in the repo funnels through :func:`write_table_dir`, which
uses ``Dataset.write_lance`` when present and falls back to
``write_parquet`` — swapping storage format is this one function.
"""

from __future__ import annotations

import os


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def write_table_dir(ds, path: str, fmt: str | None = None) -> str:
    """Write a Dataset to ``path`` as a table directory; returns the
    format used ("lance" or "parquet")."""
    fmt = fmt or os.environ.get("GRAFT_TABLE_FORMAT", "auto")
    if fmt in ("auto", "lance") and lance_available() and hasattr(ds, "write_lance"):
        ds.write_lance(path)
        return "lance"
    if fmt == "lance":
        raise RuntimeError("lance requested but the lance package is not installed")
    ds.write_parquet(path)
    return "parquet"
