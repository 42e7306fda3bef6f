"""Sink format pinning (VERDICT r1 item 10): the Lance branch must not
rot silently — it runs for real wherever lance is installed, and the
parquet fallback + explicit-request error are pinned here."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kazu_ray.sinks import lance_available, write_table_dir


def _ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({"subj": ["a", "b"], "obj": ["x", "y"]}))


def test_parquet_fallback(ray_session, tmp_path):
    out = str(tmp_path / "t")
    fmt = write_table_dir(_ds(), out)
    if lance_available():
        assert fmt == "lance"
    else:
        assert fmt == "parquet"
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert files
        rows = pa.concat_tables(
            pq.read_table(os.path.join(out, f)) for f in files
        )
        assert rows.num_rows == 2


def test_explicit_lance_errors_when_missing(ray_session, tmp_path):
    if lance_available():
        pytest.skip("lance installed; explicit-request error path not reachable")
    with pytest.raises(RuntimeError, match="lance"):
        write_table_dir(_ds(), str(tmp_path / "t2"), fmt="lance")


@pytest.mark.skipif(not lance_available(), reason="lance not installed")
def test_lance_write_branch(ray_session, tmp_path):
    """Runs only where lance IS installed: the branch must produce a
    readable lance table."""
    import lance

    out = str(tmp_path / "t3")
    fmt = write_table_dir(_ds(), out, fmt="lance")
    assert fmt == "lance"
    tbl = lance.dataset(out).to_table()
    assert tbl.num_rows == 2


def test_env_override_parquet(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("GRAFT_TABLE_FORMAT", "parquet")
    fmt = write_table_dir(_ds(), str(tmp_path / "t4"))
    assert fmt == "parquet"
