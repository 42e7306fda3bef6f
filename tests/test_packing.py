"""Sequence packing: cross-engine parity with DuckDB's window-function
prefix sum, partition invariance of the distributed prefix sum, and the
packing invariants (full sequences, contiguous slices)."""

import duckdb
import pytest

from kazu_ray.extras.packing import packing_oracle_sql, sequence_pack

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
    return con


def _rows(ds):
    return sorted(
        (r["seq_id"], r["doc_id"], r["tok_start"], r["seq_offset"], r["n_toks"])
        for r in ds.take_all()
    )


def test_pack_matches_sql(ray_session):
    import ray.data as rd

    for seq_len in (64, 1000):
        ds = rd.read_parquet(DOCS, columns=["doc_id", "text"])
        got = _rows(sequence_pack(ds, seq_len=seq_len))
        exp = sorted(_con().execute(packing_oracle_sql(seq_len)).fetchall())
        assert got == exp, f"seq_len={seq_len}"


def test_pack_partition_invariance(ray_session):
    import ray.data as rd

    a = _rows(
        sequence_pack(
            rd.read_parquet(DOCS, columns=["doc_id", "text"]), seq_len=128
        )
    )
    b = _rows(
        sequence_pack(
            rd.read_parquet(DOCS, columns=["doc_id", "text"]).repartition(7),
            seq_len=128,
            num_partitions=5,
        )
    )
    assert a == b


def test_pack_invariants(ray_session):
    import ray.data as rd

    seq_len = 100
    rows = _rows(
        sequence_pack(rd.read_parquet(DOCS, columns=["doc_id", "text"]), seq_len)
    )
    by_seq: dict = {}
    for seq_id, doc_id, tok_start, seq_offset, n_toks in rows:
        assert n_toks > 0
        by_seq.setdefault(seq_id, []).append((seq_offset, n_toks))
    assert set(by_seq) == set(range(len(by_seq)))  # dense sequence ids
    for seq_id, slices in by_seq.items():
        slices.sort()
        # slices tile the sequence contiguously from offset 0
        pos = 0
        for seq_offset, n_toks in slices:
            assert seq_offset == pos
            pos += n_toks
        if seq_id != max(by_seq):
            assert pos == seq_len  # every non-final sequence is full
        else:
            assert 0 < pos <= seq_len


def test_pack_edge_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    with pytest.raises(ValueError):
        sequence_pack(rd.range(1), seq_len=0)

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    assert sequence_pack(empty, seq_len=16).count() == 0

    # zero-token documents contribute nothing but don't break offsets
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["alpha beta gamma", "!!!", "delta epsilon"],
        }
    )
    rows = _rows(sequence_pack(rd.from_arrow(t), seq_len=4))
    assert rows == [(0, 1, 0, 0, 3), (0, 3, 0, 3, 1), (1, 3, 1, 0, 1)]
