"""Compression-ratio / byte-entropy signals (extras/compress.py):
semantics pinned against an independent Counter-based reference, the
Arrow sliced-buffer path, and the distributed-vs-reference bit-exact
gate that approx_metrics records."""

import math
import zlib
from collections import Counter

import numpy as np
import pyarrow as pa

from kazu_ray.extras.compress import (
    batch_byte_entropy,
    compression_signals_batch,
    q_compression_gate,
)

SF = "/root/testdata/sf0.001"


def _ref_entropy(text: str) -> float:
    b = text.encode("utf-8")
    if not b:
        return 0.0
    n = len(b)
    return -sum((c / n) * math.log2(c / n) for c in Counter(b).values())


def test_entropy_fixtures():
    texts = ["aaaaaaaa", "ababababab", "", "The quick brown fox."]
    ent = batch_byte_entropy(pa.array(texts))
    assert ent[0] == 0.0
    assert abs(ent[1] - 1.0) < 1e-12
    assert ent[2] == 0.0
    for t, e in zip(texts, ent):
        assert abs(e - _ref_entropy(t)) < 1e-9


def test_entropy_multibyte_utf8_counts_bytes_not_chars():
    # 'é' is 2 UTF-8 bytes -> a string of repeated 'é' has exactly
    # 1 bit/byte (two equally frequent byte values), not 0
    ent = batch_byte_entropy(pa.array(["ééééé"]))
    assert abs(ent[0] - 1.0) < 1e-12


def test_entropy_sliced_array_offsets():
    arr = pa.array(["xx", "ababab", "yyy", "zz"])
    full = batch_byte_entropy(arr)
    sliced = batch_byte_entropy(arr.slice(1, 2))
    assert np.allclose(sliced, full[1:3])


def test_signals_batch_values():
    rep, rand = "abc" * 400, "The 39 quick?! brown foxes jump high." * 3
    out = compression_signals_batch(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": [rep, rand]})
    ).to_pylist()
    assert out[0]["raw_bytes"] == 1200
    assert out[0]["gz_bytes"] == len(zlib.compress(rep.encode(), 6))
    # repetitive text compresses much harder than prose
    assert out[0]["gz_ratio"] < 0.05 < out[1]["gz_ratio"]
    assert out[0]["byte_entropy"] < out[1]["byte_entropy"]


def test_distributed_matches_reference_bit_exact(ray_session):
    m = q_compression_gate(SF).iloc[0]
    assert bool(m["passes"]) and m["rows"] == 500
