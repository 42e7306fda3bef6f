import pyarrow as pa

from kazu_ray.extras.cluster import connected_components


def test_connected_components_chain(ray_session):
    import ray.data as rd

    # chain 1-2-3, pair 10-11, singleton edge 20-21
    pairs = rd.from_arrow(
        pa.table({"doc_a": [1, 2, 10, 20], "doc_b": [2, 3, 11, 21]})
    )
    labels = {r["doc_id"]: r["component"] for r in connected_components(pairs).take_all()}
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == 10
    assert labels[20] == labels[21] == 20


def test_connected_components_long_chain(ray_session):
    import ray.data as rd

    n = 40
    pairs = rd.from_arrow(
        pa.table({"doc_a": list(range(n - 1)), "doc_b": list(range(1, n))})
    )
    labels = {
        r["doc_id"]: r["component"]
        for r in connected_components(pairs, max_rounds=8, driver_threshold=0).take_all()
    }
    # label propagation halves distance per round; 8 rounds cover dist 40?
    # min-label propagation with self-join converges ~2^rounds
    assert set(labels.values()) == {0}


def _unionfind(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_components_match_unionfind_random(ray_session):
    import random

    import ray.data as rd

    rng = random.Random(42)
    n = 200
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    expected = _unionfind(pairs)
    ds = rd.from_arrow(
        pa.table({"doc_a": [a for a, _ in pairs], "doc_b": [b for _, b in pairs]})
    )
    # distributed path forced; also check the driver union-find path agrees
    got = {r["doc_id"]: r["component"]
           for r in connected_components(ds, driver_threshold=0).take_all()}
    assert got == expected
    got_small = {r["doc_id"]: r["component"] for r in connected_components(ds).take_all()}
    assert got_small == expected


def test_neardup_components_golden_sf0001(ray_session):
    """Pipeline-level: minhash candidates -> components must equal
    brute-force union-find over the same candidate pairs (sf0.001)."""
    from kazu_ray.extras.cluster import q_neardup_components
    from kazu_ray.extras.dedup import q_minhash_candidates

    sf = "/root/testdata/sf0.001"
    pairs = [(r["doc_a"], r["doc_b"]) for r in q_minhash_candidates(sf).take_all()]
    expected = _unionfind(pairs)
    got = {
        r["doc_id"]: r["component"] for r in q_neardup_components(sf).take_all()
    }
    assert got == expected
    # and the distributed propagation path gives identical components
    from kazu_ray.extras.cluster import connected_components as _cc
    from kazu_ray.extras.dedup import q_minhash_candidates as _qmc

    dist = {
        r["doc_id"]: r["component"]
        for r in _cc(_qmc(sf), driver_threshold=0).take_all()
    }
    assert dist == expected


def test_neardup_components_frozen_golden_sf001(ray_session):
    """Frozen-fixture gate (VERDICT r1 item 1): sf0.01 components must
    stay byte-identical to the round-1 output checked in as CSV."""
    import csv
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.01"
    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "neardup_components_sf0.01.csv")
    if not os.path.exists(sf):
        _pytest.skip("sf0.01 testdata absent")
    with open(fixture) as f:
        expected = {int(r["doc_id"]): int(r["component"]) for r in csv.DictReader(f)}
    from kazu_ray.extras.cluster import q_neardup_components

    got = {r["doc_id"]: r["component"] for r in q_neardup_components(sf).take_all()}
    assert got == expected


def test_simhash_batch_matches_reference_kernel():
    from kazu_ray.extras.dedup import simhash64, simhash64_batch

    texts = [
        "the quick brown fox", "", "one", "repeated repeated repeated words",
        "Mixed CASE and punctuation!!! 123 456",
    ]
    batch = simhash64_batch(texts)
    for t, got in zip(texts, batch):
        assert int(got) == simhash64(t)


def test_minhash_lsh_recall_vs_exact_shingle_jaccard(ray_session):
    """LSH candidates must recover (nearly) all true high-shingle-Jaccard
    pairs (MinHash approximates SHINGLE-set Jaccard, not the word-set
    measure of q_jaccard_pairs; 16 bands x 4 rows at J>=0.8 has per-pair
    miss probability (1-J^4)^16 ~ 0.1%)."""
    import pyarrow.parquet as pq

    from kazu_ray.extras.dedup import _shingles, q_minhash_candidates

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    subset = [
        (i, set(_shingles(t).tolist()))
        for i, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if i < 200
    ]
    exact = set()
    for x in range(len(subset)):
        for y in range(x + 1, len(subset)):
            a_id, a_set = subset[x]
            b_id, b_set = subset[y]
            union = len(a_set | b_set)
            if union and len(a_set & b_set) / union >= 0.8:
                exact.add((min(a_id, b_id), max(a_id, b_id)))
    assert exact, "no high-shingle-Jaccard pairs under doc_id<200; fixture assumption broken"
    lsh = {(r["doc_a"], r["doc_b"]) for r in q_minhash_candidates(sf).take_all()}
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall} vs exact shingle Jaccard ({len(exact)} pairs)"
