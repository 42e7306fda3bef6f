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
    labels = {r["doc_id"]: r["component"] for r in connected_components(pairs, max_rounds=8).take_all()}
    # label propagation halves distance per round; 8 rounds cover dist 40?
    # min-label propagation with self-join converges ~2^rounds
    assert set(labels.values()) == {0}
