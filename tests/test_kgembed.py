"""TransE KG embeddings: deterministic init, distributed-vs-reference
equivalence (the real broadcast-params epoch pass), and link-prediction
quality on the derived relational KG."""

import numpy as np
import pyarrow as pa
import pytest

from kazu_ray.extras.kgembed import (
    build_vocab,
    encode_triples,
    hash_init,
    link_prediction_eval,
    relational_triples,
    transe_train,
    transe_train_local,
)

SF = "/root/testdata/sf0.001"


def _encoded(ray_session):
    import ray

    triples = relational_triples(SF)
    entities, relations = build_vocab(triples)
    enc = encode_triples(triples, entities, relations).materialize()
    tbl = pa.concat_tables([t for t in ray.get(enc.to_arrow_refs()) if t.num_rows])
    return entities, relations, enc, tbl


def test_hash_init_deterministic():
    a = hash_init(100, 16, salt=3)
    b = hash_init(100, 16, salt=3)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, hash_init(100, 16, salt=4))
    bound = 6.0 / np.sqrt(16)
    assert np.abs(a).max() <= bound
    # no degenerate rows
    assert np.linalg.norm(a, axis=1).min() > 0


def test_vocab_and_encoding(ray_session):
    entities, relations, enc, tbl = _encoded(ray_session)
    assert entities == sorted(entities) and relations == sorted(relations)
    assert relations == ["in_nation", "in_region"]
    # nations appear as both subjects and objects -> single entity id
    assert sum(1 for e in entities if e.startswith("N")) == 25
    n_tr = tbl.num_rows
    assert n_tr == 150 + 10 + 25
    assert tbl.column("h").to_numpy().max() < len(entities)


def test_distributed_matches_reference(ray_session):
    """The broadcast-params epoch pass with sparse per-batch gradient
    partials reproduces the single-process full-batch reference."""
    entities, relations, enc, tbl = _encoded(ray_session)
    # repartition so the epoch pass really runs multi-batch
    enc8 = enc.repartition(8).materialize()
    E_d, R_d, loss_d = transe_train(enc8, entities, relations, epochs=5)
    E_l, R_l, loss_l = transe_train_local(tbl, entities, relations, epochs=5)
    assert np.abs(E_d - E_l).max() <= 1e-9
    assert np.abs(R_d - R_l).max() <= 1e-9
    assert np.abs(np.array(loss_d) - np.array(loss_l)).max() <= 1e-9


def test_link_prediction_quality(ray_session):
    import ray.data as rd

    entities, relations, enc, tbl = _encoded(ray_session)
    E, R, losses = transe_train_local(tbl, entities, relations, epochs=200)
    assert losses[-1] <= 0.2 * losses[0]
    hits, mrr = link_prediction_eval(rd.from_arrow(tbl), E, R)
    assert hits[1] >= 0.8
    assert hits[10] >= 0.95
    assert mrr >= 0.85
    # far above the random tail baseline
    assert hits[1] > 20.0 / len(entities)


def test_geometry_learned(ray_session):
    """Customers of the same nation must land nearer each other than
    customers of different nations (the h + r ~ t geometry)."""
    import ray

    entities, relations, enc, tbl = _encoded(ray_session)
    E, R, _ = transe_train_local(tbl, entities, relations, epochs=200)
    eidx = {n: i for i, n in enumerate(entities)}
    rows = [
        (r["h"], r["t"])
        for r in enc.take_all()
        if entities[r["h"]].startswith("C")
    ]
    by_nation: dict[int, list[int]] = {}
    for h, t in rows:
        by_nation.setdefault(t, []).append(h)
    groups = [v for v in by_nation.values() if len(v) >= 2][:5]
    intra, inter = [], []
    for gi, g in enumerate(groups):
        a = E[g[0]]
        intra.append(np.linalg.norm(a - E[g[1]]))
        other = groups[(gi + 1) % len(groups)]
        inter.append(np.linalg.norm(a - E[other[0]]))
    assert np.mean(intra) < np.mean(inter)


def test_train_on_flagship_edges(ray_session, compiled_dicts):
    """The trainer consumes the KG pipeline's own edge table unchanged:
    vocab from the emitted CURIEs, training converges, and the
    distributed path stays equivalent on real (skewed) triples."""
    import ray

    from kazu_ray.pipelines.kg import edges_pipeline
    from kazu_ray.sources.interleave import interleaved_docs

    edges = edges_pipeline(interleaved_docs(SF), compiled_dicts).select_columns(
        ["subj", "pred", "obj"]
    ).materialize()
    entities, relations = build_vocab(edges)
    assert "mentions" in relations or "maps_to" in relations
    enc = encode_triples(edges, entities, relations).materialize()
    tbl = pa.concat_tables([t for t in ray.get(enc.to_arrow_refs()) if t.num_rows])
    E_d, R_d, loss_d = transe_train(enc, entities, relations, epochs=5)
    E_l, R_l, loss_l = transe_train_local(tbl, entities, relations, epochs=5)
    assert np.abs(E_d - E_l).max() <= 1e-9
    E, R, losses = transe_train_local(tbl, entities, relations, epochs=100)
    assert losses[-1] < losses[0]
