"""The driver records the FIRST 50 queries() entries — this pins the
window's composition so dict-order drift can't silently evict the
gate table or an oracle-checked query (round-5 regression: a mid-dict
insertion pushed approx_metrics to rank 51)."""

import ray


def test_recorded_window_composition(ray_session):
    import __ray_entry__ as E

    names = list(E.queries().keys())
    oracles = set(E.oracle_sql().keys())
    assert names[:50] == list(E.RECORDED_50)

    recorded = names[:50]
    # the gate surfaces MUST be driver-recorded every round
    assert "approx_metrics" in recorded
    assert "gates_failing" in recorded
    assert "kg_eval" in recorded and "transformer_eval" in recorded

    # exactly the six essential rows-only surfaces lack oracles; every
    # other recorded query is DuckDB-checked by the driver
    no_oracle = [n for n in recorded if n not in oracles]
    assert no_oracle == [
        "kg_edges",
        "kg_nodes",
        "kg_eval",
        "ner_entities",
        "transformer_eval",
        "approx_metrics",
    ]

    # everything stays registered and callable past the window
    assert len(names) == len(set(names)) >= 109
