"""Smoke: every queries() entry runs at sf0.001 and returns rows with a
stable schema; entry() returns the flagship result."""

import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"

NON_ORACLE = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


def test_oracle_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", NON_ORACLE)
def test_non_oracle_queries_run(ray_session, name):
    res = entrymod.queries()[name](SF)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    df = pd.DataFrame(res)
    assert len(df.columns) > 0
    if name in ("kg_eval", "transformer_eval"):
        assert df["precision"].iloc[0] >= 0.95
        assert df["recall"].iloc[0] >= 0.95
    elif name in ("minhash_recall", "ivf_recall"):
        assert bool(df["passes"].iloc[0])
    elif name in ("sessions_equivalence", "neardup_cc_equivalence"):
        assert bool(df["paths_equal"].iloc[0])
    elif name in ("kg_edges", "kg_nodes", "ner_entities", "media_features", "simhash"):
        assert len(df) > 0


def test_entry(ray_session):
    df = entrymod.entry()
    assert len(df) > 0
    assert {"subj", "pred", "obj", "n_docs", "confidence"} <= set(df.columns)
