"""Distributed BPE training: fit equivalence vs single-process
reference, apply equality, partition invariance, and the canonical
Sennrich toy example."""

import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.bpe import (
    bpe_token_counts,
    encode_word,
    fit_bpe,
    learn_merges,
    reference_word_counts,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def test_gate_passes(ray_session):
    from kazu_ray.extras.metrics import q_bpe_gate

    m = q_bpe_gate(SF).iloc[0]
    assert m["passes"], dict(m)


def test_word_counts_match_reference(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = word_counts(ds)
    exp = reference_word_counts(f"{SF}/documents.parquet")
    assert got.equals(exp)


def test_partition_invariance(ray_session):
    ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ds9 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).repartition(9)
    assert fit_bpe(ds1) == fit_bpe(ds9)


def test_sennrich_toy_example():
    """The worked example shape from Sennrich et al. 2016 §3.2: with
    'lower' dominating, ('l', 'o') then ('lo', 'w') merge early and the
    frequent word collapses to one token before rare words do."""
    import pandas as pd

    wc = pd.DataFrame(
        {"word": ["low", "lower", "newest", "widest"], "n": [50, 20, 6, 3]}
    )
    merges = learn_merges(wc, n_merges=10)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("low", ranks) == ["low</w>"]
    # unseen word falls back to learned subwords, never crashes
    toks = encode_word("lowest", ranks)
    assert toks[0] == "low"
    assert "".join(toks) == "lowest</w>"


def test_encoder_matches_training_segmentation(ray_session):
    """Applying ranked merges to a training word reproduces exactly the
    segmentation training left it with (the standard BPE property)."""
    docs = ["banana bandana banana", "cabana banana bans"] * 30
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(docs),
            }
        )
    )
    merges = fit_bpe(ds, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("banana", ranks) == ["banana</w>"]
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(ds, merges).take_all()}
    # doc 0: banana(1) bandana(?) banana(1) — all tokens positive, stable
    assert rows[0] >= 3
    assert rows[0] == rows[2]


def test_empty_and_null_docs(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["", None], pa.string()),
            }
        )
    )
    merges = fit_bpe(ds)
    assert merges == []
    rows = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(ds, merges).take_all()}
    assert rows == {0: 0, 1: 0}
