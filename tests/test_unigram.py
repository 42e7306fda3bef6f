"""Unigram-LM tokenizer training (Kudo 2018): fit equivalence vs the
single-process reference, apply equality, partition invariance, and
Viterbi segmentation properties."""

import math

import pyarrow as pa
import ray.data as rd

from kazu_ray.extras.bpe import reference_word_counts
from kazu_ray.extras.unigram import (
    fit_unigram,
    seed_vocab,
    train_unigram,
    unigram_token_counts,
    viterbi,
)

SF = "/root/testdata/sf0.001"


def test_gate_passes(ray_session):
    from kazu_ray.extras.metrics import q_unigram_gate

    m = q_unigram_gate(SF).iloc[0]
    assert m["passes"], dict(m)


def test_fit_matches_reference(ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = fit_unigram(ds)
    exp = train_unigram(reference_word_counts(f"{SF}/documents.parquet"))
    assert set(got) == set(exp)
    assert all(abs(got[p] - exp[p]) < 1e-12 for p in got)


def test_partition_invariance(ray_session):
    ds1 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    ds9 = rd.read_parquet(f"{SF}/documents.parquet", columns=["text"]).repartition(9)
    assert fit_unigram(ds1) == fit_unigram(ds9)


def test_seed_vocab_keeps_all_chars():
    import pandas as pd

    wc = pd.DataFrame({"word": ["abc", "bcd", "zq"], "n": [5, 3, 1]})
    seeds = seed_vocab(wc, seed_size=2)
    # every character present regardless of the multi-piece budget
    for ch in "abcdzq":
        assert ch in seeds
    # the two most frequent multi-char substrings won the budget
    multi = [p for p in seeds if len(p) > 1]
    assert len(multi) == 2
    assert "bc" in multi  # count 8, the top substring


def test_viterbi_prefers_fewer_pieces_on_ties():
    # 'ab' as one piece vs 'a'+'b': equal total score -> fewer pieces
    logp = {"a": math.log(0.25), "b": math.log(0.25), "ab": math.log(0.0625)}
    assert viterbi("ab", logp) == ["ab"]


def test_viterbi_unknown_char_coverage():
    logp = {"a": -1.0}
    # 'x' is out-of-vocabulary: segments as its own UNK piece, never crashes
    assert viterbi("axa", logp) == ["a", "x", "a"]


def test_frequent_word_collapses():
    """The unigram-LM analogue of the Sennrich toy check: a dominant
    word ends up segmentable into few pieces (its full form seeds the
    vocabulary and survives EM pruning)."""
    import pandas as pd

    wc = pd.DataFrame(
        {"word": ["banana", "bandana", "cabana"], "n": [100, 5, 3]}
    )
    logp = train_unigram(wc, vocab_size=50, seed_size=100)
    assert "banana" in logp
    assert viterbi("banana", logp) == ["banana"]


def test_apply_counts_match_driver_encode(ray_session):
    docs = ["banana bandana banana", "cabana banana bans"] * 30
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(60), pa.int64()),
                "text": pa.array(docs),
            }
        )
    )
    logp = fit_unigram(ds)
    rows = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in unigram_token_counts(ds, logp).take_all()
    }
    exp0 = sum(len(viterbi(w, logp)) for w in ["banana", "bandana", "banana"])
    exp1 = sum(len(viterbi(w, logp)) for w in ["cabana", "banana", "bans"])
    assert rows[0] == exp0
    assert rows[1] == exp1
    assert rows[58] == exp0 and rows[59] == exp1
