"""Gopher/C4 quality heuristics (extras/quality.py).

Scalar-spec vectors are hand-computed from the published definitions
(Rae et al. 2021 A1.1; Raffel et al. 2020 §2.2); the DuckDB parity test
pins the oracle contract over adversarial texts (ties in the top-n-gram
mode, repeated runs, symbol-heavy docs)."""

import duckdb
import pyarrow as pa

from kazu_ray.extras.quality import (
    GOPHER_THRESHOLDS,
    QUERY_THRESHOLDS,
    quality_filter_batch,
    quality_filter_oracle_sql,
    quality_signals_batch,
    quality_signals_oracle_sql,
)


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
            "text": pa.array(texts),
        }
    )


def _sig(text):
    return quality_signals_batch(_batch([text])).to_pylist()[0]


def test_basic_signals_hand_computed():
    s = _sig("the cat and the cat sat")
    # words: the cat and the cat sat -> 6 words, 18 chars (3 each)
    assert s["n_words"] == 6
    assert s["mean_word_len"] == 18 / 6
    assert s["alpha_word_frac"] == 1.0
    assert s["symbol_ratio"] == 0.0
    # distinct stopwords present: the, and -> 2
    assert s["stop_hits"] == 2
    # bigrams: "the cat"×2, others ×1 -> top2 = 2 * 6 chars / 18
    assert s["top2gram_frac"] == (2 * 6) / 18


def test_symbol_and_alpha_signals():
    s = _sig("alpha # beta ... 123 456")
    # words: alpha beta 123 456 -> 4; symbols: one '#', one '...'
    assert s["n_words"] == 4
    assert s["symbol_ratio"] == 2 / 4
    assert s["alpha_word_frac"] == 2 / 4


def test_empty_and_tiny_docs():
    out = quality_signals_batch(_batch(["", "word"])).to_pylist()
    assert out[0]["n_words"] == 0
    assert out[0]["top2gram_frac"] == 0.0
    assert out[1]["n_words"] == 1
    assert out[1]["top2gram_frac"] == 0.0  # no bigram exists


def test_top_ngram_tie_break_deterministic():
    # "aa bb" and "bb aa" both occur twice; tie broken lexicographically
    text = "aa bb aa bb aa"
    s = _sig(text)
    # bigrams: aa bb (2), bb aa (2); chars each 4; total word chars 10
    assert s["top2gram_frac"] == (2 * 4) / 10


def test_repetitive_doc_fails_filter():
    spam = "buy now " * 40  # 80 words, top bigram covers everything
    sig = _sig(spam)
    assert sig["top2gram_frac"] == 1.0
    # overlapping trigram occurrences legitimately push the fraction >1
    assert sig["top3gram_frac"] > 1.0
    out = quality_filter_batch(_batch([spam])).to_pylist()[0]
    assert not out["keep"]
    # rule order: the stopword gate fires before the repetition gates
    assert out["reason"] == "stopwords"
    # with the stopword gate disabled the repetition gate catches it
    out2 = quality_filter_batch(
        _batch([spam]), {"min_stop_hits": 0, "min_words": 10}
    ).to_pylist()[0]
    assert not out2["keep"] and out2["reason"] == "top2gram"


def test_good_doc_passes_published_thresholds():
    text = (
        "the quick brown fox jumps over that lazy dog while many other "
        "animals gather near the river to watch events unfold in quiet "
        "wonder as evening light settles softly over distant wooded hills "
        "and the water keeps moving past stones that have rested there "
        "for countless years beyond memory of any living creature nearby"
    )
    sig = _sig(text)
    assert sig["n_words"] >= GOPHER_THRESHOLDS["min_words"]
    out = quality_filter_batch(_batch([text])).to_pylist()[0]
    assert out["keep"] and out["reason"] == ""


def test_duckdb_parity_adversarial():
    texts = [
        "the cat and the cat sat",
        "aa bb aa bb aa",
        "buy now " * 40,
        "alpha # beta ... 123 456",
        "",
        "word",
        "x " * 200,
        "the and of to is in that " * 10,
    ]
    con = duckdb.connect()
    con.register("documents", _batch(texts))
    for sql, fn, thresholds in [
        (quality_signals_oracle_sql(), quality_signals_batch, None),
        (quality_filter_oracle_sql(), quality_filter_batch, QUERY_THRESHOLDS),
    ]:
        want = con.execute(sql).fetchdf()
        got = (
            (fn(_batch(texts), thresholds) if thresholds else fn(_batch(texts)))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        import pandas.testing as pt

        pt.assert_frame_equal(got, want, check_dtype=False)


def test_rare_token_ratio_fixture(ray_session):
    """Hand-built corpus: 'zzz' occurs once (rare at threshold 1),
    everything else repeats; counts are CORPUS-global, not per-doc."""
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.quality import rare_token_ratio

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                ["common words zzz common", "common words again", "words common"]
            ),
        }
    )
    got = {
        r["doc_id"]: r
        for r in rare_token_ratio(
            rd.from_arrow(docs), threshold=1, num_partitions=3
        ).take_all()
    }
    # corpus counts: common=4, words=3, again=1, zzz=1
    assert got[0]["n_tokens"] == 4 and got[0]["n_rare"] == 1
    assert got[0]["rare_frac"] == 1 / 4
    assert got[1]["n_rare"] == 1  # 'again'
    assert got[2]["n_rare"] == 0


def test_unigram_lm_fixture(ray_session):
    """Bounded-vocab unigram LM (CCNet-style perplexity): hand-computed
    probabilities on a tiny corpus where vocab_size=2 forces the rare
    token into the shared OOV bucket."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.quality import unigram_lm_scores

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1],
                "text": ["aa bb aa", "aa zz"],
            }
        )
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs, vocab_size=2).take_all()}
    # counts: aa=3, bb=1, zz=1; top-2 by (count desc, token asc) = aa, bb
    # T=5, V_eff=2, denom=8 -> p(aa)=4/8, p(bb)=2/8, p(oov)=1/8
    lp = {"aa": math.log(4 / 8), "bb": math.log(2 / 8), "oov": math.log(1 / 8)}
    d0 = -(2 * lp["aa"] + lp["bb"]) / 3
    d1 = -(lp["aa"] + lp["oov"]) / 2
    assert got[0]["n_tokens"] == 3 and got[1]["n_tokens"] == 2
    assert abs(got[0]["neg_logprob_per_token"] - round(d0, 4)) < 1e-9
    assert abs(got[1]["neg_logprob_per_token"] - round(d1, 4)) < 1e-9
    assert abs(got[0]["ppl"] - round(math.exp(d0), 2)) < 1e-9
    # common-token doc scores lower perplexity than the OOV doc
    assert got[0]["ppl"] < got[1]["ppl"]


# --- within-doc repetition trim --------------------------------------------


def test_repetition_trim_parity_and_fixture(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kazu_ray.extras.metrics import q_repetition_trim_parity
    from kazu_ray.extras.quality import repetition_trim, repetition_trim_oracle_sql

    m = q_repetition_trim_parity("/root/testdata/sf0.001").iloc[0]
    assert m["paths_equal"]
    assert m["n_trimmed"] > 0  # the corpus actually exercises the trim

    # hand fixture: stutters collapse, non-adjacent repeats survive
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "the the the cat sat sat",
                "a b a b a b",
                "x",
            ],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(docs, preserve_index=False))
    got = repetition_trim(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["n_words"].tolist() == [6, 6, 1]
    assert got["n_trimmed"].tolist() == [3, 0, 0]
    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.execute(repetition_trim_oracle_sql()).df()
    assert (got["trimmed_digest"].values == exp["trimmed_digest"].values).all()
