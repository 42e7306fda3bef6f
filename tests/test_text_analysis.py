

def test_bpe_pretoken_count_parity_and_spec():
    """The RE2-safe GPT-2-ish pre-tokenizer: identical counts from
    Python re and DuckDB, and hand-checked splits."""
    import duckdb
    import pyarrow as pa

    from kazu_ray.extras.text_analysis import (
        _BPE_RE,
        bpe_token_count_batch,
        bpe_token_count_oracle_sql,
    )

    # hand-checked: ["it", "'s", " a", " test", "!", " 42", "%"]
    assert _BPE_RE.findall("it's a test! 42%") == [
        "it", "'s", " a", " test", "!", " 42", "%",
    ]
    texts = ["it's John's 3rd run-through... \"quoted!\"", "", "  x  ", "a1b2"]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts)}
    )
    con = duckdb.connect()
    con.register("documents", t)
    got = bpe_token_count_batch(t).to_pandas()
    want = con.execute(bpe_token_count_oracle_sql()).fetchdf()
    import pandas.testing as pt

    pt.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), want, check_dtype=False
    )


def test_json_props_extraction_edges():
    """Vectorized JSON extraction handles missing keys and malformed
    payloads as nulls, matching DuckDB json_extract semantics."""
    import duckdb
    import pyarrow as pa

    from kazu_ray.extras.text_analysis import json_props_batch

    t = pa.table(
        {
            "event_type": ["a", "a", "b", "b"],
            "props": ['{"k": 7}', '{"other": 1}', "not json", '{"k": -13}'],
        }
    )
    rows = json_props_batch(t).to_pylist()
    assert rows[0]["k"] == 7 and rows[0]["k_bucket"] == 0
    assert rows[1]["k"] is None and rows[1]["k_bucket"] is None
    assert rows[2]["k"] is None
    con = duckdb.connect()
    got = [r[0] for r in con.execute(
        "SELECT CAST(json_extract(props, '$.k') AS BIGINT) FROM "
        "(SELECT unnest(['{\"k\": 7}', '{\"other\": 1}', '{\"k\": -13}']) AS props)"
    ).fetchall()]
    assert got == [7, None, -13]


def test_source_mode_tie_break(ray_session):
    """Deterministic tie-break: equal counts resolve to the
    lexicographically smaller token on both engines."""
    import os
    import tempfile

    import duckdb
    import pandas as pd

    from kazu_ray.extras.text_analysis import (
        q_source_mode,
        source_mode_oracle_sql,
    )

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b"],
            "text": ["zz yy", "yy zz", "solo"],  # a: yy==zz tie -> yy
        }
    )
    with tempfile.TemporaryDirectory() as d:
        df.to_parquet(os.path.join(d, "documents.parquet"))
        got = q_source_mode(d).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        exp = con.execute(source_mode_oracle_sql()).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    by = dict(zip(got["source"], got["mode_tok"]))
    assert by == {"a": "yy", "b": "solo"}
