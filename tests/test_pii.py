"""PII scan/redact operator: edge semantics the oracle hash can't
explain on its own (distractors, redaction order, empty input), plus
the sf0.001 cross-engine parity (sf0.01 runs in test_oracle_parity)."""

import duckdb
import pandas.testing as pt
import pyarrow as pa

from kazu_ray.extras.pii import pii_redact_batch, pii_scan_oracle_sql, q_pii_scan

SF = "/root/testdata/sf0.001"


def _scan(text: str) -> dict:
    out = pii_redact_batch(pa.table({"doc_id": [0], "text": [text]}))
    return out.to_pylist()[0]


def test_counts_and_redaction():
    r = _scan("mail a.b+1@x.co or b@y.org, host 10.0.0.1, tel 415-555-1234.")
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (2, 1, 1)
    assert r["redacted"] == "mail <EMAIL> or <EMAIL>, host <IP>, tel <PHONE>."


def test_distractors():
    # no TLD -> not an email; naive IPv4 over-triggers on 999.1.2.3
    r = _scan("user@localhost and 999.1.2.3 and 415-555-12345 and 1.2.3")
    assert r["n_email"] == 0
    assert r["n_ip"] == 1
    assert r["n_phone"] == 0  # \b kills the 5-digit tail match
    assert "<IP>" in r["redacted"] and "user@localhost" in r["redacted"]


def test_email_redacted_before_ip_phone():
    # digits inside an email must not double-redact once it's <EMAIL>
    r = _scan("x 415-555-1234@mail.example.com y")
    assert r["n_email"] == 1
    assert r["redacted"] == "x <EMAIL> y"


def test_url_swallows_embedded_ip():
    # counts run on raw text (the naive IP scan over-triggers on the
    # dotted quad in the path) but URL redaction runs first, so the
    # replacement stream never emits an <IP> for it
    r = _scan("get http://cdn1.example.net/10.0.3.7/pkg now, node 10.0.0.1")
    assert (r["n_url"], r["n_ip"]) == (1, 2)
    assert r["redacted"] == "get <URL> now, node <IP>"


def test_empty_batch():
    out = pii_redact_batch(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert out.num_rows == 0 and out.column_names == [
        "doc_id", "n_url", "n_email", "n_ip", "n_phone", "redacted",
    ]


def test_parity_sf0001(ray_session):
    got = q_pii_scan(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(pii_scan_oracle_sql()).fetchdf().reset_index(drop=True)
    pt.assert_frame_equal(got, exp, check_dtype=False)
    # injections actually fired (non-trivial parity)
    assert got["n_email"].sum() > 0 and got["n_ip"].sum() > 0 and got["n_phone"].sum() > 0
