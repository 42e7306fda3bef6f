"""URL canonicalization + per-domain cap (extras/urls.py): rule-level
semantics the oracle hash can't explain on its own, the keep-first-K
combiner's partition invariance, and the sf0.001 cross-engine parity
(sf0.01 runs via test_oracle_parity)."""

import duckdb
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

from kazu_ray.extras.urls import (
    DOMAIN_CAP,
    canonicalize_batch,
    domain_cap_oracle_sql,
    messy_url_expr,
    q_domain_cap,
    q_url_canonical,
    url_canonical_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def _canon(url: str) -> dict:
    out = canonicalize_batch(pa.table({"doc_id": [0], "url": [url]}))
    return out.to_pylist()[0]


def test_fragment_and_trailing_slash_stripped():
    r = _canon("https://a.b.com/x/y/#frag")
    assert r["canonical_url"] == "https://a.b.com/x/y"


def test_utm_params_dropped_others_preserved_in_order():
    r = _canon("https://a.com/p?utm_source=f&id=3&utm_campaign=x&q=z")
    assert r["canonical_url"] == "https://a.com/p?id=3&q=z"
    # all params tracking -> no '?' at all
    r = _canon("https://a.com/p?utm_source=f&utm_medium=m")
    assert r["canonical_url"] == "https://a.com/p"


def test_host_lowercased_www_stripped_scheme_lowered():
    r = _canon("HTTPS://WWW.News.Example.COM/P")
    # path case is preserved; host/scheme case is not
    assert r["canonical_url"] == "https://news.example.com/P"
    assert r["domain"] == "example.com"


def test_registered_domain_is_last_two_labels():
    assert _canon("https://a.b.c.d.com/x")["domain"] == "d.com"
    assert _canon("https://d.com/x")["domain"] == "d.com"


def test_www_only_stripped_as_prefix_label():
    # 'www' embedded in a label must survive
    r = _canon("https://wwwx.site.com/p")
    assert r["canonical_url"] == "https://wwwx.site.com/p"


def test_messy_url_exercises_every_rule():
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    urls = pl.from_arrow(tbl).with_columns(url=messy_url_expr())["url"]
    s = urls.to_list()
    assert any("#" in u for u in s)
    assert any("utm_" in u for u in s)
    assert any("WWW." in u for u in s)
    assert any(u.rstrip("#0123456789-sec").endswith("/") for u in s)
    assert any("news." in u.lower() for u in s)


def test_domain_cap_partial_is_a_true_combiner():
    """Keep-first-K must be invariant to how rows are blocked: the
    per-chunk partial + global merge equals the single-pass answer."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    df = pl.from_arrow(tbl).with_columns(url=messy_url_expr())
    canon = pl.from_arrow(canonicalize_batch(df.select("doc_id", "url").to_arrow()))

    def first_k(frame: pl.DataFrame) -> pl.DataFrame:
        return (
            frame.sort("doc_id")
            .group_by("domain", maintain_order=True)
            .head(DOMAIN_CAP)
            .select("doc_id", "domain")
        )

    single = first_k(canon.select("doc_id", "domain")).sort("doc_id")
    # adversarial blocking: interleaved thirds, so every block sees
    # every domain and the per-block heads overlap
    parts = [
        first_k(canon.select("doc_id", "domain").filter(pl.col("doc_id") % 3 == r))
        for r in range(3)
    ]
    merged = first_k(pl.concat(parts)).sort("doc_id")
    assert single.equals(merged)


def test_parity_sf0001(ray_session):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    got = q_url_canonical(SF).to_pandas().reset_index(drop=True)
    exp = con.execute(url_canonical_oracle_sql()).fetchdf().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)

    got_cap = q_domain_cap(SF).to_pandas().reset_index(drop=True)
    exp_cap = con.execute(domain_cap_oracle_sql()).fetchdf().reset_index(drop=True)
    pd.testing.assert_frame_equal(got_cap, exp_cap)
    # the cap must actually bite on this corpus
    assert len(got_cap) < len(got)
    assert got_cap.groupby("domain").size().max() == DOMAIN_CAP


def test_url_hierarchy_parity_and_levels(ray_session):
    import duckdb

    from kazu_ray.extras.urls import q_url_hierarchy, url_hierarchy_oracle_sql

    got = q_url_hierarchy("/root/testdata/sf0.001").to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    exp = con.execute(url_hierarchy_oracle_sql()).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # host-level rows aggregate their children: every 2-level prefix's
    # count is <= its host's count
    hosts = dict(
        zip(got["prefix"], got["n_docs"])
    )
    two_level = got[got["prefix"].str.count("/") == 1]
    for p, n in zip(two_level["prefix"], two_level["n_docs"]):
        assert n <= hosts[p.split("/")[0]]
