"""HTML boilerplate removal: handwritten realistic-page goldens (the
extractor must be generic, not generator-aware), generator round-trip
recovery, link census parity, and degenerate inputs."""
import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from kazu_ray.extras.html_extract import (
    extract_links,
    extract_main_text,
    html_extract_oracle_sql,
    html_links_oracle_sql,
    q_html_extract,
    q_html_links,
)

SF = "/root/testdata/sf0.001"

# A realistic page the generator never produces: attributes everywhere,
# nested inline markup, entities, uppercase tags, a cookie banner, and
# a short tail paragraph that must be fused into the article.
REALISTIC = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>Acme Blog &mdash; Shipping the parser</title>
<style type="text/css">.nav a { color: red; } /* <p> inside css */</style>
<script>if (x < 3 && y > 2) { track("</div>"); }</script>
</head>
<BODY class="post">
<DIV id="cookie-banner">We use cookies. <a href="/cookies">Learn more</a> <a href="/accept">Accept</a></DIV>
<nav class="top"><a href="/">Home</a><a href="/blog">Blog</a><a href="/docs">Docs</a><a href="/pricing">Pricing</a></nav>
<article>
<h1>Shipping the parser</h1>
<P class="lead">We rewrote the <em>entire</em> tokenizer last month and the new
version handles nested &lt;tags&gt; &amp; entities without any backtracking at all.</P>
<p>Benchmarks show a 4&#39;s place improvement on the &quot;worst case&quot; corpus,
which previously took hours to finish on the old engine.</p>
<p>Try it today.</p>
</article>
<aside><h3>Related</h3><ul><li><a href="/p/1">Parsing 101</a></li><li><a href="/p/2">Lexer tricks</a></li></ul></aside>
<footer><a href="/terms">Terms</a> | <a href="/privacy">Privacy</a> | <a href="/">&copy; Acme</a></footer>
</BODY></html>"""

REALISTIC_EXPECTED = (
    "We rewrote the entire tokenizer last month and the new version "
    "handles nested <tags> & entities without any backtracking at all. "
    "Benchmarks show a 4's place improvement on the \"worst case\" corpus, "
    "which previously took hours to finish on the old engine. "
    "Try it today."
)


def _extract_one(html: str) -> str:
    tbl = pa.table({"doc_id": [1], "html": [html]})
    out = extract_main_text(tbl)
    return out.column("main_text")[0].as_py()


def test_realistic_page_golden():
    # cookie banner, nav, h1, aside, footer all dropped; the short tail
    # paragraph ("Try it today." — 3 words) fuses into the article; the
    # uppercase <P>/<DIV>/<BODY> tags and entities decode correctly.
    assert _extract_one(REALISTIC) == REALISTIC_EXPECTED


def test_script_style_comment_content_never_leaks():
    html = (
        "<html><body><script>var a = 'ten words of junk that must "
        "never appear in output';</script><style>p{}</style>"
        "<!-- twelve more boilerplate words hiding inside an html "
        "comment block here --><p>the one real paragraph of this tiny "
        "page has exactly fourteen words in it</p></body></html>"
    )
    got = _extract_one(html)
    assert got == (
        "the one real paragraph of this tiny page has exactly "
        "fourteen words in it"
    )


def test_link_dense_block_dropped_even_if_long():
    items = " ".join(
        f'<a href="/x/{i}">navigation entry number {i}</a>' for i in range(12)
    )
    html = f"<div>{items}</div><p>real content paragraph with nine plain words inside it</p>"
    assert _extract_one(html) == (
        "real content paragraph with nine plain words inside it"
    )


def test_short_leading_block_not_fused():
    # fusion is prev-core only: a headline BEFORE the first core block
    # stays out, a short tail AFTER it comes in.
    html = (
        "<h2>Tagline here</h2><p>first real paragraph carrying more than "
        "eight whole words of body text</p><p>short tail.</p>"
    )
    assert _extract_one(html) == (
        "first real paragraph carrying more than eight whole words of "
        "body text short tail."
    )


def test_degenerate_pages():
    assert _extract_one("") == ""
    assert _extract_one("<nav><a href='/'>Home</a></nav>") == ""
    assert _extract_one("plain text with no markup but nine words total here") == (
        "plain text with no markup but nine words total here"
    )


def test_extract_links_dedup():
    tbl = pa.table(
        {
            "doc_id": [7],
            "html": ['<a href="/a">x</a><a href="/a">y</a><a href="/b">z</a>'],
        }
    )
    out = extract_links(tbl).to_pydict()
    assert sorted(out["href"]) == ["/a", "/b"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return c


def _parity(ds, sql, con):
    got = ds.to_pandas()
    exp = con.execute(sql).fetchdf()
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = exp[cols].sort_values(cols).reset_index(drop=True)
    assert a.shape == b.shape
    for c in cols:
        assert (a[c].values == b[c].values).all(), c


def test_extract_recovery_oracle(ray_session, con):
    # the oracle encodes ZERO extraction rules — recovery of the exact
    # source text proves scoring dropped all chrome and kept all body.
    _parity(q_html_extract(SF), html_extract_oracle_sql(), con)


def test_links_oracle(ray_session, con):
    _parity(q_html_links(SF), html_links_oracle_sql(), con)


def test_extract_anchor_pairs_texts_and_multi_text_href():
    from kazu_ray.extras.html_extract import extract_anchor_pairs

    html = (
        '<a href="/x">First</a> body '
        '<a href="/x">Second &amp; more</a> '
        '<a href="/y"><b>Bold</b> text</a>'
    )
    t = pa.table({"doc_id": [1], "html": [html]})
    got = extract_anchor_pairs(t).sort("href", "txt").to_dicts()
    assert got == [
        {"doc_id": 1, "href": "/x", "txt": "First"},
        {"doc_id": 1, "href": "/x", "txt": "Second & more"},
        {"doc_id": 1, "href": "/y", "txt": "Bold text"},
    ]


def test_anchor_texts_oracle_parity(ray_session, con):
    from kazu_ray.extras.html_extract import (
        anchor_texts_oracle_sql,
        q_anchor_texts,
    )

    got = q_anchor_texts(SF).to_pandas().reset_index(drop=True)
    exp = con.execute(anchor_texts_oracle_sql()).df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # '/' carries two anchors per page: nav Home + per-host footer
    root = got[got["href"] == "/"].iloc[0]
    assert root["n_anchors"] == 2 * root["n_docs"]
    assert root["anchor_texts"].startswith("Home|")
