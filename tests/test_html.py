"""HTML → text extraction + link graph (functions/html.py).

Three layers:
- goldens: handwritten expected outputs for the tricky branches
  (nested-looking script bodies, double-encoded entities, inline
  welds, break tags in mixed case);
- an INDEPENDENT differential: a reference extractor built on
  stdlib ``html.parser.HTMLParser`` (event-driven tokenizer —
  completely different machinery from the regex chain) must produce
  the same text for every page in a generated corpus;
- link semantics: quoted-href-only contract, relative-href
  resolution to the source host, '' source for unparseable URLs.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import functions as F

from annotation_service_spark.functions.html import (
    ENTITIES,
    extract_html_text,
    extract_links,
    html_title,
    html_to_text,
    link_host_edges,
)

BREAK_CLOSERS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "tr", "ul", "ol", "table", "blockquote", "title",
}


class _RefExtractor(HTMLParser):
    """Event-driven reference: same CONTRACT as html_to_text, totally
    different implementation (tokenizing parser, not regexes)."""

    def __init__(self):
        super().__init__(convert_charrefs=False)
        self.parts: list[str] = []
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in ("script", "style"):
            self.skip_depth += 1
        elif tag == "br":
            self.parts.append("\n")
        else:
            self.parts.append(" ")

    def handle_startendtag(self, tag, attrs):
        if tag == "br":
            self.parts.append("\n")
        else:
            self.parts.append(" ")

    def handle_endtag(self, tag):
        if tag in ("script", "style"):
            self.skip_depth = max(0, self.skip_depth - 1)
        elif tag in BREAK_CLOSERS:
            self.parts.append("\n")
        else:
            self.parts.append(" ")

    def handle_data(self, data):
        if not self.skip_depth:
            self.parts.append(data)

    def handle_entityref(self, name):
        if not self.skip_depth:
            self.parts.append(f"&{name};")

    def handle_charref(self, name):
        if not self.skip_depth:
            self.parts.append(f"&#{name};")


def ref_extract(html: str) -> str:
    # comments are invisible; the regex chain removes them without a
    # trace, HTMLParser reports them via handle_comment (ignored here)
    p = _RefExtractor()
    p.feed(html)
    p.close()
    text = "".join(p.parts)
    for ent, rep in ENTITIES:
        text = text.replace(ent, rep)
    import re

    text = re.sub(r"[ \t\r\f]+", " ", text)
    text = re.sub(r" *\n *", "\n", text)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return re.sub(r"^[ \n]+|[ \n]+$", "", text)


def _one(spark, html: str):
    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    return extract_html_text(df).collect()[0]


def test_golden_full_page(spark):
    row = _one(
        spark,
        "<html><head><title> A &amp; B </title>"
        "<style>p{x}</style></head>"
        "<body><!-- c --><P>one <b>two</b>three.</P>"
        "<script>var a='<p>not text</p>';</script>"
        "<div>four<br/>five&nbsp;&#39;6&#39;</div></body></html>",
    )
    assert row.title == "A & B"
    # title closer breaks the line; inline <b> became spaces (no weld)
    assert row.clean_text == "A & B\none two three.\nfour\nfive '6'"
    assert row.n_chars == len(row.clean_text)


def test_golden_double_encoded_entity(spark):
    # &amp;lt; decodes ONCE (to the literal '&lt;'), never twice
    row = _one(spark, "<p>x &amp;lt; y</p>")
    assert row.clean_text == "x &lt; y"


def test_golden_no_markup_passthrough(spark):
    row = _one(spark, "plain   text\n\n\n\n\nwith gaps")
    assert row.title == ""
    assert row.clean_text == "plain text\n\nwith gaps"


def test_golden_mixed_case_tags(spark):
    row = _one(spark, "<DIV>a<BR>b</DIV><TABLE><TR><TD>c</TD></TR></TABLE>")
    assert row.clean_text == "a\nb\nc"


def test_differential_vs_htmlparser(spark):
    """The regex chain and the event-driven stdlib parser agree on a
    generated corpus covering every branch combination."""
    words = ["alpha", "beta", "gamma", "delta", "&amp;", "&#39;x&#39;"]
    pages = []
    for i in range(60):
        w = words[i % len(words)]
        body = {
            0: f"<p>{w} one</p><div>{w}<br/>two</div>",
            1: f"<ul><li>{w}</li><li>b&nbsp;c</li></ul>",
            2: f"<script>no {w}</script><P>kept {w}</P>",
            3: f"<style>.x{{}}</style><h2>head {w}</h2>tail",
            4: f"{w} bare text {i}",
            5: f"<table><tr><td>{w}</td><td>{i}</td></tr></table>",
        }[i % 6]
        title = f"<title>T {i} &amp; co</title>" if i % 4 else ""
        pages.append((i, f"<html><head>{title}</head><body>{body}</body></html>"))
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {r.id: r.clean_text for r in extract_html_text(df).collect()}
    for i, html in pages:
        assert got[i] == ref_extract(html), f"page {i}: {html!r}"


def test_extract_links_contract(spark):
    html = (
        '<a href="https://a.com/1">x</a>'
        "<a href='https://single.quoted/skip'>y</a>"
        '<A HREF="/rel">z</A>'
        '<a class="k" href="">empty</a>'
        "<a>no href</a>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = extract_links(df).collect()
    assert [r.href for r in rows] == ["https://a.com/1", "/rel", ""]
    assert all(r.id == 7 for r in rows)


def test_link_host_edges_resolution(spark):
    pages = [
        # absolute + relative from a parseable source
        (0, '<a href="https://B.com:443/p">1</a><a href="/x">2</a>',
         "https://Src.org/d"),
        # unparseable source: relative target resolves to ''
        (1, '<a href="/y">1</a><a href="http://c.net/z">2</a>',
         "garbage"),
        # no links at all → no rows
        (2, "<p>nothing</p>", "https://src.org/e"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string, url string")
    edges = {
        (r.src_host, r.dst_host): r.n_links
        for r in link_host_edges(df).collect()
    }
    assert edges == {
        ("src.org", "b.com"): 1,
        ("src.org", "src.org"): 1,
        ("", ""): 1,
        ("", "c.net"): 1,
    }


def test_title_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (0, "<title>  lots   of\n\nspace  </title>"),
            (1, "<p>no title</p>"),
            (2, "<TITLE lang=x>Attr &quot;T&quot;</TITLE>"),
        ],
        "doc_id long, html string",
    )
    got = {r.id: r.title for r in extract_html_text(df).collect()}
    assert got == {0: "lots of space", 1: "", 2: 'Attr "T"'}


def test_clean_is_idempotent(spark):
    """Running the chain on its own output is a no-op (no tags or
    undecoded entities from our set survive pass one; note a decoded
    '&lt;' literal re-decodes by design — the chain's domain is raw
    markup, so feed pages without double-encoded entities here)."""
    pages = [
        (i, f"<div>w{i}<br/>x&nbsp;y</div><p>z {i}</p>") for i in range(8)
    ]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    once = extract_html_text(df).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("html")
    )
    twice = extract_html_text(once)
    a = {r.id: r.clean_text for r in once.withColumnRenamed("html", "t")
         .select(F.col("doc_id").alias("id"), F.col("t").alias("clean_text"))
         .collect()}
    b = {r.id: r.clean_text for r in twice.collect()}
    assert a == b


def test_column_helpers_null_safe(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, html string")
    row = df.select(
        html_to_text(F.col("html")).alias("t"),
        html_title(F.col("html")).alias("ti"),
    ).collect()[0]
    # regexp_replace of NULL stays NULL — extraction never invents text
    assert row.t is None and row.ti is None


def test_html_pipeline_stage_interplay(spark):
    """The composed markup-rooted pipeline: chrome the extractor
    turns into corpus-repeated lines is removed as boilerplate,
    per-doc unique text survives, and docs whose EXTRACTED text hits
    the blocklist are gone entirely."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = em.q_html_pipeline(spark, sf)
    rows = out.collect()
    assert rows, "pipeline produced no survivors"
    all_text = "\n".join(r.clean_text for r in rows)
    # extractor-generated chrome lines are hot (df >> 15) -> removed
    assert "second line" not in all_text
    assert "item&lt;2" not in all_text
    # survivors keep fewer lines than they had
    assert all(r.n_kept <= r.n_lines for r in rows)
    # blocklist stage ran on EXTRACTED text: no survivor contains the
    # blocked token 'dup' as a whole token
    toks = set(
        t
        for r in rows
        for t in __import__("re").split(r"[^a-z0-9]+", r.clean_text.lower())
    )
    assert "dup" not in toks
    # and the pipeline is selective, not degenerate
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert 0 < len(rows) < n_docs
