"""HTML → text extraction (the first stage of every web corpus).

C4 (Raffel et al. 2020), CCNet (Wenzek et al. 2020), RefinedWeb
(Penedo et al. 2023) and Dolma all start from crawled markup and
extract visible text before any quality/dedup stage runs. The
extractor below is a DETERMINISTIC, engine-portable regex chain —
deliberately not a browser-grade parser: the contract is that the
same bytes produce the same text on every executor and on the DuckDB
oracle, which is what a reproducible pipeline needs (trafilatura-
style readability scoring is explicitly out of scope; the chain is
the C4-class "strip markup, keep visible text" stage).

Extraction chain, in fixed order (each step is one global
regexp_replace / literal replace, pure Column expressions, no UDF):

1. comments ``<!-- ... -->`` removed (invisible);
2. ``<script>...</script>`` and ``<style>...</style>`` blocks
   removed INCLUDING their content (scripts are not text);
3. line-breaking tags (``<br>``, and the CLOSERS of p/div/h1-6/li/
   tr/ul/ol/table/blockquote/title) become a newline — paragraph
   structure survives tag stripping;
4. every remaining tag becomes a single space (inline tags must not
   weld ``bold</b>text`` into one word);
5. the common character entities decode, ``&amp;`` LAST so
   ``&amp;lt;`` yields the literal ``&lt;`` (double-decode is the
   classic extractor bug);
6. whitespace canonicalization: runs of space/tab/CR collapse to one
   space, spaces around newlines drop, 3+ newlines squeeze to a
   blank line, edges trim.

Every regex used is valid and IDENTICAL in meaning under Java's
engine (Spark) and RE2 (DuckDB): non-greedy ``.*?``, inline
``(?is)`` flags, ``[^>]*`` classes, ``\\b`` word boundaries,
``{3,}`` counted repeats — no backreferences, no lookaround (RE2 has
neither). Entity decode is literal ``replace``, not regex.

Link extraction (``extract_links``) pulls double-quoted ``href``
values from ``<a>`` tags via ``regexp_extract_all`` group 1 —
single-quoted/bare hrefs are out of contract (documented, and the
gate's synthesis only emits quoted ones). ``link_host_edges``
aggregates them into a (src_host, dst_host, n_links) edge list using
``url.url_host`` — the host-level web graph used for crawl
prioritization and spam-domain analysis.

Scale shape: extraction is per-row expressions only (no shuffle
beyond the scan); the edge list is one explode + one content-keyed
groupBy — a hot host pair is a single aggregation key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from annotation_service_spark.functions.url import url_host

# Step-3 pattern: tags that imply a line break in visible text.
_BREAK_TAGS = (
    r"(?i)<br\s*/?>"
    r"|</(?:p|div|h[1-6]|li|tr|ul|ol|table|blockquote|title)\s*>"
)

# (entity, replacement) in DECODE ORDER — '&amp;' must be last.
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def decode_entities(c: Column) -> Column:
    """Literal entity decode in the fixed documented order."""
    for ent, rep in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return c


def _squeeze_ws(c: Column) -> Column:
    """Whitespace canonicalization (step 6): explicit char classes,
    not ``\\s`` — Java's ``\\s`` includes ``\\x0B``, RE2's does not,
    so the class is spelled out to keep both engines identical."""
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" *\n *", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")


def html_to_text(html: Column) -> Column:
    """The 6-step extraction chain as one Column expression."""
    c = F.regexp_replace(html, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", "")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", "")
    c = F.regexp_replace(c, _BREAK_TAGS, "\n")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    c = decode_entities(c)
    return _squeeze_ws(c)


def html_title(html: Column) -> Column:
    """First ``<title>`` content, entity-decoded and space-collapsed
    ('' when the page has none — never NULL, so downstream group keys
    stay total). Reads the RAW markup: a commented-out or
    script-embedded <title> earlier in the byte stream wins over a
    live one — acceptable for the crawl-metadata use (real pages put
    <title> first in <head>), documented rather than paying a second
    comment-strip pass on every page."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1)
    t = decode_entities(t)
    t = F.regexp_replace(t, r"[ \t\r\n\f]+", " ")
    return F.regexp_replace(t, r"^ +| +$", "")


def extract_html_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Per-page extraction table: (id, title, clean_text, n_chars).

    Pure per-row expressions — the plan is a scan plus one project,
    nothing shuffles; at 100 TB this is embarrassingly parallel and
    whole-stage-codegen'd end to end."""
    clean = html_to_text(F.col(html_col))
    return docs.select(
        F.col(id_col).alias("id"),
        html_title(F.col(html_col)).alias("title"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars"),
    )


def extract_links(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
) -> DataFrame:
    """Exploded (id, href) of every double-quoted ``<a ... href="...">``
    value, in document order. Empty hrefs are kept (they are real —
    self-links); pages without links contribute no rows."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit(r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"'), F.lit(1)
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(hrefs).alias("href")
    )


def link_host_edges(
    docs: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    src_url_col: str = "url",
) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links), the
    crawl-frontier / spam-domain edge list. Relative hrefs (no
    scheme) resolve to the SOURCE host — the common case inside a
    site; unparseable source URLs yield src_host '' rather than
    dropping the page's outlinks.

    Plan: explode (linear in total links) then ONE content-keyed
    groupBy — a host pair appearing 10^9 times is one aggregation
    key with map-side partial counts."""
    links = docs.select(
        url_host(F.col(src_url_col)).alias("src_host"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col),
                F.lit(r'(?is)<a\b[^>]*\bhref\s*=\s*"([^"]*)"'),
                F.lit(1),
            )
        ).alias("href"),
    )
    # url_host yields '' (not NULL) for scheme-less strings — that is
    # exactly the relative-href case, which resolves to the source host.
    h = url_host(F.col("href"))
    dst = F.when(h != "", h).otherwise(F.col("src_host"))
    return (
        links.select("src_host", dst.alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
