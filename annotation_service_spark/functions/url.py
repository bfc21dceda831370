"""URL canonicalization + URL-level dedup (web-corpus curation).

Real web pipelines dedupe by URL before anything content-based (C4
dedupes pages by URL, Penedo et al. 2023 "RefinedWeb" §3.2 runs exact
URL dedup as its first stage). The canonicalizer below applies the
standard RFC 3986 §6 syntax-based normalizations plus the
tracker-param strip every crawler does:

- percent-encoding normalized (RFC 3986 §6.2.2.1/.2: hex digits
  uppercased, encodings of UNRESERVED characters decoded — %7E → ~,
  %41 → A; reserved characters like %2F stay encoded, so parsing
  structure never changes);
- scheme and host lowercased (path/query case-preserved);
- default ports dropped (http:80, https:443);
- userinfo ('user@') dropped from the authority;
- fragment dropped;
- tracking query params dropped (utm_* plus an exact-name list —
  PARAMETERIZED, because e.g. 'ref' is functional on code hosts:
  callers on non-web corpora pass their own list);
- remaining query params sorted (order-insensitive equality);
- empty path normalized to '/'.

Everything is a pure Column expression (regexp_extract + array ops +
higher-order transform) — no UDF, engine-portable, and DuckDB can
replay it for the oracle gate. A string that doesn't parse as
scheme://... comes back percent-normalized only (trimmed): garbage
in, garbage out beats silent drops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("gclid", "fbclid", "ref", "msclkid")


def _is_tracking(
    p: Column,
    prefixes: Sequence[str],
    exacts: Sequence[str],
) -> Column:
    name = F.split(p, "=")[0]
    cond = F.lit(False)
    for pre in prefixes:
        cond = cond | name.startswith(pre)
    for exact in exacts:
        cond = cond | (name == exact)
    return cond


def _pct_fix(p: Column) -> Column:
    """Normalize ONE '%'-split segment: the leading two characters are
    the (candidate) hex pair of the percent triplet this segment
    began with. Unreserved codepoints (ALPHA / DIGIT / '-' '.' '_'
    '~', RFC 3986 §2.3) decode; everything else re-emits '%' with
    UPPERCASE hex; a malformed pair re-emits the segment verbatim."""
    pair = p.substr(1, 2)
    rest = p.substr(F.lit(3), F.length(p))
    code = F.conv(pair, 16, 10).cast("int")
    unreserved = (
        ((code >= 48) & (code <= 57))
        | ((code >= 65) & (code <= 90))
        | ((code >= 97) & (code <= 122))
        | code.isin(45, 46, 95, 126)
    )
    return F.when(
        pair.rlike("^[0-9A-Fa-f]{2}$"),
        F.when(unreserved, F.concat(F.char(code), rest)).otherwise(
            F.concat(F.lit("%"), F.upper(pair), rest)
        ),
    ).otherwise(F.concat(F.lit("%"), p))


def pct_normalize(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as a pure
    Column expression: split on '%', fix each tail segment, rejoin.
    Only unreserved characters decode, so delimiters ('/', '?', '#',
    '&', '=') can never appear out of an encoding — applying this
    BEFORE parsing is structure-safe."""
    parts = F.split(url, "%", -1)
    fixed_tail = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))),
        _pct_fix,
    )
    return F.concat(F.element_at(parts, 1), F.array_join(fixed_tail, ""))


def canonical_url(
    url: Column,
    tracking_prefixes: Sequence[str] = TRACKING_PREFIXES,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute URL (see module docstring)."""
    u = pct_normalize(F.trim(url))
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    # everything after '://'
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    # drop userinfo, lowercase host[:port]
    hostport = F.lower(
        F.when(
            authority.contains("@"), F.regexp_extract(authority, r"@(.*)$", 1)
        ).otherwise(authority)
    )
    host = F.when(
        ((scheme == "http") & hostport.endswith(":80"))
        | ((scheme == "https") & hostport.endswith(":443")),
        F.regexp_extract(hostport, r"^(.*):[0-9]+$", 1),
    ).otherwise(hostport)
    after_auth = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(after_auth, r"^([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(after_auth, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~_is_tracking(p, tuple(tracking_prefixes), tuple(tracking_params)),
    )
    qs = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(rebuilt)


def url_host(url: Column) -> Column:
    """Lowercased host (no port, no userinfo) of an absolute URL;
    '' when the string has no scheme://authority shape."""
    rest = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    has_scheme = F.trim(url).rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    authority = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    hostport = F.lower(
        F.when(
            authority.contains("@"), F.regexp_extract(authority, r"@(.*)$", 1)
        ).otherwise(authority)
    )
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    return F.when(has_scheme, host).otherwise(F.lit(""))


def domain_suffixes(host: Column) -> Column:
    """All dot-suffixes of a hostname, longest first: 'a.b.c' →
    ['a.b.c', 'b.c', 'c']. Pure higher-order Column expression (the
    lambda index drives an array slice) — this is the matching key
    set for registrable-domain blocklists, where blocking 'ads.net'
    must also block 'cdn.ads.net'."""
    labels = F.split(host, r"\.")
    return F.transform(
        labels,
        lambda _, i: F.array_join(
            F.slice(labels, i + 1, F.size(labels)), "."
        ),
    )


def filter_blocked_hosts(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Host-level blocklist filtering — the OTHER URL stage of a web
    pipeline (public: Penedo et al. 2023 "RefinedWeb" §3.1 filters by
    a URL blocklist before any content work; C4 used a badwords
    list). A document is BLOCKED when any dot-suffix of its URL's
    host appears in ``blocklist`` (so a blocked registrable domain
    covers every subdomain). Returns every input row as
    (id, host, blocked, matched) with ``matched`` the LONGEST (most
    specific) blocklist entry that hit, NULL when clean — callers
    keep ``~blocked`` and log ``matched`` for blocklist auditing.

    Scale shape: the host explodes into its ≤ label-count suffixes
    (bounded linear fan-out, never content-squared) and equi-joins
    the blocklist — a dim table by nature, so Spark broadcasts it;
    the per-document reduce is one groupBy on the id. Garbage URLs
    (no scheme) get host '' and are never blocked — filtering decides
    on evidence, not parse failures."""
    host = url_host(F.col(url_col))
    base = docs.select(F.col(id_col).alias("id"), host.alias("host"))
    cand = base.select(
        "id",
        "host",
        F.explode(domain_suffixes(F.col("host"))).alias("suffix"),
    ).where(F.col("suffix") != "")
    bl = F.broadcast(
        blocklist.select(F.col(domain_col).alias("suffix")).distinct()
    )
    hits = (
        cand.join(bl, "suffix")
        .groupBy("id")
        .agg(F.max_by("suffix", F.length("suffix")).alias("matched"))
    )
    return base.join(hits, "id", "left").select(
        "id",
        "host",
        F.col("matched").isNotNull().alias("blocked"),
        "matched",
    )


def dedup_urls_keep_first(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    tracking_prefixes: Sequence[str] = TRACKING_PREFIXES,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> DataFrame:
    """URL-level exact dedup after canonicalization — the RefinedWeb
    first stage: one document survives per canonical URL, the one
    with the smallest id (a min over values, deterministic under any
    partitioning). Returns (canonical_url, first_id, n_dups). The
    tracker-param list is forwarded to ``canonical_url`` so callers
    on corpora where e.g. '?ref=branch' is functional can shrink it.

    Scale shape: ONE content-keyed groupBy on the canonical string —
    a URL crawled 10^6 times is one aggregation key. No joins."""
    c = canonical_url(
        F.col(url_col),
        tracking_prefixes=tracking_prefixes,
        tracking_params=tracking_params,
    )
    return (
        docs.select(F.col(id_col).alias("id"), c.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("id").alias("first_id"),
            (F.count(F.lit(1)) - 1).cast("long").alias("n_dups"),
        )
    )


def url_path(url: Column) -> Column:
    """Path component of an absolute URL ('/' when empty; '' when the
    string has no scheme://authority shape — mirrors url_host)."""
    rest = F.regexp_replace(F.trim(url), r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    has_scheme = F.trim(url).rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    after_auth = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(after_auth, r"^([^?#]*)", 1)
    return F.when(
        has_scheme, F.when(path == "", F.lit("/")).otherwise(path)
    ).otherwise(F.lit(""))


def filter_robots(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """robots.txt compliance filter — RFC 9309 (public) group-member
    matching for an already-resolved user-agent group: a URL's
    governing rule is the LONGEST rule path that is a byte prefix of
    its path; on a length tie, allow wins (§2.2.2); a URL with no
    matching rule — or whose host has no rules at all — is allowed
    (crawling is opt-out). Wildcards ('*'/'$', the non-normative
    §2.2.3 extension) are deliberately out of contract: this is the
    normative prefix-only matcher, and rule sets using wildcards
    should be pre-expanded by the caller. Unparseable URLs (no
    scheme) have host '' and are allowed only if no '' host rules
    exist — garbage never silently passes a real host's rules.

    ``rules``: (host string, allow boolean, prefix string) — one row
    per Allow/Disallow line of the resolved group, '' prefix matches
    everything (the bare 'Disallow:' line is the EMPTY prefix which
    RFC 9309 defines as matching nothing — callers encode a
    site-wide ban as prefix '/'; '' here therefore also matches
    nothing).

    Returns one row per input URL: (id, host, path, allowed,
    matched_rule) with matched_rule the winning prefix ('' when no
    rule matched). Decision and audit column are both decided by ONE
    deterministic max over the packed ordering key
    lpad(len)+allow+prefix — identical lexicographic rule on both
    engines, no ties possible across distinct outcomes. The 4-digit
    pad bounds rule prefixes at 9999 octets — above both the RFC's
    500 KiB FILE bound per-line practice and Google's 8 KiB line
    cap, and Spark's lpad TRUNCATES past the pad width while
    printf('%04d') widens, so longer prefixes are out of contract
    rather than silently divergent.

    Scale shape: robots rule sets are a DIMENSION (even the full
    crawl's robots corpus is ~10^7 rows); the join is a BROADCAST
    equi-join on host, the prefix test a per-row startswith, the
    winner one id-keyed max — no content-keyed shuffle of the URL
    fact side beyond its own id."""
    u = urls.select(
        F.col(id_col).alias("id"),
        url_host(F.col(url_col)).alias("host"),
        url_path(F.col(url_col)).alias("path"),
    )
    r = rules.select(
        F.col("host"),
        F.col("allow").cast("boolean").alias("allow"),
        F.col("prefix"),
    ).where(F.col("prefix") != "")
    # LEFT join keeps every URL even when its host has rules and none
    # match (the key is NULL for non-matching rows and max() ignores
    # NULLs) — a where() on the match here would silently drop those
    # URLs instead of allowing them.
    cand = u.join(F.broadcast(r), "host", "left")
    key = F.when(
        F.col("prefix").isNotNull()
        & F.col("path").startswith(F.col("prefix")),
        F.concat(
            F.lpad(F.length("prefix").cast("string"), 4, "0"),
            F.col("allow").cast("int").cast("string"),
            F.col("prefix"),
        ),
    )
    return (
        cand.groupBy("id", "host", "path")
        .agg(F.max(key).alias("k"))
        .select(
            "id",
            "host",
            "path",
            F.coalesce(F.substring("k", 5, 1) == "1", F.lit(True)).alias(
                "allowed"
            ),
            F.coalesce(F.substring("k", 6, 10000), F.lit("")).alias(
                "matched_rule"
            ),
        )
    )
