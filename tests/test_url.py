"""URL canonicalization + URL-level dedup differentials
(functions/url.py) against a pure-python replay.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from annotation_service_spark.functions.url import (
    TRACKING_PARAMS,
    TRACKING_PREFIXES,
    canonical_url,
    dedup_urls_keep_first,
    url_host,
)


def _tracking(p: str) -> bool:
    name = p.split("=")[0]
    return name.startswith(TRACKING_PREFIXES) or name in TRACKING_PARAMS


def _pct(u: str) -> str:
    """Python replay of RFC 3986 §6.2.2 percent normalization:
    uppercase hex, decode UNRESERVED codepoints only (explicit ASCII
    ranges — chr(0xC3).isalnum() is True in Python, so isalnum() is
    the wrong test)."""
    parts = u.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        pair = p[:2]
        if re.fullmatch(r"[0-9A-Fa-f]{2}", pair or ""):
            c = int(pair, 16)
            if (
                48 <= c <= 57
                or 65 <= c <= 90
                or 97 <= c <= 122
                or c in (45, 46, 95, 126)
            ):
                out.append(chr(c) + p[2:])
            else:
                out.append("%" + pair.upper() + p[2:])
        else:
            out.append("%" + p)
    return "".join(out)


def _canon(url: str) -> str:
    u = _pct(url.strip())
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", u)
    if not m:
        return u
    scheme = m.group(1).lower()
    rest = u[m.end():]
    authority = re.match(r"^([^/?#]*)", rest).group(1)
    after = rest[len(authority):]
    if "@" in authority:
        authority = authority.split("@", 1)[1]
    hostport = authority.lower()
    if (scheme == "http" and hostport.endswith(":80")) or (
        scheme == "https" and hostport.endswith(":443")
    ):
        host = hostport.rsplit(":", 1)[0]
    else:
        host = hostport
    path = re.match(r"^([^?#]*)", after).group(1) or "/"
    qm = re.search(r"\?([^#]*)", after)
    query = qm.group(1) if qm else ""
    params = sorted(p for p in query.split("&") if p and not _tracking(p))
    qs = "&".join(params)
    return f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "")


CASES = [
    "HTTP://Example.COM:80/Path/One?b=2&a=1#frag",
    "https://example.com:443/",
    "https://example.com",
    "http://example.com:8080/keep/port",
    "http://user:pw@Example.org/x",
    "https://site.com/p?utm_source=x&utm_medium=y&a=1",
    "https://site.com/p?gclid=abc&fbclid=def&ref=tw",
    "https://site.com/p?z=9&A=2&a=1",
    "  https://padded.com/x  ",
    "not a url at all",
    "ftp://Files.example.com/Dir/File.txt",
    "https://case.com/Preserved/PATH?Key=Value",
    # RFC 3986 §6.2.2 percent-encoding normalization
    "https://pct.com/%7Euser/%41%42?x=%31",   # all unreserved → decode
    "https://pct.com/a%2fb%3Fc",              # reserved → keep, UPPER hex
    "https://pct.com/x%2",                    # malformed pair → verbatim
    "https://pct.com/x%zz",                   # non-hex pair → verbatim
    "https://pct.com/mix%20%2E%2e",           # space keeps, dots decode
]


def test_canonical_url_matches_replay(spark):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(CASES)],
                               "i long, url string")
    out = {
        r.i: r.c
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, u in enumerate(CASES):
        assert out[i] == _canon(u), (i, u, out[i], _canon(u))
    # spot semantics
    assert out[0] == "http://example.com/Path/One?a=1&b=2"
    assert out[1] == out[2] == "https://example.com/"
    assert ":8080" in out[3]
    assert out[4] == "http://example.org/x"
    assert out[5] == "https://site.com/p?a=1"
    assert out[6] == "https://site.com/p"
    assert out[9] == "not a url at all"
    # percent normalization spot checks
    assert out[12] == "https://pct.com/~user/AB?x=1"
    assert out[13] == "https://pct.com/a%2Fb%3Fc"
    assert out[14] == "https://pct.com/x%2"
    assert out[15] == "https://pct.com/x%zz"
    assert out[16] == "https://pct.com/mix%20.."


def test_pct_encoded_twins_collide(spark):
    """An encoded-unreserved URL and its decoded twin must produce the
    SAME canonical key — the reason §6.2.2 exists for URL dedup."""
    rows = [
        (1, "https://a.com/%7Edocs/x%2Dy?q=%41"),
        (2, "https://a.com/~docs/x-y?q=A"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = dedup_urls_keep_first(df).collect()
    assert len(out) == 1
    assert out[0].canonical_url == "https://a.com/~docs/x-y?q=A"
    assert (out[0].first_id, out[0].n_dups) == (1, 1)


def test_tracker_param_list_is_parameterizable(spark):
    """ADVICE r12: '?ref=branch' is FUNCTIONAL on code hosts — callers
    must be able to drop 'ref' from the exact-name tracker list (the
    default keeps stripping it)."""
    rows = [
        (1, "https://code.host/repo?ref=main"),
        (2, "https://code.host/repo?ref=dev"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    merged = dedup_urls_keep_first(df).collect()
    assert len(merged) == 1  # default list strips ref → both collapse
    kept = dedup_urls_keep_first(
        df, tracking_params=("gclid", "fbclid", "msclkid")
    ).collect()
    assert len(kept) == 2  # ref preserved → distinct pages survive
    assert {r.canonical_url for r in kept} == {
        "https://code.host/repo?ref=main",
        "https://code.host/repo?ref=dev",
    }


def test_url_host(spark):
    rows = [(0, "HTTP://User@WWW.Example.COM:80/x"), (1, "garbage"),
            (2, "https://a.b.c/")]
    df = spark.createDataFrame(rows, "i long, url string")
    out = {r.i: r.h for r in df.select(
        "i", url_host(F.col("url")).alias("h")).collect()}
    assert out == {0: "www.example.com", 1: "", 2: "a.b.c"}


def test_dedup_urls_keep_first(spark):
    rows = [
        (1, "HTTPS://A.com:443/x?b=2&a=1"),
        (2, "https://a.com/x?a=1&b=2"),       # same canonical as 1
        (3, "https://a.com/x?a=1&b=2&utm_source=s"),  # same again
        (4, "https://a.com/y"),
        (5, "https://b.com/x?a=1&b=2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {
        r.canonical_url: (r.first_id, r.n_dups)
        for r in dedup_urls_keep_first(df).collect()
    }
    assert out["https://a.com/x?a=1&b=2"] == (1, 2)
    assert out["https://a.com/y"] == (4, 0)
    assert out["https://b.com/x?a=1&b=2"] == (5, 0)


def test_domain_suffixes_and_blocklist_filter(spark):
    """filter_blocked_hosts: suffix matching blocks subdomains of a
    blocked domain, the matched entry is the LONGEST hit, clean and
    garbage rows come back blocked=false."""
    from annotation_service_spark.functions.url import (
        domain_suffixes,
        filter_blocked_hosts,
    )

    sfx = (
        spark.range(1)
        .select(domain_suffixes(F.lit("a.b.co.uk")).alias("s"))
        .collect()[0]
        .s
    )
    assert sfx == ["a.b.co.uk", "b.co.uk", "co.uk", "uk"]

    rows = [
        (1, "https://cdn.ads.net/banner"),     # parent-domain block
        (2, "https://ads.net/x"),              # exact block
        (3, "https://www.bad.com/y"),          # most-specific wins
        (4, "https://clean.org/z"),
        (5, "not a url"),
        (6, "https://notads.net/x"),           # 'notads.net' != 'ads.net'
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame(
        [("ads.net",), ("bad.com",), ("www.bad.com",)], "domain string"
    )
    out = {r.id: r for r in filter_blocked_hosts(docs, bl).collect()}
    assert len(out) == 6
    assert out[1].blocked and out[1].matched == "ads.net"
    assert out[2].blocked and out[2].matched == "ads.net"
    assert out[3].blocked and out[3].matched == "www.bad.com"
    assert not out[4].blocked and out[4].matched is None
    assert not out[5].blocked and out[5].host == ""
    assert not out[6].blocked


def test_canonical_url_idempotent_fuzz(spark):
    """Canonicalization must be IDEMPOTENT: canon(canon(u)) ==
    canon(u) for randomized messy URLs (the property that makes it a
    safe dedup key — re-canonicalizing stored keys never reshuffles
    groups)."""
    import random

    rng = random.Random(17)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "a.b.ORG", "x.io"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b", "/p%20q"]
    users = ["", "u@", "u:p@"]
    frags = ["", "#f", "#a=b"]
    urls = []
    for _ in range(150):
        q = "&".join(
            rng.sample(
                ["a=1", "B=2", "utm_source=z", "gclid=1", "ref=t", "z"],
                rng.randrange(0, 5),
            )
        )
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(users)
            + rng.choice(hosts) + rng.choice(ports) + rng.choice(paths)
            + (("?" + q) if q else "") + rng.choice(frags)
        )
    urls += ["", "   ", "no scheme here", "http://"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    once = df.select("i", canonical_url(F.col("url")).alias("c"))
    twice = once.select("i", canonical_url(F.col("c")).alias("c2"), "c")
    bad = twice.where(F.col("c") != F.col("c2")).collect()
    assert not bad, bad[:5]


# ---------------------------------------------------------------------------
# robots.txt compliance (RFC 9309) — filter_robots
# ---------------------------------------------------------------------------

def _robots(spark, urls, rules):
    from annotation_service_spark.functions.url import filter_robots

    u = spark.createDataFrame(
        [(i, x) for i, x in enumerate(urls)], "doc_id long, url string"
    )
    r = spark.createDataFrame(rules, "host string, allow boolean, prefix string")
    return {
        row.id: (row.allowed, row.matched_rule)
        for row in filter_robots(u, r).collect()
    }


def test_robots_longest_match_and_carveout(spark):
    rules = [("a.com", False, "/"), ("a.com", True, "/pub/")]
    got = _robots(
        spark,
        ["https://a.com/priv/x", "https://a.com/pub/x", "https://a.com"],
        rules,
    )
    assert got[0] == (False, "/")        # site-wide ban
    assert got[1] == (True, "/pub/")     # longer allow carve-out
    assert got[2] == (False, "/")        # empty path normalizes to '/'


def test_robots_tie_allow_wins(spark):
    rules = [("a.com", False, "/p"), ("a.com", True, "/p")]
    got = _robots(spark, ["https://a.com/pq"], rules)
    assert got[0] == (True, "/p")        # RFC 9309 §2.2.2


def test_robots_no_match_and_no_rules_allowed(spark):
    rules = [("a.com", False, "/x")]
    got = _robots(
        spark,
        ["https://a.com/y", "https://other.net/x", "garbage"],
        rules,
    )
    assert got[0] == (True, "")   # host has rules, none match
    assert got[1] == (True, "")   # host has no rules
    assert got[2] == (True, "")   # unparseable: host '', no '' rules


def test_robots_empty_prefix_matches_nothing(spark):
    # the bare 'Disallow:' line is the EMPTY prefix = matches nothing
    rules = [("a.com", False, "")]
    got = _robots(spark, ["https://a.com/x"], rules)
    assert got[0] == (True, "")


def test_robots_byte_prefix_not_segment(spark):
    # RFC prefix matching is on octets: '/p' governs '/pq' too
    rules = [("a.com", False, "/p")]
    got = _robots(spark, ["https://a.com/pq", "https://a.com/q"], rules)
    assert got[0] == (False, "/p")
    assert got[1] == (True, "")
