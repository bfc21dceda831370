"""WARC record source (sources/warc.py) — independent in-test writer
round-trips, per-record gzip members, skip-don't-kill corruption
handling, and the end-to-end crawl front-end: WARC bytes →
records → html_extract → clean text.
"""

from __future__ import annotations

import gzip
import random

from annotation_service_spark.sources.warc import (
    parse_warc_bytes,
    read_warc_records,
)


def make_record(
    rtype: str,
    uri: str = "",
    block: bytes = b"",
    ctype: str = "application/http; msgtype=response",
    rid: str = "<urn:uuid:1>",
    date: str = "2026-08-16T00:00:00Z",
) -> bytes:
    """Independent writer: assembled from the spec text, not the
    reader's code."""
    head = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: {rid}",
        f"WARC-Date: {date}",
        f"Content-Type: {ctype}",
        f"Content-Length: {len(block)}",
    ]
    if uri:
        head.insert(2, f"WARC-Target-URI: {uri}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def http_response(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


HTML = b"<html><head><title>T</title></head><body><p>Hello crawl.</p></body></html>"


def _file_bytes() -> bytes:
    info = make_record(
        "warcinfo", ctype="application/warc-fields",
        block=b"software: test\r\n",
    )
    req = make_record(
        "request", uri="https://x.org/a",
        ctype="application/http; msgtype=request",
        block=b"GET /a HTTP/1.1\r\nHost: x.org\r\n\r\n",
    )
    resp = make_record(
        "response", uri="https://x.org/a", block=http_response(HTML)
    )
    resp2 = make_record(
        "response", uri="https://x.org/b",
        block=http_response(b"<p>WARC/1.0 mentioned in body</p>", 404),
        rid="<urn:uuid:2>",
    )
    return info + req + resp + resp2


def test_parse_roundtrip_plain():
    recs, skipped = parse_warc_bytes(_file_bytes())
    assert skipped == 0
    assert [r[0] for r in recs] == ["warcinfo", "request", "response", "response"]
    info, req, resp, resp2 = recs
    assert resp[1] == "https://x.org/a"
    assert resp[5] == 200 and resp[6] == HTML
    # 'WARC/' inside a correctly-framed payload is NOT a record start
    assert resp2[5] == 404 and b"WARC/1.0 mentioned" in resp2[6]
    # non-http records keep the raw block, no status
    assert info[5] is None and info[6] == b"software: test\r\n"
    assert req[5] is None  # request records parse but carry no status


def test_parse_gzip_members():
    raw = _file_bytes()
    # spec layout: one gzip member per record
    members = b""
    recs0, _ = parse_warc_bytes(raw)
    # re-split raw into records via the independent writer
    parts = [
        make_record("warcinfo", ctype="application/warc-fields",
                    block=b"software: test\r\n"),
        make_record("request", uri="https://x.org/a",
                    ctype="application/http; msgtype=request",
                    block=b"GET /a HTTP/1.1\r\nHost: x.org\r\n\r\n"),
        make_record("response", uri="https://x.org/a",
                    block=http_response(HTML)),
        make_record("response", uri="https://x.org/b",
                    block=http_response(b"<p>WARC/1.0 mentioned in body</p>", 404),
                    rid="<urn:uuid:2>"),
    ]
    for p in parts:
        members += gzip.compress(p)
    recs, skipped = parse_warc_bytes(members)
    assert skipped == 0
    assert [(r[0], r[5]) for r in recs] == [(r[0], r[5]) for r in recs0]
    assert recs[2][6] == HTML


def test_parse_skips_malformed_and_resyncs():
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"  # no Content-Length
        + _file_bytes()
    )
    recs, skipped = parse_warc_bytes(bad)
    assert skipped == 1
    assert len(recs) == 4  # every good record recovered
    truncated = _file_bytes()[:-40]  # cut into the last record's block
    recs2, _ = parse_warc_bytes(
        truncated[: truncated.rfind(b"WARC/1.0")]
        + truncated[truncated.rfind(b"WARC/1.0") :]
    )
    assert len(recs2) >= 3  # earlier records unaffected


def test_parse_fuzz_never_hangs_or_raises():
    rnd = random.Random(99)
    base = _file_bytes()
    for _ in range(200):
        data = bytearray(base)
        for _ in range(rnd.randint(1, 6)):
            i = rnd.randrange(len(data))
            data[i] = rnd.randrange(256)
        recs, skipped = parse_warc_bytes(bytes(data))
        assert isinstance(recs, list) and skipped >= 0
    # pure noise
    for _ in range(30):
        noise = bytes(rnd.randrange(256) for _ in range(rnd.randrange(400)))
        parse_warc_bytes(noise)
    # adversarial: gzip magic + garbage
    parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 100)


def test_spark_reader_end_to_end(spark, tmp_path):
    p1 = tmp_path / "a.warc"
    p1.write_bytes(_file_bytes())
    p2 = tmp_path / "b.warc.gz"
    p2.write_bytes(gzip.compress(make_record(
        "response", uri="https://y.org/", block=http_response(HTML)
    )))
    df = read_warc_records(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    assert len(rows) == 5
    resp = [r for r in rows if r.record_type == "response" and r.http_status == 200]
    assert {r.target_uri for r in resp} == {"https://x.org/a", "https://y.org/"}
    assert all(r.skipped_records == 0 for r in rows)

    # the crawl front-end composition: payload -> html_extract
    from pyspark.sql import functions as F

    from annotation_service_spark.functions.html import extract_html_text

    pages = (
        df.where((F.col("record_type") == "response") & (F.col("http_status") == 200))
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("payload").cast("string").alias("html"),
        )
    )
    texts = {r.clean_text for r in extract_html_text(pages).collect()}
    assert texts == {"T\nHello crawl."}
