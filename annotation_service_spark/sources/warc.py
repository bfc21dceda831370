"""WARC (Web ARChive, ISO 28500 / IIPC WARC/1.0-1.1 — public spec)
record source — the container format web crawls actually ship in
(Common Crawl publishes WARC; every published web corpus's first
stage reads it). Completes the crawl front-end next to
functions/html.py: WARC bytes → per-record rows → html_extract →
training text.

Format recap (the subset this reader implements, per the spec):
a WARC file is a sequence of records; each record is

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n

``.warc.gz`` files are ONE GZIP MEMBER PER RECORD concatenated
(the spec's recommended layout, so readers can seek) — the reader
detects the gzip magic and walks members with a fresh
``decompressobj`` per member. Response records whose Content-Type is
``application/http`` carry an HTTP message as the block; the HTTP
status line + headers are split off at the first CRLFCRLF and the
body returned as the payload.

Execution shape (same scalable pattern as the zip source,
``sources/zipcsv.py``): a ``binaryFile`` scan — one task per WARC
file, which is exactly how crawl archives parallelize (Common Crawl
segments are ~1 GB files, a 100 TB crawl is ~10^5 files spread over
the cluster) — then ONE Arrow-batched ``mapInPandas`` doing the
record walk per file. Per-record robustness is skip-don't-kill: a
record with a malformed header block or a bad Content-Length is
skipped and counted, and the walk resynchronizes at the next
``WARC/`` marker; a truncated tail ends the file quietly. Nothing
row-at-a-time, no driver-side file handling.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = (
    "path string, record_type string, target_uri string, "
    "record_id string, warc_date string, content_type string, "
    "http_status int, payload binary, n_bytes long, skipped_records long"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all gzip members (the per-record .warc.gz layout).
    A corrupt member ends the stream — everything decoded so far is
    still parsed (skip-don't-kill at file granularity)."""
    out = io.BytesIO()
    rest = data
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            out.write(d.decompress(rest))
            out.write(d.flush())
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        rest = d.unused_data
        if not rest:
            break
    return out.getvalue()


def parse_warc_bytes(data: bytes):
    """Yield (record_type, target_uri, record_id, warc_date,
    content_type, http_status, payload, n_bytes) tuples plus a final
    skipped-record count — a pure-Python generator so the same walk
    is testable without Spark. Written from the public spec, not any
    existing reader."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos = 0
    skipped = 0
    records = []
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break  # truncated header block: end of file
        try:
            header_text = data[start:hdr_end].decode("utf-8", "replace")
            lines = header_text.split("\r\n")
            headers = {}
            for ln in lines[1:]:
                if ":" in ln:
                    k, v = ln.split(":", 1)
                    headers[k.strip().lower()] = v.strip()
            length = int(headers["content-length"])
            if length < 0 or hdr_end + 4 + length > len(data):
                raise ValueError("bad length")
        except (KeyError, ValueError):
            skipped += 1
            pos = start + 5  # resync at the next 'WARC/' marker
            continue
        block = data[hdr_end + 4 : hdr_end + 4 + length]
        ctype = headers.get("content-type", "")
        status = None
        payload = block
        if ctype.startswith("application/http"):
            split = block.find(b"\r\n\r\n")
            if split >= 0:
                http_head = block[:split].decode("utf-8", "replace")
                first = http_head.split("\r\n", 1)[0]
                parts = first.split(" ")
                if len(parts) >= 2 and parts[0].startswith("HTTP/"):
                    try:
                        status = int(parts[1])
                    except ValueError:
                        status = None
                payload = block[split + 4 :]
        records.append(
            (
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                headers.get("warc-record-id", ""),
                headers.get("warc-date", ""),
                ctype,
                status,
                payload,
                len(payload),
            )
        )
        pos = hdr_end + 4 + length
    return records, skipped


def read_warc_records(spark: SparkSession, warc_glob: str) -> DataFrame:
    """WARC files → one row per record:
    (path, record_type, target_uri, record_id, warc_date,
    content_type, http_status, payload, n_bytes, skipped_records).
    ``skipped_records`` repeats the FILE's skip count on each of its
    rows (an observability column, same idea as the zip source's
    error budget — sum(distinct by path) to monitor crawl rot)."""
    import pandas as pd

    bin_df = spark.read.format("binaryFile").load(warc_glob)

    def walk(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                recs, skipped = parse_warc_bytes(bytes(content))
                for r in recs:
                    rows.append((path, *r, skipped))
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_type", "target_uri", "record_id",
                    "warc_date", "content_type", "http_status",
                    "payload", "n_bytes", "skipped_records",
                ],
            )

    return bin_df.select("path", "content").mapInPandas(
        walk, RECORD_SCHEMA
    )
