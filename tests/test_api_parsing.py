"""v1/v2 request-document sniffing tests (handler/handler.go:423-439)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from annotation_service_spark.plans import api


def test_v2_and_v1_sniffing(spark):
    v2_body = (
        '{"RequestType": "Annotate v2.0", "RequestInfo": "test",'
        ' "Date": "2018-05-01T00:00:00Z",'
        ' "IPs": ["1.0.0.5", "2001:db8::1"]}'
    )
    v1_body = (
        '[{"ip": "9.9.9.9", "ip_format": 4, "timestamp": "2017-01-01T00:00:00Z"},'
        ' {"ip": "8.8.8.8", "ip_format": 4, "timestamp": "2019-06-06T00:00:00Z"}]'
    )
    garbage = "not json at all"
    docs = spark.createDataFrame(
        [(1, v2_body), (2, v1_body), (3, garbage)],
        "request_id long, body string",
    )
    out = api.parse_requests(docs).collect()
    by_req = {}
    for r in out:
        by_req.setdefault(r.request_id, []).append(r)

    v2_rows = by_req[1]
    assert {r.ip for r in v2_rows} == {"1.0.0.5", "2001:db8::1"}
    assert all(r.version == "v2" for r in v2_rows)
    assert all(r.request_date == dt.datetime(2018, 5, 1) for r in v2_rows)

    v1_rows = by_req[2]
    assert {r.ip for r in v1_rows} == {"9.9.9.9", "8.8.8.8"}
    assert all(r.version == "v1" for r in v1_rows)
    # one-date-per-batch: both rows use the FIRST item's timestamp
    assert all(r.request_date == dt.datetime(2017, 1, 1) for r in v1_rows)

    # unparseable body yields no rows (the reference 400s it)
    assert 3 not in by_req


def test_error_body_truncation(spark):
    """O4 (api/v2/api-v2.go:328-331): error echoes cap at 60 chars."""
    from annotation_service_spark.plans.api import truncate_error_body

    long_body = "x" * 100
    df = spark.createDataFrame([(long_body,), ("short",)], "body string")
    out = [r.t for r in df.select(truncate_error_body(F.col("body")).alias("t")).collect()]
    assert sorted(out, key=len) == ["short", "x" * 60]
