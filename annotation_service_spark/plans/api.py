"""Request-document parsing: the v1/v2 wire-format edge.

Reference: POST bodies are sniffed — try the v2 envelope first
(``RequestWrapper.RequestType == "Annotate v2.0"``); anything
unparseable falls back to the v1 array-of-items format
(handler/handler.go:423-439 ``handleNewOrOld``). v2 carries ONE date
for the batch (api/v2/api-v2.go:38-43); v1 items carry individual
timestamps but the batch uses the FIRST item's (see
plans.legacy.v1_batch_date).

Spark mapping: request documents are just a JSON-string column;
``from_json`` with the v2 schema, falling back to the v1 schema when
the envelope doesn't parse — one declarative projection, no UDF. The
output is the normalized request relation (request_id, version,
request_date, ip) the annotate plan consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

V2_SCHEMA = T.StructType(
    [
        T.StructField("RequestType", T.StringType()),
        T.StructField("RequestInfo", T.StringType()),
        T.StructField("Date", T.TimestampType()),
        T.StructField("IPs", T.ArrayType(T.StringType())),
    ]
)

V1_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("ip", T.StringType()),
            T.StructField("ip_format", T.IntegerType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )
)


def parse_requests(
    docs: DataFrame, body_col: str = "body", id_col: str = "request_id"
) -> DataFrame:
    """Sniff + normalize request documents → one row per requested IP:
    (request_id, version, request_date, ip).

    v2 rows share the envelope Date; v1 rows all use the FIRST item's
    timestamp (the reference's one-date-per-batch quirk,
    handler/handler.go:310-313)."""
    v2 = F.from_json(F.col(body_col), V2_SCHEMA)
    v1 = F.from_json(F.col(body_col), V1_SCHEMA)
    # NULL-safe: a v1 array body "parses" as a struct of NULLs, so the
    # RequestType comparison must default to false, not NULL
    is_v2 = F.coalesce(v2["RequestType"] == "Annotate v2.0", F.lit(False))

    parsed = docs.select(
        F.col(id_col),
        is_v2.alias("__is_v2"),
        v2.alias("__v2"),
        v1.alias("__v1"),
    )
    v2_rows = (
        parsed.where(F.col("__is_v2"))
        .select(
            id_col,
            F.lit("v2").alias("version"),
            F.col("__v2.Date").alias("request_date"),
            F.explode(F.col("__v2.IPs")).alias("ip"),
        )
    )
    v1_rows = (
        parsed.where(~F.col("__is_v2") & F.col("__v1").isNotNull())
        .select(
            id_col,
            F.lit("v1").alias("version"),
            F.element_at(F.col("__v1"), 1)["timestamp"].alias("request_date"),
            F.explode(F.col("__v1")).alias("__item"),
        )
        .select(id_col, "version", "request_date", F.col("__item.ip").alias("ip"))
    )
    return v2_rows.unionByName(v1_rows)
