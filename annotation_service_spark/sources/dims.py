"""Dimension-table sources: AS names (S5) and FIPS→ISO map (S6).

Reference: asn/asn-loader.go:151-157 (ipinfo asnames CSV, loaded once
and shared — here: a broadcast dim), legacy/fips.go:33-60 (FIPS→ISO
region map keyed ``country + "-" + fips_region``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASNAMES_SCHEMA = T.StructType(
    [
        T.StructField("asn", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("registry", T.StringType()),
    ]
)

FIPS_SCHEMA = T.StructType(
    [
        T.StructField("country_iso_code", T.StringType()),
        T.StructField("region_fips_code", T.StringType()),
        T.StructField("region_iso_code", T.StringType()),
        T.StructField("region_name", T.StringType()),
    ]
)


def asnames(spark: SparkSession, path: str) -> DataFrame:
    """S5: ipinfo asnames.csv → (asn LONG, as_name). The file keys
    rows as 'AS14061'; the numeric part is the join key (J4)."""
    raw = spark.read.csv(path, header=True, schema=ASNAMES_SCHEMA, quote='"')
    return raw.select(
        F.regexp_extract(F.col("asn"), r"^AS(\d+)$", 1).try_cast("long").alias("asn"),
        F.col("name").alias("as_name"),
        "country",
        "registry",
    ).where(F.col("asn").isNotNull())


def fips_iso_map(spark: SparkSession, path: str) -> DataFrame:
    """S6: FIPS→ISO region dim; join key = country + '-' + fips
    (legacy/fips.go:26-28)."""
    raw = spark.read.csv(path, header=True, schema=FIPS_SCHEMA)
    return raw.select(
        F.concat_ws("-", "country_iso_code", "region_fips_code").alias("fips_key"),
        F.col("region_iso_code"),
        F.col("region_name"),
    )
