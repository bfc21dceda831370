"""Siteinfo JSON source (S7) and the exact-network site join (J6).

Reference: site/site.go:150-215 (load + discard rules), :120-147
(annotate: mask probe to /26 v4 or /64 v6, exact string match on the
CIDR as written in the file, miss → Missing sentinel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import ip as ipf

GEO_TYPE = T.StructType(
    [
        T.StructField("City", T.StringType()),
        T.StructField("ContinentCode", T.StringType()),
        T.StructField("CountryCode", T.StringType()),
        T.StructField("Latitude", T.DoubleType()),
        T.StructField("Longitude", T.DoubleType()),
        T.StructField("State", T.StringType()),
    ]
)

NETWORK_TYPE = T.StructType(
    [
        T.StructField("ASName", T.StringType()),
        T.StructField("ASNumber", T.LongType()),
        T.StructField(
            "Systems",
            T.ArrayType(
                T.StructType([T.StructField("ASNs", T.ArrayType(T.LongType()))])
            ),
        ),
    ]
)

SITEINFO_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("Name", T.StringType()),
            T.StructField(
                "Network",
                T.StructType(
                    [
                        T.StructField("IPv4", T.StringType()),
                        T.StructField("IPv6", T.StringType()),
                    ]
                ),
            ),
            T.StructField(
                "Annotation",
                T.StructType(
                    [
                        T.StructField("Site", T.StringType()),
                        T.StructField("Machine", T.StringType()),
                        T.StructField("Geo", GEO_TYPE),
                        T.StructField("Network", NETWORK_TYPE),
                    ]
                ),
            ),
        ]
    )
)


def _valid_cidr(col):
    return ipf.cidr_to_range(col)["ip_low"].isNotNull()


def siteinfo(
    spark: SparkSession, path: str, retired_path: str | None = None
) -> DataFrame:
    """S7 + O2: load current + retired site annotations, apply the
    reference's discard rules, and emit one row PER NETWORK KEY
    (a site with both IPv4 and IPv6 yields two rows — the reference's
    map has both CIDRs pointing at the same annotation).

    Machine is blanked on load (site/site.go:183)."""
    df = spark.read.json(path, multiLine=True)
    if retired_path:
        df = df.unionByName(spark.read.json(retired_path, multiLine=True), allowMissingColumns=True)
    # discard rules (site/site.go:188-211): empty or invalid IPv4 →
    # drop entry; non-empty invalid IPv6 → drop entry too
    df = df.where(
        (F.col("Network.IPv4") != "")
        & F.col("Network.IPv4").isNotNull()
        & _valid_cidr(F.col("Network.IPv4"))
        & (
            (F.coalesce(F.col("Network.IPv6"), F.lit("")) == "")
            | _valid_cidr(F.col("Network.IPv6"))
        )
    )
    ann = F.col("Annotation").withField("Machine", F.lit(""))
    v4 = df.select(F.col("Network.IPv4").alias("cidr_key"), ann.alias("annotation"))
    v6 = df.where(F.coalesce(F.col("Network.IPv6"), F.lit("")) != "").select(
        F.col("Network.IPv6").alias("cidr_key"), ann.alias("annotation")
    )
    return v4.unionByName(v6)


def site_annotate(
    probes: DataFrame, sites: DataFrame, ip_col: str = "ip"
) -> DataFrame:
    """J6: compute the probe's /26 (v4) or /64 (v6) network key and
    broadcast-equi-join against the site map; misses get the Missing
    sentinel (site/site.go:109-121).

    Adds a ``server`` struct column. Pure built-in expressions for
    the key (no UDF on the probe path)."""
    b = ipf.ip_to_bytes(F.col(ip_col))
    probes = probes.withColumn("__b", b)
    v4key = ipf.site_network_key_v4(ipf.bytes16_to_v4_long(F.col("__b")))
    v6key = F.concat(
        ipf.bytes_to_ip(ipf.site_network_key_v6(F.col("__b"))), F.lit("/64")
    )
    probes = probes.withColumn(
        "__key",
        F.when(F.col("__b").isNull(), F.lit(None)).otherwise(
            F.when(ipf.is_v4(F.col("__b")), v4key).otherwise(v6key)
        ),
    )
    joined = probes.join(
        F.broadcast(sites), probes["__key"] == sites["cidr_key"], "left"
    )
    missing = F.struct(
        F.lit(None).cast("string").alias("Site"),
        F.lit(None).cast("string").alias("Machine"),
        F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in GEO_TYPE.fields]
        ).alias("Geo"),
        F.struct(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in NETWORK_TYPE.fields
            ]
        ).alias("Network"),
        F.lit(True).alias("Missing"),
    )
    hit = F.struct(
        F.col("annotation.Site").alias("Site"),
        F.col("annotation.Machine").alias("Machine"),
        F.col("annotation.Geo").alias("Geo"),
        F.col("annotation.Network").alias("Network"),
        F.lit(False).alias("Missing"),
    )
    out = joined.withColumn(
        "server",
        F.when(F.col("cidr_key").isNotNull(), hit).otherwise(missing),
    )
    return out.drop("__b", "__key", "cidr_key", "annotation")
