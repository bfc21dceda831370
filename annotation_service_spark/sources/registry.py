"""Dataset registry: snapshot discovery from file naming (S1/P7).

Reference: geoloader/geoloader.go:78-176 lists GCS objects by prefix,
filters by regex + the legacy/GeoLite2 cutover date, and extracts the
snapshot date from the filename (api/api.go:177-188 ``[0-9]{8}T``;
ASN variant asn/asn-loader.go:187-214 ``(\\d{4})(\\d{2})(\\d{2})-``;
the ASN lister additionally pins files to the 1st of the month
"to conserve RAM", geoloader/geoloader-asn.go:23-25).

Spark-first: file discovery is the scan's job (glob/pathGlobFilter +
``input_file_name()``); this module turns listed paths into a
registry DataFrame that the as-of machinery consumes, with partition
pruning on ``dataset_date`` doing what the reference's regex pruning
did.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Legacy datasets end / GeoLite2 begins (geoloader/geoloader.go:34)
GEOLITE2_START_DATE = dt.date(2017, 8, 15)

_PATTERNS = {
    # Maxmind/2017/09/07/20170907T023620Z-GeoLite2-City-CSV.zip
    "geolite2": (r"(\d{8})T", "yyyyMMdd"),
    # RouteViewIPv4/2018/01/routeviews-rv2-20180101-1200.pfx2as.gz
    "asn_v4": (r"(\d{8})-\d{4}", "yyyyMMdd"),
    "asn_v6": (r"(\d{8})-\d{4}", "yyyyMMdd"),
    # Maxmind/2017/08/08/20170808T080000Z-GeoLiteCity-latest.zip
    "legacy_v4": (r"(\d{8})T", "yyyyMMdd"),
    "legacy_v6": (r"(\d{8})T", "yyyyMMdd"),
}


def dataset_date_from_path(path_col, source: str):
    """P7: snapshot date parsed from the file path."""
    regex, fmt = _PATTERNS[source]
    return F.to_date(F.regexp_extract(path_col, regex, 1), fmt)


def build_registry(
    paths: DataFrame,
    path_col: str = "path",
    source_col: str = "source",
    apply_cutoff: bool = True,
    asn_first_of_month_only: bool = False,
) -> DataFrame:
    """Paths + source tags → registry (path, source, dataset_date).

    ``apply_cutoff`` reproduces the legacy/GeoLite2 cutover pruning
    (geoloader/geoloader.go:160-176,231-236): legacy snapshots dated
    on/after 2017-08-15 are dropped (GeoLite2 serves those dates).
    ``asn_first_of_month_only`` reproduces the RAM-conserving ASN
    pin (geoloader/geoloader-asn.go:23-25).
    """
    date_expr = None
    for src in _PATTERNS:
        e = dataset_date_from_path(F.col(path_col), src)
        date_expr = (
            F.when(F.col(source_col) == src, e)
            if date_expr is None
            else date_expr.when(F.col(source_col) == src, e)
        )
    out = paths.withColumn("dataset_date", date_expr)
    if apply_cutoff:
        out = out.where(
            ~(
                F.col(source_col).isin("legacy_v4", "legacy_v6")
                & (F.col("dataset_date") >= F.lit(GEOLITE2_START_DATE))
            )
        )
    if asn_first_of_month_only:
        out = out.where(
            ~F.col(source_col).startswith("asn")
            | (F.dayofmonth("dataset_date") == 1)
        )
    return out


def dataset_count_gauge(
    registry: DataFrame, source_col: str = "source"
) -> DataFrame:
    """A5 (metrics.go DatasetCount gauge): loaded-snapshot counts,
    one row per source plus the total the reference exports —
    (source, n_datasets, earliest, latest)."""
    per_source = registry.groupBy(source_col).agg(
        F.count_distinct("dataset_date").alias("n_datasets"),
        F.min("dataset_date").alias("earliest"),
        F.max("dataset_date").alias("latest"),
    )
    total = registry.agg(
        F.lit("__total__").alias(source_col),
        F.count_distinct("dataset_date").alias("n_datasets"),
        F.min("dataset_date").alias("earliest"),
        F.max("dataset_date").alias("latest"),
    )
    return per_source.unionByName(total)
