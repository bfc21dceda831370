"""Interval-table storage layout.

How the build path persists dataset snapshots so the query path stays
cheap at cluster scale:

- partitioned by ``dataset_date`` → as-of queries prune to exactly
  the snapshots they touch (the Spark analog of the reference's
  regex-confined loading, geoloader/geoloader-asn.go:23-25);
- sorted by ``ip_low`` within files (T4 invariant,
  iputils/iputils.go:188-197) → parquet min/max column statistics on
  the bounds let even a plain BETWEEN join skip row groups, and the
  broadcast build's orderBy is nearly free;
- one file per snapshot partition by default (snapshots are ≤ a few
  hundred MB) — bump ``files_per_partition`` for bigger builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_interval_table(
    df: DataFrame,
    path: str,
    low: str = "ip_low",
    partition_col: str = "dataset_date",
    files_per_partition: int = 1,
    mode: str = "append",
) -> None:
    out = (
        df.repartition(files_per_partition, partition_col)
        .sortWithinPartitions(partition_col, low)
    )
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_interval_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
