"""spread_underparallel (annotation_service_spark/partitioning.py):
the guide-§2.5 repartition-after-unsplittable-read remedy. Pins the
trigger contract — fire only when the input plans far fewer
partitions than the cluster has cores, never change row content, and
no-op (rather than raise) on plans whose partitioning cannot be
probed (streaming)."""

from __future__ import annotations

from pyspark.sql import functions as F

from annotation_service_spark.partitioning import spread_underparallel


def test_spreads_single_partition_input(spark):
    df = spark.range(1000).coalesce(1).select(
        "id", (F.col("id") % 7).alias("k")
    )
    assert df.rdd.getNumPartitions() == 1
    out = spread_underparallel(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # content-neutral
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_leaves_already_parallel_input_alone(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target)
    out = spread_underparallel(df)
    # identical object back — no extra exchange added
    assert out is df


def test_streaming_input_noops(spark):
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    )
    out = spread_underparallel(stream)
    assert out is stream  # .rdd raises on streams; helper must no-op
