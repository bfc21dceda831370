"""Stream-stream interval join: the streaming execution of
attribution_join must produce exactly the batch twin's rows (the
batch form is what the driver oracle-checks as `attribution_join`)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as em
from annotation_service_spark.streaming.joins import attribution_join

SF = "/root/testdata/sf0.001"


def _sides(spark):
    ev = em._t(spark, SF, "events")
    imps = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("imp_id"), F.col("ts").alias("imp_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return imps, clicks


def test_stream_stream_join_equals_batch(spark, tmp_path):
    imps, clicks = _sides(spark)
    horizon = "4 hours"  # wider than the gate so the fixture yields rows
    batch = sorted(
        tuple(r) for r in attribution_join(imps, clicks, horizon=horizon).collect()
    )
    assert batch, "fixture must produce at least one attributed pair"

    imp_dir, click_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")
    imps.write.parquet(imp_dir)
    clicks.write.parquet(click_dir)
    s_imps = spark.readStream.schema(imps.schema).parquet(imp_dir)
    s_clicks = spark.readStream.schema(clicks.schema).parquet(click_dir)
    out = attribution_join(s_imps, s_clicks, horizon=horizon)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("attr_join")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM attr_join").collect())
    assert got == batch


def test_registered_in_contract():
    assert "attribution_join" in em.queries()
    assert "attribution_join" in em.oracle_sql()
