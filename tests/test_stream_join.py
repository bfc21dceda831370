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


def test_stream_join_out_of_order_replay_and_state_eviction(spark, tmp_path):
    """VERDICT r3 #9: replay out-of-order events across 4 micro-batches
    — a click arriving a batch AFTER newer events (but inside the
    watermark) must still attribute, watermark advance must EVICT old
    impression/click state (observed via stateOperators metrics), and
    the streamed rows must equal the batch twin on the same data."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def T(minutes):
        return base + dt.timedelta(minutes=minutes)

    horizon, watermark = "10 minutes", "20 minutes"
    imp_batches = [
        [(1, 100, T(0)), (2, 101, T(5))],
        [(1, 102, T(40))],
        [(1, 103, T(200)), (2, 104, T(205))],  # big jump → evicts old state
        [(2, 105, T(210))],
    ]
    click_batches = [
        [(1, 900, T(3))],
        # click 901 (T+8) is OUT OF ORDER relative to batch 1's max
        # (T+5/T+3 ⇒ watermark still below T0) — must still match 101
        [(2, 901, T(8)), (1, 902, T(45))],
        [(1, 903, T(204))],
        [(2, 904, T(212))],
    ]
    imp_schema = "user_id long, imp_id long, imp_ts timestamp"
    click_schema = "user_id long, click_id long, click_ts timestamp"
    imp_dir, click_dir = str(tmp_path / "imps"), str(tmp_path / "clicks")

    def write(batch, schema, path):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    write(imp_batches[0], imp_schema, imp_dir)
    write(click_batches[0], click_schema, click_dir)
    s_imps = spark.readStream.schema(imp_schema).parquet(imp_dir)
    s_clicks = spark.readStream.schema(click_schema).parquet(click_dir)
    out = attribution_join(
        s_imps, s_clicks, horizon=horizon, watermark=watermark
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_replay")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
        for ib, cb in zip(imp_batches[1:], click_batches[1:]):
            write(ib, imp_schema, imp_dir)
            write(cb, click_schema, click_dir)
            q.processAllAvailable()
        got = sorted(
            tuple(r)
            for r in spark.sql("SELECT * FROM attr_replay").collect()
        )
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
        removed = sum(
            so.get("numRowsRemoved", 0)
            for p in progresses
            for so in p["stateOperators"]
        )
        final_state = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    # all six (imp, click) pairs attribute despite cross-batch disorder
    # (click 904 lands in BOTH imp 104's and imp 105's horizon)
    b_imps = spark.createDataFrame(sum(imp_batches, []), imp_schema)
    b_clicks = spark.createDataFrame(sum(click_batches, []), click_schema)
    batch = sorted(
        tuple(r)
        for r in attribution_join(b_imps, b_clicks, horizon=horizon).collect()
    )
    assert len(batch) == 6
    assert got == batch
    # watermark advance evicted state: rows were removed, and the
    # retained state is smaller than everything ever ingested
    assert removed > 0
    assert final_state < sum(map(len, imp_batches + click_batches))


def test_registered_in_contract():
    assert "attribution_join" in em.queries()
    assert "attribution_join" in em.oracle_sql()
