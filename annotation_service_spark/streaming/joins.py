"""Stream-stream event-time interval join (ad-attribution shape).

The reference's streaming surface is stream-STATIC only (request
streams joined to slowly-changing dataset tables, SURVEY §2.7); this
adds the remaining Structured Streaming join class: two unbounded
streams joined on a key plus an event-time range, with watermarks
bounding both sides' state.

Semantics: every (impression, click) pair for the same key where the
click lands in ``[imp_ts, imp_ts + horizon]``. With watermarks W on
both sides, Spark keeps impression state until its window can no
longer match any future click (``imp_ts + horizon + W``) and click
state for W — state is bounded and keyed by the join key (uniform
user ids → skew-free).

The SAME function works on batch DataFrames (watermarks are only
attached to streaming inputs), which is how the oracle gate checks
the join's values: the batch twin must equal the streaming result on
a replayed file stream (tests/test_stream_join.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    imp_ts: str = "imp_ts",
    click_ts: str = "click_ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """(user_id, imp_id, click_id, delay_us): one row per click that
    follows an impression by the same key within ``horizon``.
    ``delay_us`` is exact integer microseconds (unix_micros), so the
    output is engine-portable bit-for-bit."""
    # Structured Streaming event time must be TIMESTAMP (not NTZ);
    # the session runs UTC so the cast preserves the exact micros.
    impressions = impressions.withColumn(imp_ts, F.col(imp_ts).cast("timestamp"))
    clicks = clicks.withColumn(click_ts, F.col(click_ts).cast("timestamp"))
    if impressions.isStreaming:
        impressions = impressions.withWatermark(imp_ts, watermark)
    if clicks.isStreaming:
        clicks = clicks.withWatermark(click_ts, watermark)
    cond = (
        (impressions[key] == clicks[key])
        & (clicks[click_ts] >= impressions[imp_ts])
        & (clicks[click_ts] <= impressions[imp_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return impressions.join(clicks, cond, "inner").select(
        impressions[key].alias("user_id"),
        F.col("imp_id"),
        F.col("click_id"),
        (
            F.unix_micros(clicks[click_ts].cast("timestamp"))
            - F.unix_micros(impressions[imp_ts].cast("timestamp"))
        ).alias("delay_us"),
    )
