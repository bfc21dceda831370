"""Product-analytics operators over event streams: ordered funnels
and cohort retention.

Both are compositions of built-in aggregations/joins designed for the
100 TB event-table shape:

- ``funnel_reach``: per-user earliest qualifying progression through
  an ordered step list (step k counts only events strictly after the
  user's step-k-1 time). Each stage is one groupBy keyed by user_id
  (uniform) joined to the next filtered scan; k steps = k passes over
  the (filtered) event table, never a self-cartesian. The per-user
  reach table is one row per user.
- ``cohort_retention``: users bucketed by first-seen week, activity
  as distinct (user, week-offset) — two groupBys and one join, all
  keyed by user_id; output cardinality = cohorts × horizon.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel reach: (user, t1..tk) where t_i is the
    earliest step-i event strictly after t_{i-1}; NULL once the
    funnel breaks. One row per user who completed step 1."""
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == step)
            .select(F.col(user_col).alias("u"), F.col(ts_col).alias("__ts"))
            .join(cur, "u")
            .where(F.col("__ts") > F.col(f"t{i-1}"))
            .groupBy("u", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("__ts").alias(f"t{i}"))
        )
        cur = cur.join(
            nxt.select("u", f"t{i}"), "u", "left"
        )
    return cur.withColumnRenamed("u", user_col)


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Single-row cumulative funnel: step_i_users = users whose
    earliest qualifying progression reached step i."""
    reach = funnel_reach(events, steps, user_col, ts_col, type_col)
    aggs = [F.count(F.lit(1)).cast("long").alias("step1_users")]
    for i in range(2, len(steps) + 1):
        aggs.append(
            F.sum(F.col(f"t{i}").isNotNull().cast("long"))
            .cast("long")
            .alias(f"step{i}_users")
        )
    return reach.agg(*aggs)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): users grouped by their
    first-seen week; a user counts in offset w if they had any event
    in cohort_week + w."""
    first = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).alias("wk"),
        )
        .join(first, "u")
        .select(
            "u",
            "cohort_week",
            (
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort_week"))
                / 604800
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        # DATE at the edge: DuckDB's date_trunc returns DATE while
        # Spark's returns TIMESTAMP — normalize for comparability
        .withColumn("cohort_week", F.col("cohort_week").cast("date"))
    )
