"""gap_fill_daily (time-series regularization) and the typed JSON
extraction gate. Cross-engine value parity is driver-gated
(`gap_fill` — checked against a DuckDB ASOF JOIN — and
`json_extract`); these pin the fill/parse semantics on hand-built
fixtures."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import __spark_entry__ as em
from annotation_service_spark.operators.timeseries import gap_fill_daily


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


def test_gap_fill_ffill_and_leading_nulls(spark):
    rows = [
        # user 1: two obs on day 1 (latest wins), nothing on day 2,
        # new value day 3
        (1, 1, _ts(1, 8), 10.0),
        (2, 1, _ts(1, 9), 20.0),
        (3, 1, _ts(3), 30.0),
        # user 2: first obs on day 2 -> day 1 must stay NULL
        (4, 2, _ts(2), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {
        (r.user_id, str(r.grid_date)): (r.v_milli, r.observed)
        for r in gap_fill_daily(df).collect()
    }
    assert out[(1, "2024-01-01")] == (20000, True)  # latest of day 1
    assert out[(1, "2024-01-02")] == (20000, False)  # carried forward
    assert out[(1, "2024-01-03")] == (30000, True)
    assert out[(2, "2024-01-01")] == (None, False)  # before first obs
    assert out[(2, "2024-01-02")] == (40000, True)
    assert out[(2, "2024-01-03")] == (40000, False)
    # grid is the full corpus span for every key
    assert len(out) == 6


def test_gap_fill_tie_break_on_id(spark):
    rows = [
        (9, 1, _ts(1, 8), 1.0),
        (8, 1, _ts(1, 8), 2.0),  # same ts: higher event_id (9) wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    r = gap_fill_daily(df).collect()[0]
    assert r.v_milli == 1000


def test_json_extract_missing_and_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, "a", '{"k": 5}'),
            (2, "a", "{}"),
            (3, "a", "not json"),
            (4, "a", None),
        ],
        "event_id long, event_type string, props string",
    )
    k = F.from_json("props", "k long")["k"]
    agg = (
        df.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
        )
        .collect()[0]
    )
    assert agg.sum_k == 5
    assert agg.n_missing == 3  # empty object, malformed, NULL all map to NULL


def test_registered_in_contract():
    for name in ("gap_fill", "json_extract"):
        assert name in em.queries()
        assert name in em.oracle_sql()


def test_grouping_sets_levels(spark):
    SF = "/root/testdata/sf0.001"
    rows = em.q_grouping_sets(spark, SF).collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2}  # (type,dow), (type), (dow)
    total_detail = sum(r.n for r in rows if r.gid == 0)
    total_by_type = sum(r.n for r in rows if r.gid == 1)
    total_by_dow = sum(r.n for r in rows if r.gid == 2)
    assert total_detail == total_by_type == total_by_dow
    assert "grouping_sets" in em.queries() and "grouping_sets" in em.oracle_sql()


def test_posting_lists_sorted_distinct(spark):
    SF = "/root/testdata/sf0.001"
    rows = em.q_posting_lists(spark, SF).collect()
    assert rows
    for r in rows:
        # postings is a comma-joined string (portable across the
        # Spark/DuckDB hash compare); split to check the contract
        xs = r.postings.split(",")
        assert r.df == len(xs) >= 5
        assert xs == sorted(set(xs), key=int)
    assert "posting_lists" in em.queries() and "posting_lists" in em.oracle_sql()


def test_gap_fill_null_value_still_observed(spark):
    """A bucket with an observed row whose value is NULL must report
    observed=True (join-hit semantics, matching the oracle's
    formulation) even though the fill carries the previous value."""
    rows = [(1, 1, _ts(1), 10.0), (2, 1, _ts(2), None)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {str(r.grid_date): r for r in gap_fill_daily(df).collect()}
    assert out["2024-01-02"].observed is True
    # last(ignorenulls) carries day 1's value through the NULL obs
    assert out["2024-01-02"].v_milli == 10000


def test_trailing_window_hand_case(spark):
    """RANGE-frame membership: exactly-1-hour-old events are INSIDE
    the frame (inclusive bound); equal-timestamp peers aggregate
    together on both rows."""
    from annotation_service_spark.operators.timeseries import (
        trailing_window_sum,
    )
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, 7, t0, 1.0),
        (2, 7, t0 + dt.timedelta(minutes=30), 2.0),
        (3, 7, t0 + dt.timedelta(hours=1), 4.0),          # 1h after e1: in
        (4, 7, t0 + dt.timedelta(hours=1, seconds=1), 8.0),  # e1 out now
        (5, 7, t0 + dt.timedelta(hours=1, seconds=1), 16.0),  # peer of e4
        (6, 9, t0, 32.0),  # other user: independent frame
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: (r.trail_n, r.trail_v_milli)
        for r in trailing_window_sum(df).collect()
    }
    assert got[1] == (1, 1000)
    assert got[2] == (2, 3000)
    assert got[3] == (3, 7000)          # inclusive 1h bound keeps e1
    assert got[4] == (4, 30000)         # e1 aged out; peer e5 included
    assert got[5] == (4, 30000)         # identical frame as its peer
    assert got[6] == (1, 32000)


def test_trailing_window_registered():
    import __spark_entry__ as em

    assert "trailing_window" in em.queries()
    assert "trailing_window" in em.oracle_sql()


def test_trailing_window_randomized_differential(spark):
    """Random event sets vs a brute-force pure-Python replica: for
    every event, trail_n/trail_v_milli must equal the O(n^2) scan
    over its user's events within the inclusive trailing hour."""
    import math
    import random

    rng = random.Random(20260814)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    rows = []
    eid = 0
    for u in range(6):
        t = base_us
        for _ in range(40):
            t += rng.randint(1, 90) * 60_000_000  # 1-90 min steps
            rows.append((eid, u, t, round(rng.uniform(0, 50), 2)))
            eid += 1
    from pyspark.sql import functions as F

    from annotation_service_spark.operators.timeseries import (
        trailing_window_sum,
    )

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, value double"
    ).select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "value",
    )
    got = {
        r.event_id: (r.trail_n, r.trail_v_milli)
        for r in trailing_window_sum(df).collect()
    }
    H = 3_600_000_000
    for eid_, u, t, v in rows:
        peers = [
            (tt, vv)
            for (_, uu, tt, vv) in rows
            if uu == u and t - H <= tt <= t
        ]
        exp_n = len(peers)
        exp_s = sum(int(math.floor(vv * 1000)) for (_, vv) in peers)
        assert got[eid_] == (exp_n, exp_s), eid_


def test_linear_interp_hand_case(spark):
    """Two observations 4 days apart: interior days interpolate
    linearly, days before the first are NULL, days after the last
    carry flat; observed days return their own value."""
    from annotation_service_spark.operators.timeseries import (
        linear_interp_daily,
    )

    df = spark.createDataFrame(
        [
            (1, "2024-01-03 10:00:00", 10.0, 1),
            (1, "2024-01-07 09:00:00", 30.0, 2),
            (2, "2024-01-01 00:00:00", 5.0, 3),
            (2, "2024-01-09 00:00:00", 5.0, 4),
        ],
        "user_id long, ts string, value double, event_id long",
    )
    rows = {
        (r.user_id, str(r.grid_date)): (r.v_interp, r.observed)
        for r in linear_interp_daily(df).collect()
    }
    # grid spans 2024-01-01 .. 2024-01-09 for both users
    assert rows[(1, "2024-01-01")] == (None, False)  # before first obs
    assert rows[(1, "2024-01-03")] == (10.0, True)
    assert rows[(1, "2024-01-04")] == (15.0, False)  # 10 + 20*(1/4)
    assert rows[(1, "2024-01-06")] == (25.0, False)
    assert rows[(1, "2024-01-07")] == (30.0, True)
    assert rows[(1, "2024-01-09")] == (30.0, False)  # flat tail
    # constant series stays constant through the gap
    assert rows[(2, "2024-01-05")] == (5.0, False)
