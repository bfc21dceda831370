"""Funnel + cohort retention semantics."""

from __future__ import annotations

import datetime as dt

from annotation_service_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_reach,
)

T0 = dt.datetime(2024, 6, 3)  # a Monday


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for u, m, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_order_matters(spark):
    ev = _ev(
        spark,
        [
            # u1: full ordered funnel
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # u2: purchase BEFORE click -> reaches step 2 via the
            # later click, but no purchase after it -> no step 3
            (2, 0, "view"), (2, 5, "purchase"), (2, 10, "click"),
            # u3: click before any view -> that click can't qualify,
            # but a later one can
            (3, 0, "click"), (3, 5, "view"), (3, 8, "click"),
            # u4: view only
            (4, 0, "view"),
            # u5: never views -> not in the funnel at all
            (5, 0, "click"), (5, 1, "purchase"),
        ],
    )
    (row,) = funnel_counts(ev, ["view", "click", "purchase"]).collect()
    assert row["step1_users"] == 4
    assert row["step2_users"] == 3  # u1, u2, u3
    assert row["step3_users"] == 1  # u1 only
    reach = {r["user_id"]: r for r in
             funnel_reach(ev, ["view", "click", "purchase"]).collect()}
    assert reach[3]["t2"] is not None and reach[3]["t3"] is None
    assert reach[2]["t3"] is None


def test_cohort_retention_offsets(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "view"),                  # week 0
            (1, 60 * 24 * 7, "view"),        # week 1
            (1, 60 * 24 * 21, "view"),       # week 3
            (2, 60 * 24 * 7, "view"),        # first seen week 1
            (2, 60 * 24 * 14, "view"),       # their offset 1
        ],
    )
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    w0, w1 = "2024-06-03", "2024-06-10"
    assert got[(w0, 0)] == 1 and got[(w0, 1)] == 1 and got[(w0, 3)] == 1
    assert got[(w1, 0)] == 1 and got[(w1, 1)] == 1
    assert (w0, 2) not in got


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The stateful streaming funnel's completion set equals the
    batch funnel_reach completions (same earliest-progression
    semantics), including completion timestamps — and a second
    micro-batch completes a funnel whose state carried over."""
    import random

    from annotation_service_spark.streaming.stateful import streaming_funnel

    rng = random.Random(9)
    rows = []
    for u in range(40):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (
                    u,
                    T0 + dt.timedelta(minutes=rng.randint(0, 500)),
                    rng.choice(["view", "click", "purchase", "error"]),
                )
            )
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )
    d = tmp_path / "ev"
    ev.write.parquet(str(d))

    batch_done = {
        r["user_id"]: r["t3"]
        for r in funnel_reach(ev, ["view", "click", "purchase"]).collect()
        if r["t3"] is not None
    }

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_type string"
    ).parquet(str(d))
    out_dir = str(tmp_path / "funnel_out")

    def run_once():
        q = (
            streaming_funnel(stream, ["view", "click", "purchase"])
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_f"))
            .start()
        )
        q.awaitTermination(120)
        return {
            r["user_id"]: r["completed_at"]
            for r in spark.read.parquet(out_dir).collect()
        }

    got = run_once()
    assert got == batch_done

    # second micro-batch: a user who had reached step 2 completes
    half = [u for u in range(40) if u not in batch_done][:1]
    if half:
        u = half[0]
        more = spark.createDataFrame(
            [
                (u, T0 + dt.timedelta(minutes=600), "view"),
                (u, T0 + dt.timedelta(minutes=601), "click"),
                (u, T0 + dt.timedelta(minutes=602), "purchase"),
            ],
            "user_id long, ts timestamp, event_type string",
        )
        more.write.mode("append").parquet(str(d))
        got2 = run_once()
        assert u in got2
        # earlier completions are not re-emitted
        assert set(got2) == set(batch_done) | {u}
