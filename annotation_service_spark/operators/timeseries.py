"""Time-series regularization: resample irregular observations onto a
fixed calendar grid with last-observation-carried-forward fill.

The reference has no time-series surface; this is the
beyond-reference operator a metrics/feature pipeline needs (turning
event streams into aligned daily/hourly series for joins with model
features). Everything is built-in expressions — no UDFs.

Scale design:
- the per-(key, bucket) "latest observation" pass is a window
  row_number keyed on (key, bucket) — uniform keys, partial-agg-free
  but shuffle-keyed the same as any groupBy; deterministic tie-break
  on (ts, id) descending.
- the grid is keys × sequence(min_bucket, max_bucket) — the
  two-scalar span aggregate broadcasts, so grid generation is a
  map-side explode over the (small) distinct-keys relation; grid
  size = |keys| · |span/step| rows, stated up front by construction.
- the forward fill is one window pass per key ordered by bucket
  (``last(v, ignorenulls=True)``) — state is one value per key, the
  same access pattern at any scale.

The DuckDB oracle intentionally uses a DIFFERENT algorithm (native
ASOF JOIN of grid→latest-observation) — matching outputs from two
formulations is a stronger check than replaying the window plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    obs: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    id_col: str = "event_id",
    milli_scale: int = 1000,
) -> DataFrame:
    """Daily grid per key spanning the corpus' [min, max] day, with
    the latest observation per (key, day) forward-filled. Values are
    fixed-point milli-units (floor(value·1000) as BIGINT) so the
    fill is engine-exact. Returns (key, grid_date, v_milli,
    observed); v_milli is NULL before a key's first observation.

    NULL observation values: the fill is pandas-style LOCF — a NULL
    observation is skipped and the previous non-null value carries
    through (``last(ignorenulls=True)``), while ``observed`` still
    reports the row (join-hit semantics). The driver oracle's ASOF
    formulation assumes non-null observation values (true of the
    gate data); the NULL behavior is pinned by
    tests/test_timeseries_json.py instead."""
    t = F.col(ts).cast("timestamp")
    day = F.date_trunc("day", t)
    prepared = obs.select(
        F.col(key),
        day.alias("bucket"),
        t.alias("_ts"),
        F.col(id_col).alias("_id"),
        F.floor(F.col(val) * milli_scale).cast("long").alias("v_milli"),
    )
    w_latest = Window.partitionBy(key, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    latest = (
        prepared.withColumn("rk", F.row_number().over(w_latest))
        .where(F.col("rk") == 1)
        # explicit hit marker: "observed" must mean A ROW EXISTED in
        # the bucket, not "the filled value is non-null" — the two
        # differ when the source value itself is NULL
        .select(key, "bucket", "v_milli", F.lit(True).alias("_hit"))
    )
    span = obs.agg(
        F.date_trunc("day", F.min(t)).alias("lo"),
        F.date_trunc("day", F.max(t)).alias("hi"),
    )
    keys = obs.select(key).distinct()
    grid = keys.crossJoin(F.broadcast(span)).select(
        key,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    joined = grid.join(latest, [key, "bucket"], "left").withColumn(
        "observed", F.coalesce(F.col("_hit"), F.lit(False))
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        F.col("bucket").cast("date").alias("grid_date"),
        F.last("v_milli", ignorenulls=True).over(w_fill).alias("v_milli"),
        "observed",
    )


def trailing_window_sum(
    events: DataFrame,
    trail_micros: int = 3_600_000_000,
    part_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time trailing-window aggregate per key: for every event,
    the count and fixed-point sum of that key's events in the
    trailing ``trail_micros`` (inclusive of the current row and any
    equal-timestamp peers — RANGE-frame semantics, the window class
    ROWS frames can't express because membership depends on the
    VALUE of the ordering column, not its position).

    Implemented as a true RANGE frame over epoch microseconds
    (``Window.rangeBetween`` needs a numeric ordering column).
    Sums carry floor(value·1000) BIGINT so the frame reduction is
    associative-exact.

    Scale: one shuffle keyed by ``part_col`` (uniform id), then a
    per-key ordered scan — Spark's WindowExec keeps only the frame's
    sliding state in memory, so a key's history streams rather than
    materializes. Skewed keys (one user = half the events) would be
    the concern; the rollup family is the aggregate-side answer,
    this operator is for per-EVENT feature generation (e.g. "events
    by this user in the last hour" as an abuse/velocity feature).
    """
    # unix_micros is the exact integer epoch (a double round-trip
    # would lose sub-µs bits — the TESTDATA nanos lesson); the cast
    # lifts NTZ parquet timestamps into the UTC session zone exactly
    base = events.withColumn(
        "_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    w = (
        Window.partitionBy(part_col)
        .orderBy("_us")
        .rangeBetween(-trail_micros, 0)
    )
    return base.select(
        "event_id",
        part_col,
        F.count(F.lit(1)).over(w).alias("trail_n"),
        F.sum(F.floor(F.col(value_col) * 1000).cast("long"))
        .over(w)
        .cast("long")
        .alias("trail_v_milli"),
    )


def linear_interp_daily(
    obs: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    val: str = "value",
    id_col: str = "event_id",
    milli_scale: int = 1000,
) -> DataFrame:
    """Daily grid per key with LINEAR interpolation between the
    surrounding observations — the resampler for continuous signals
    where LOCF (``gap_fill_daily``) is a step-function bias.

    v(g) = v_prev + (v_next − v_prev) · (g − day_prev)/(day_next −
    day_prev); flat-extrapolates after the last observation, NULL
    before the first. Observation values are snapped to milli fixed
    point first, and the interpolation is the same 4-op double
    sequence on both engines (each IEEE op correctly rounded ⇒
    bit-identical), with 1e-6 rounding as belt-and-braces.

    Scale shape: identical to ``gap_fill_daily`` — latest-per-bucket
    window, broadcast span, grid explode, then TWO ordered window
    passes per key (backward last + forward first, both
    ignorenulls). State per key is one value in each direction.
    """
    t = F.col(ts).cast("timestamp")
    day = F.date_trunc("day", t)
    prepared = obs.select(
        F.col(key),
        day.alias("bucket"),
        t.alias("_ts"),
        F.col(id_col).alias("_id"),
        (F.floor(F.col(val) * milli_scale).cast("long") / F.lit(float(milli_scale))).alias("v"),
    )
    w_latest = Window.partitionBy(key, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    latest = (
        prepared.withColumn("rk", F.row_number().over(w_latest))
        .where(F.col("rk") == 1)
        .select(key, "bucket", "v", F.lit(True).alias("_hit"))
    )
    span = obs.agg(
        F.date_trunc("day", F.min(t)).alias("lo"),
        F.date_trunc("day", F.max(t)).alias("hi"),
    )
    keys = obs.select(key).distinct()
    grid = keys.crossJoin(F.broadcast(span)).select(
        key,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    joined = grid.join(latest, [key, "bucket"], "left").withColumn(
        "observed", F.coalesce(F.col("_hit"), F.lit(False))
    )
    w_back = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("observed"), F.col("bucket"))
    e = (
        joined.withColumn("pv", F.last("v", ignorenulls=True).over(w_back))
        .withColumn("pd", F.last(obs_day, ignorenulls=True).over(w_back))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_fwd))
        .withColumn("nd", F.first(obs_day, ignorenulls=True).over(w_fwd))
    )
    frac = F.datediff("bucket", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    interp = (
        F.when(F.col("observed"), F.col("v"))
        .when(F.col("pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    from annotation_service_spark.functions.text import round_fixed

    return e.select(
        key,
        F.col("bucket").cast("date").alias("grid_date"),
        round_fixed(interp, 6).alias("v_interp"),
        "observed",
    )
