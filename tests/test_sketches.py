"""Sketch scale-twins vs their exact ground-truth forms.

At 100 TB the exact forms (count(DISTINCT ...), sort-based
percentile) pay a full shuffle of distinct values / a per-group sort;
the sketch forms (HLL++ approx_count_distinct, t-digest
approx_percentile) are single-shuffle map-side-combinable. These
tests pin the error envelope so the scale path is evidence, not
faith: rsd/accuracy parameters are honored within their documented
bounds on adversarially-sized inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_vs_exact_distinct(spark):
    # 200k rows, 50k distinct per group — far beyond sparse-mode HLL
    df = spark.range(200_000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 50_000).alias("v")
    )
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    approx = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.approx_count_distinct("v", rsd=0.02).alias("n"))
        .collect()
    }
    for g, n in exact.items():
        # 3 standard deviations of the configured 2% rsd
        assert abs(approx[g] - n) <= 0.06 * n, (g, approx[g], n)


def test_tdigest_vs_exact_percentile(spark):
    # skewed (quadratic) distribution; accuracy=10000 -> rank error
    # <= 1/10000 of n, i.e. value drift bounded by the local density
    df = spark.range(100_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") * F.col("id")).alias("v")
    )
    rows = (
        df.groupBy("g")
        .agg(
            F.expr(
                "percentile(v, array(0.5D, 0.99D))"
            ).alias("exact"),
            F.expr(
                "approx_percentile(v, array(0.5D, 0.99D), 10000)"
            ).alias("approx"),
        )
        .collect()
    )
    for r in rows:
        for e, a in zip(r["exact"], r["approx"]):
            assert abs(a - e) <= 0.01 * e + 1e-9, (r["g"], e, a)


def test_count_min_bounds(spark):
    """est >= true always; with 5000 keys in 256 buckets the average
    overestimate stays within the CMS bound (~N/width per row, min
    over depth rows)."""
    from pyspark.sql import functions as F

    from annotation_service_spark.operators.sketch import (
        count_min_build,
        count_min_estimate,
    )

    # zipf-ish: key k appears ~ 5000/k times for the head
    rows = []
    for k in range(1, 5001):
        reps = max(1, 2000 // k)
        rows.extend([(f"key{k}",)] * reps)
    df = spark.createDataFrame(rows, ["token"])
    n = len(rows)
    sk = count_min_build(df, "token", depth=4, width=256)
    est = {
        r["token"]: r["est"]
        for r in count_min_estimate(sk, df, "token", depth=4, width=256).collect()
    }
    true = {
        r["token"]: r["c"]
        for r in df.groupBy("token").agg(F.count("*").alias("c")).collect()
    }
    assert set(est) == set(true)
    overs = []
    for k, t in true.items():
        assert est[k] >= t, k
        overs.append(est[k] - t)
    # expected overestimate per row ~ N/width; min over 4 rows is
    # well under that — allow 3x headroom on the mean
    assert sum(overs) / len(overs) <= 3 * n / 256
    # the sketch state is bounded: at most depth*width cells
    assert sk.count() <= 4 * 256


def test_count_min_weighted_build_matches_occurrences(spark):
    """The r13 aggregate-first form — build from the pre-aggregated
    (key, cnt) relation with weight_col — yields cell-for-cell the
    SAME sketch as building from raw occurrence rows (cell value
    Σ_{keys→cell} cnt ≡ occurrence count by definition)."""
    from pyspark.sql import functions as F

    from annotation_service_spark.operators.sketch import count_min_build

    rows = []
    for k in range(1, 400):
        rows.extend([(f"key{k}",)] * max(1, 300 // k))
    occ = spark.createDataFrame(rows, ["token"])
    agg = occ.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    a = {
        (r["row"], r["bucket"]): r["c"]
        for r in count_min_build(occ, "token", depth=4, width=64).collect()
    }
    b = {
        (r["row"], r["bucket"]): r["c"]
        for r in count_min_build(
            agg, "token", depth=4, width=64, weight_col="cnt"
        ).collect()
    }
    assert a == b


def test_count_min_streaming_update(spark, tmp_path):
    """count_min_build runs unchanged as a streaming aggregation:
    complete-mode cells after consuming the stream equal the batch
    sketch cell-for-cell (bounded state: <= depth*width rows)."""
    from annotation_service_spark.operators.sketch import count_min_build

    rows = [(f"key{i % 40}",) for i in range(2000)]
    df = spark.createDataFrame(rows, ["token"])
    d = tmp_path / "toks"
    df.write.parquet(str(d))

    batch = {
        (r["row"], r["bucket"]): r["c"]
        for r in count_min_build(df, "token", depth=3, width=64).collect()
    }

    stream = spark.readStream.schema("token string").parquet(str(d))
    q = (
        count_min_build(stream, "token", depth=3, width=64)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["bucket"]): r["c"]
        for r in spark.sql("SELECT * FROM cms_out").collect()
    }
    assert got == batch
    assert len(got) <= 3 * 64


def test_bloom_positions_nonnegative(spark):
    """ADVICE r5: bit positions must come from pmod, not abs()% —
    abs(Long.MIN_VALUE) is still negative in two's complement, and
    plain % preserves sign, so abs(h) % n can go negative. Mirror the
    implementation's hash expression over string keys (≈half produce
    negative xxhash64) and pin every position into [0, n_bits)."""
    from pyspark.sql import functions as F

    n_bits, seed = 1 << 17, 11
    df = spark.range(0, 2000).selectExpr("concat('key-', id) AS k")
    pos = df.select(
        "k",
        *[
            F.pmod(F.xxhash64(F.col("k"), F.lit(seed + i)), F.lit(n_bits))
            .cast("long")
            .alias(f"h{i}")
            for i in range(5)
        ],
    ).agg(
        F.min(F.least(*[F.col(f"h{i}") for i in range(5)])).alias("lo"),
        F.max(F.greatest(*[F.col(f"h{i}") for i in range(5)])).alias("hi"),
        # sanity: the raw hashes really do go negative on this corpus
        F.min(F.xxhash64(F.col("k"), F.lit(seed))).alias("raw_min"),
    ).collect()[0]
    assert pos.raw_min < 0
    assert 0 <= pos.lo and pos.hi < n_bits


def test_bloom_semijoin_reduction_properties(spark):
    """No false negatives (every build key passes), measurable
    selectivity (most non-keys are dropped), and the empirical
    false-positive rate stays near the (1-e^{-kn/m})^k design point."""
    import math

    from annotation_service_spark.operators import sketch as sk

    build = spark.range(0, 2000).selectExpr("id * 7 AS k")
    n_bits, k = 1 << 16, 5
    bloom = sk.bloom_build(build, "k", n_bits=n_bits, n_hashes=k)
    # every member passes
    kept = sk.bloom_might_contain(build, "k", bloom, n_bits=n_bits, n_hashes=k)
    assert kept.count() == 2000
    # non-members: ids in a disjoint range
    probe = spark.range(1_000_000, 1_050_000).selectExpr("id AS k")
    fp = sk.bloom_might_contain(probe, "k", bloom, n_bits=n_bits, n_hashes=k).count()
    rate = fp / 50_000
    design = (1 - math.exp(-k * 2000 / n_bits)) ** k
    assert rate < max(4 * design, 0.01), (rate, design)


def test_heavy_hitters_exact_vs_groupby(spark):
    """Two-pass Misra-Gries output == naive groupBy+HAVING, on a
    Zipf-ish corpus spread over 32 partitions."""
    from annotation_service_spark.operators import sketch as sk

    # key k appears ~ 3000/k times: a handful of heavy keys + a tail
    df = (
        spark.range(200)
        .select(
            F.explode(
                F.sequence(
                    F.lit(1), (3000 / (F.col("id") + 1)).cast("int")
                )
            ).alias("r"),
            F.col("id"),
        )
        .select(F.concat(F.lit("k"), F.col("id")).alias("key"))
        .repartition(32)
    )
    denom = 50
    got = {
        (r["key"], r["cnt"])
        for r in sk.heavy_hitters(df, "key", denom).collect()
    }
    n = df.count()
    want = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") * denom >= F.lit(n))
        .collect()
    }
    assert got == want and len(want) > 3


def test_heavy_hitters_candidates_bounded(spark):
    """The candidate pass emits <= capacity keys per partition even
    when every partition holds far more distinct keys."""
    from annotation_service_spark.operators import sketch as sk

    df = (
        spark.range(50_000)
        .select(F.concat(F.lit("u"), F.col("id")).alias("key"))
        .repartition(8)
    )
    cap = 20
    n_cands = sk.heavy_hitter_candidates(df, "key", cap).count()
    assert n_cands <= cap * 8


def test_heavy_hitters_spread_thin_still_found(spark):
    """A key heavy globally but diluted evenly across all partitions
    must survive the candidate union (the pigeonhole guarantee)."""
    from annotation_service_spark.operators import sketch as sk

    # 'hot' is 10% of 40k rows, round-robin over 32 partitions, the
    # rest is 36k distinct singletons crowding every partition's MG
    hot = spark.range(4_000).select(F.lit("hot").alias("key"))
    noise = spark.range(36_000).select(
        F.concat(F.lit("n"), F.col("id")).alias("key")
    )
    df = hot.unionAll(noise).repartition(32)
    out = sk.heavy_hitters(df, "key", threshold_denom=10).collect()
    assert [(r["key"], r["cnt"]) for r in out] == [("hot", 4_000)]


def test_heavy_hitters_long_key_schema(spark):
    """The candidate pass derives its Arrow schema from the key's
    dtype (ADVICE r6): long keys survive the fold and the follow-up
    semi-join compares matching types — output still == the naive
    groupBy+HAVING."""
    from annotation_service_spark.operators import sketch as sk

    df = (
        spark.range(60)
        .select(
            F.explode(
                F.sequence(F.lit(1), (600 / (F.col("id") + 1)).cast("int"))
            ).alias("r"),
            (F.col("id") * 1_000_000_007).alias("key"),  # long keys
        )
        .select("key")
        .repartition(16)
    )
    cands = sk.heavy_hitter_candidates(df, "key", 20)
    assert dict(cands.dtypes)["key"] == "bigint"
    denom = 30
    got = {
        (r["key"], r["cnt"])
        for r in sk.heavy_hitters(df, "key", denom).collect()
    }
    n = df.count()
    want = {
        (r["key"], r["cnt"])
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") * denom >= F.lit(n))
        .collect()
    }
    assert got == want and len(got) > 0
