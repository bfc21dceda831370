"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship annotate pipeline at sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) → DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL. Column names/types are aligned between the two
(dates as DATE, money math in exact DECIMAL cast to DOUBLE at the
end) so the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from annotation_service_spark.functions import ip as ipf
from annotation_service_spark.functions import text as txt
from annotation_service_spark.operators import asof as ao
from annotation_service_spark.operators import clustering as cl
from annotation_service_spark.operators import curation as cu
from annotation_service_spark.operators import decontam as dc
from annotation_service_spark.operators import dedup as dd
from annotation_service_spark.operators import interval as iv
from annotation_service_spark.operators import similarity as sim
from annotation_service_spark.caching import scoped_cache
from annotation_service_spark.sources.testdata import TABLES, load_table

_t = load_table


# ---------------------------------------------------------------------------
# Query implementations (Spark side)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — scan+filter+groupBy+8 aggs (A-class
    coverage). Money math in DECIMAL for bit-exact oracle parity."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(12,2)"
    price = F.col("l_extendedprice").cast(dec)
    disc = F.col("l_discount").cast(dec)
    tax = F.col("l_tax").cast(dec)
    one = F.lit(1).cast("decimal(4,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
            F.sum(disc).cast("double").alias("sum_disc"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
            (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
            (F.col("sum_disc") / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )


_MAX_PK_MEMO: dict[str, int] = {}


def _max_partkey(spark: SparkSession, sf_dir: str) -> int:
    """max(p_partkey), memoized per sf_dir — the probe generators
    need it as a Python scalar; without the memo every invocation
    pays an extra Spark job for a constant."""
    if sf_dir not in _MAX_PK_MEMO:
        part = _t(spark, sf_dir, "part")
        _MAX_PK_MEMO[sf_dir] = part.agg(F.max("p_partkey")).collect()[0][0]
    return _MAX_PK_MEMO[sf_dir]


def q_asof_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: as-of snapshot selection (directory/directory.go:230-240)
    — snapshots = distinct order months, probes = event timestamps;
    strictly-earlier rule with first-snapshot fallback."""
    snaps = (
        _t(spark, sf_dir, "orders")
        .select(F.date_trunc("month", "o_orderdate").cast("date").alias("dataset_date"))
        .distinct()
    )
    probes = _t(spark, sf_dir, "events").select("event_id", "ts")
    return ao.asof_join(probes, snaps, probe_date="ts")


def q_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 via the bucketed shuffle strategy: probes fall inside
    disjoint ranges with gaps (misses stay NULL, ~ErrNodeNotFound)."""
    part = _t(spark, sf_dir, "part")
    max_pk = _max_partkey(spark, sf_dir)
    ranges = part.select(
        ((F.col("p_partkey") - 1) * 100).alias("low"),
        ((F.col("p_partkey") - 1) * 100 + 49).alias("high"),
        F.col("p_brand").alias("brand"),
    )
    probes = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_partkey") * 37 + F.col("l_linenumber")) % (max_pk * 100)).alias("v"),
    )
    return iv.range_join_bucketed(
        probes, ranges, probe_col="v", low="low", high="high",
        payload=["brand"], bucket_width=4096, how="left",
    )


def q_interval_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: nested/overlapping interval flattening, innermost-wins
    (iputils/iputils.go:188-264), pure-SQL formulation."""
    part = _t(spark, sf_dir, "part")
    src = part.select(
        F.col("p_partkey").alias("seq"),
        ((F.col("p_partkey") % 50) * 100).alias("low"),
        ((F.col("p_partkey") % 50) * 100 + 70 + (F.col("p_partkey") % 7) * 20).alias("high"),
        F.col("p_brand").alias("payload"),
    )
    return iv.flatten_intervals_sql(
        src, low="low", high="high", payload=["payload"], seq="seq", merge=True
    )


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: adjacent-equal merge (iputils/iputils.go:155-184) over a
    run-length encoding of order statuses."""
    orders = _t(spark, sf_dir, "orders")
    rn = F.row_number().over(Window.orderBy("o_orderkey"))
    src = orders.select(
        ((rn - 1) * 10).alias("low"),
        ((rn - 1) * 10 + 9).alias("high"),
        F.col("o_orderstatus").alias("payload"),
    )
    return iv.merge_adjacent_equal(src, low="low", high="high", payload=["payload"])


def q_merge_annotators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: multi-source snapshot alignment (MergeAnnotators,
    directory/directory.go:170-202) over order/event month lists."""
    geo = (
        _t(spark, sf_dir, "orders")
        .select(F.date_trunc("month", "o_orderdate").cast("date").alias("dataset_date"))
        .distinct()
    )
    asn = (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("month", "ts").cast("date").alias("dataset_date"))
        .distinct()
    )
    return ao.merge_sources({"geo": geo, "asn": asn})


def _probe_ips(ev: DataFrame, m_val: int) -> DataFrame:
    """Probe-IP expressions over an events DataFrame — batch or
    streaming (pure per-row projections, so the same expression tree
    serves q_annotate and the stream_annotate gate)."""
    k = ((F.col("user_id") * 131 + F.col("event_id") * 7919) % m_val).cast("long")
    x = (k / 256).cast("long")
    y = k % 256
    z = (F.col("event_id") % 256).cast("long")
    dotted = F.format_string("10.%d.%d.%d", x, y, z)
    six_to_four = F.format_string("2002:0a%02x:%02x%02x::1", x, y, z)
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 10 == 0, six_to_four).otherwise(dotted).alias("ip"),
    )


def _annotate_probes(spark: SparkSession, sf_dir: str, m_val: int) -> DataFrame:
    return _probe_ips(_t(spark, sf_dir, "events"), m_val)


def q_annotate(spark: SparkSession, sf_dir: str, multiplier: int = 1) -> DataFrame:
    """Flagship: the reference's full query lifecycle (SURVEY §3) —
    IP parse (P3) → 6to4 rewrite (P4) → broadcast binary-search range
    join (J1) → missing backfill (P15). Networks derive from `part`
    (one /24 per partkey), probes from `events`; every 10th probe is
    the 6to4 form of the same underlying v4 address."""
    probes = _annotate_probes(
        spark, sf_dir, _annotate_m_val(spark, sf_dir)
    )
    if multiplier > 1:
        # bench probe-scale sweep: replicate probes JVM-side (explode of
        # a sequence — no extra input IO) to measure the per-probe cost
        # curve of the broadcast join at 10x/100x probe volume
        probes = probes.withColumn(
            "__m", F.explode(F.sequence(F.lit(1), F.lit(multiplier)))
        ).select(
            (F.col("event_id") * multiplier + F.col("__m")).alias("event_id"), "ip"
        )
    return _annotate_join(spark, sf_dir, probes)


def _annotate_m_val(spark: SparkSession, sf_dir: str) -> int:
    # probe-key modulus ≈ 110% of the network space → ~10% lookup
    # misses, matching the reference's production miss rate
    # (geolite2v2/geo-ip.go:162)
    return (_max_partkey(spark, sf_dir) + 1) * 10 // 9


def _annotate_join(
    spark: SparkSession, sf_dir: str, probes: DataFrame
) -> DataFrame:
    """Ranges-from-part build + the fused parse/6to4/binary-search
    broadcast range join + missing backfill — shared by the batch
    flagship and the streaming gate (stream-static safe: the build
    side is static and broadcast; the probe side only maps)."""
    part = _t(spark, sf_dir, "part")
    nets = part.select(
        F.format_string(
            "10.%d.%d.0/24",
            (F.col("p_partkey") / 256).cast("long"),
            F.col("p_partkey") % 256,
        ).alias("cidr"),
        F.col("p_brand"),
    )
    ranges = nets.select(
        ipf.cidr_to_range(F.col("cidr")).alias("r"), "p_brand"
    ).select(F.col("r.ip_low").alias("ip_low"), F.col("r.ip_high").alias("ip_high"), "p_brand")
    # fused kernel: parse (P3) + 6to4 (P4) + binary search (J1) in one
    # Arrow crossing — ~40% more probe throughput than UDF-then-join
    joined = iv.range_join_broadcast(
        probes, ranges, probe_col="ip", payload=["p_brand"], how="left",
        parse_ips=True,
    )
    return joined.select(
        "event_id",
        "ip",
        F.coalesce(F.col("p_brand"), F.lit("MISSING")).alias("brand"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST-analog batch sessionization (30-min gap) — the T2 machinery
    applied to event time; windows + cumsum, no UDF."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    brk = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("__grp", grp)
        .groupBy("user_id", "__grp")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: log-bucketed histogram (metrics/metrics.go:19-33 analog)
    using integer digit-count buckets (deterministic across engines)."""
    ev = _t(spark, sf_dir, "events")
    bucket = F.length(F.floor(F.col("value") * 1000).cast("long").cast("string"))
    return (
        ev.groupBy(F.col("event_type"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_asn_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9: RouteViews AS-string decode + BestASN
    (asn/asn-annotator.go:63-81, api/api.go:118-127)."""
    sup = _t(spark, sf_dir, "supplier")
    asn_str = F.format_string(
        "%d_%d,%d", F.col("s_suppkey"), F.col("s_nationkey"), F.col("s_suppkey") * 7
    )
    sys = ipf.asn_decode(asn_str)
    return sup.select(
        "s_suppkey",
        asn_str.alias("asn_str"),
        ipf.best_asn(sys).alias("best_asn"),
        F.size(sys).alias("n_systems"),
        F.aggregate(
            sys, F.lit(0), lambda acc, s: acc + F.size(s["asns"])
        ).alias("n_asns"),
    )


def q_response_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17: v1 response key ip+base36(epoch)
    (handler/handler.go:169-170)."""
    ev = _t(spark, sf_dir, "events")
    ip = F.format_string(
        "10.%d.%d.%d",
        (F.col("user_id") % 65536 / 256).cast("long"),
        F.col("user_id") % 256,
        F.col("event_id") % 256,
    )
    return ev.select(
        "event_id",
        ipf.base36_key(ip, F.unix_timestamp("ts")).alias("rkey"),
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy keeping the smallest id."""
    return dd.dedup_exact(_t(spark, sf_dir, "documents"))


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 8-band LSH near-dup pairs over word 3-grams,
    exact-verified at jaccard ≥ 0.5 (portable md5 hashing)."""
    return dd.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        ngram=3, num_hashes=16, bands=8, threshold=0.5,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup candidates (4 bands → 15-bit band
    keys, 32,768 buckets/band — the scale-safe regime; the old 16-bit
    form saturates at corpus scale) with hamming-1 band probing:
    pigeonhole guarantees every pair within hamming ≤ 4·2−1 = 7, so
    the hamming budget scales with the 60-bit width (7 ≈ bits/8, the
    same bit-agreement contract the 16-bit/hamming-2 form had)."""
    return dd.simhash_pairs(
        _t(spark, sf_dir, "documents"),
        ngram=3, bits=60, bands=4, max_hamming=7, probe_bits=1,
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs 3-gram Jaccard ≥ 0.5 via shingle equi-join."""
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.5
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed near-containment pairs |A∩B|/|A| ≥ 0.8 over 3-gram
    shingles — the asymmetric dup family (excerpt inside a longer
    doc) Jaccard misses. Same shingle-equi-join blocking as
    dedup_ngram_jaccard; no cartesian."""
    return dd.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.8
    )


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.8 via PPJoin-style PREFIX FILTERING
    (operators/dedup.py prefix_filter_jaccard_pairs): docs' shingles
    ordered rarest-first; only each doc's first n-ceil(0.8n)+1
    shingles enter the self-join (pigeonhole: a >=0.8 pair must
    collide there), then one-row-per-pair array_intersect verification.
    LOSSLESS vs the plain equi-join form, so the oracle is the plain
    exact-jaccard SQL at the same threshold — the gate proves the
    losslessness claim end-to-end. High thresholds are this form's
    home: the prefix (and with it the candidate set) shrinks as t
    rises, where the plain join's candidate count is t-independent
    (measured x100, 500k docs: 4.35M prefix candidates at t=0.8 vs
    113M plain — a 26x reduction)."""
    return dd.prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.8
    )


def q_dedup_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED (multiset) 3-gram Jaccard >= 0.5
    (operators/dedup.py weighted_jaccard_pairs): Σ min(tf) / Σ max(tf)
    — the repetition-aware near-dup measure; a phrase pasted 50 times
    scores like 50 pastes, not one. Same equi-join blocking and scale
    shape as the set form, payload +2 small ints."""
    return dd.weighted_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.5
    )


def q_dedup_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted near-dup at scale: MinHash over the tf-EXPANDED
    multiset ("s#1".."s#min(tf,8)") + 16/8 banded LSH + exact capped
    weighted-jaccard verify (operators/dedup.py
    weighted_minhash_pairs). For integer weights the expansion
    reduces weighted to set MinHash exactly, so the md5-portable
    signature/banding machinery replays verbatim in the DuckDB
    oracle."""
    return dd.weighted_minhash_pairs(
        _t(spark, sf_dir, "documents"),
        ngram=3, num_hashes=16, bands=8, threshold=0.5, tf_cap=8,
    )


def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join (operators/spatial.py
    grid_radius_join): deterministic md5-derived lat/lon per distinct
    user (the stratified_sample hash pattern; lat in [-60, 60), lon in
    [-180, 180)), all user pairs within 1000 km by haversine
    (rounded 1e-6 km). The Spark side runs grid-cell blocking with
    antimeridian seam replicas; the ORACLE brute-forces all pairs
    with only a lat-band prefilter — an INDEPENDENT implementation,
    so the gate checks the blocking's completeness, not just replay
    agreement."""
    from annotation_service_spark.operators.spatial import grid_radius_join

    ev = _t(spark, sf_dir, "events")
    uid = ev.select("user_id").distinct()

    def h(tag: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")

    pts = uid.select(
        F.col("user_id").alias("id"),
        ((h("lat") % 120000) / 1000.0 - 60.0).alias("lat"),
        ((h("lon") % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    out = grid_radius_join(pts, pts, 1000.0)
    return out.where(F.col("id_l") < F.col("id_r")).select(
        "id_l", "id_r", "dist_km"
    )


def q_annotate_nearest_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-thematic SERVING composition: annotate a client
    probe (the J1 flagship) then assign its nearest serving site —
    m-lab's actual production question ("which site should serve this
    client"). Clients = annotated (non-miss) probes with md5-derived
    coordinates; sites = the 25 nations with md5-derived coordinates;
    assignment = grid_knn_join k=1 within 5000 km (operators/
    spatial.py), deterministic (dist, site_id) ranking. Clients with
    no site in radius are absent (both engines). The oracle replays
    annotate's range join and brute-forces the nearest site with a
    window rank — independent of the grid blocking."""
    from annotation_service_spark.operators.spatial import grid_knn_join

    ann = q_annotate(spark, sf_dir).where(F.col("brand") != "MISSING")

    def h(tag: str, c):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(tag), c.cast("string"))), 1, 8),
            16, 10,
        ).cast("long")

    clients = ann.select(
        F.col("event_id").alias("id"),
        "brand",
        ((h("clat", F.col("event_id")) % 120000) / 1000.0 - 60.0).alias("lat"),
        ((h("clon", F.col("event_id")) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    nation = _t(spark, sf_dir, "nation")
    sites = nation.select(
        F.col("n_nationkey").alias("id"),
        ((h("slat", F.col("n_nationkey")) % 120000) / 1000.0 - 60.0).alias("lat"),
        ((h("slon", F.col("n_nationkey")) % 360000) / 1000.0 - 180.0).alias("lon"),
    )
    out = grid_knn_join(clients, sites, k=1, radius_km=5000.0)
    return out.select(
        F.col("id_l").alias("event_id"),
        F.col("brand_l").alias("brand"),
        F.col("id_r").alias("site_id"),
        "dist_km",
    )


def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical span decontamination (operators/decontam.py
    decontaminate_spans): same corpus/benchmark split as
    `decontaminate` (doc_id%100==0 is the benchmark), but instead of
    flagging whole docs, every benchmark-colliding 3-gram masks its
    pad-2 token window; overlapping masks merge (gaps-and-islands)
    and only the masked spans are removed. Output per doc: token
    totals, removed count, span count, and the md5 of the cleaned
    token stream (empty-string md5 for fully-masked docs)."""
    docs = _t(spark, sf_dir, "documents")
    return dc.decontaminate_spans(
        docs.where(F.col("doc_id") % 100 != 0),
        docs.where(F.col("doc_id") % 100 == 0),
        ngram=3, pad=2,
    )


def q_dedup_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-method evaluation report — the quality table a pipeline
    owner reads before trusting a scale path: per method, pair counts
    and precision/recall against the exact-jaccard ground truth at
    the same threshold (t=0.5, 3-grams). Methods: minhash (16/8
    banded LSH — recall < 1 possible by design) and prefix (the
    lossless PPJoin form — the report must show exactly 1.0/1.0).
    All counting is distributed (joins + one agg per method); the
    oracle replays both methods' SQL as subqueries and the same
    counts, so the report itself is driver-hash-verified."""
    docs = _t(spark, sf_dir, "documents")
    # r13 (guide §2.3): all three methods consume the IDENTICAL (id, s)
    # 3-gram shingle relation — tokenize+explode+distinct the corpus
    # ONCE and share the cached table (before: each method built and
    # separately cached its own copy — two redundant corpus passes)
    sh = scoped_cache(
        "entry.eval_report.shingles",
        dd.shingle_table(docs, "doc_id", "text", 3),
    )
    # cache each PAIR SET (tiny: the near-dup pairs, not the corpus) —
    # without it every count/intersection replays the whole pipeline
    # (measured 21.5 s -> the cached form's cost is one run of each)
    exact = scoped_cache(
        "entry.eval_report.exact",
        dd.ngram_jaccard_pairs(docs, ngram=3, threshold=0.5, shingles=sh)
        .select("id_a", "id_b"),
    )
    methods = {
        # r13 (guide §2.4): the exact relation IS the verify's accept
        # set — truth_pairs turns minhash's shingle⨝shingle verify
        # into candidates ⨝ exact (identical set by definition). The
        # bool marks method ⊆ exact BY CONSTRUCTION (built as
        # candidates ⨝ exact), so n_common == n_method and the
        # intersection count action is redundant — provably the same
        # number, one less job. prefix's 1.0/1.0 is an algorithmic
        # RESULT (PPJoin losslessness), not a construction, so its
        # intersection is still counted — the report must be able to
        # catch a prefix-filter bug.
        "minhash": (
            scoped_cache(
                "entry.eval_report.minhash",
                dd.minhash_lsh_pairs(
                    docs, ngram=3, num_hashes=16, bands=8, threshold=0.5,
                    shingles=sh, truth_pairs=exact,
                ).select("id_a", "id_b"),
            ),
            True,
        ),
        "prefix": (
            scoped_cache(
                "entry.eval_report.prefix",
                dd.prefix_filter_jaccard_pairs(
                    docs, ngram=3, threshold=0.5, shingles=sh
                ).select("id_a", "id_b"),
            ),
            False,
        ),
    }
    reports = []
    n_exact = exact.count()
    # r13 (guide §2.6 "overlap independent jobs"): the two method
    # pipelines are independent ACTIONS the driver otherwise runs
    # back-to-back, leaving the cluster idle through each one's
    # stage tail — submit both counts from a 2-thread pool so the
    # next pipeline's tasks back-fill executors the current one
    # frees. exact is materialized FIRST (above): minhash's verify
    # join consumes its cache, so overlapping it with the methods
    # would duplicate the exact pipeline's work instead of reusing it.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        n_methods = {
            name: f
            for name, f in zip(
                methods,
                pool.map(lambda kv: kv[0].count(), methods.values()),
            )
        }
    for name, (got, subset_of_exact) in methods.items():
        n_method = n_methods[name]
        n_common = (
            n_method
            if subset_of_exact
            else got.join(exact, ["id_a", "id_b"]).count()
        )
        # exact double division of exact ints — bit-identical in both
        # engines, no rounding needed (python round() is half-even,
        # DuckDB's is half-away: rounding would be the portability bug)
        reports.append(
            (
                name,
                n_exact,
                n_method,
                n_common,
                n_common / n_method if n_method else 1.0,
                n_common / n_exact if n_exact else 1.0,
            )
        )
    return spark.createDataFrame(
        reports,
        "method string, n_exact long, n_method long, n_common long, "
        "prec double, recall double",
    )


def q_dedup_eval_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-eval for the WEIGHTED dedup family: precision/recall of
    the tf-expansion MinHash scale path (weighted_minhash_pairs,
    16/8, tf_cap=8) against the exact CAPPED weighted Jaccard at the
    same threshold — apples-to-apples because both compute J_w over
    min(tf, 8) frequencies (the exact form fed a capped tf_table).
    Same report shape as dedup_eval_report; the oracle replays both
    methods' SQL as subqueries, so the report is hash-verified."""
    docs = _t(spark, sf_dir, "documents")
    # r13 (guide §2.3): both methods consume the SAME (id, s, tf)
    # relation — tokenize once, share the cached table (before: the
    # minhash path re-built its own tf table from the raw text)
    tf = scoped_cache(
        "entry.eval_weighted.tf",
        dd.shingle_tf_table(docs, "doc_id", "text", 3),
    )
    capped = tf.select(
        "id", "s", F.least(F.col("tf"), F.lit(8)).alias("tf")
    )
    exact = scoped_cache(
        "entry.eval_weighted.exact",
        dd.weighted_jaccard_pairs(
            docs, ngram=3, threshold=0.5, tf_table=capped
        ).select("id_a", "id_b"),
    )
    # r13 (guide §2.4): verify = candidates ⨝ exact (same set by
    # definition — see weighted_minhash_pairs' truth_pairs contract)
    approx = scoped_cache(
        "entry.eval_weighted.minhash",
        dd.weighted_minhash_pairs(
            docs, ngram=3, num_hashes=16, bands=8, threshold=0.5, tf_cap=8,
            tf_table=tf, truth_pairs=exact,
        ).select("id_a", "id_b"),
    )
    n_exact = exact.count()
    n_method = approx.count()
    # approx ⊆ exact BY CONSTRUCTION (truth_pairs built it as
    # candidates ⨝ exact), so the intersection count IS n_method —
    # same number, one less count job (guide §2.4)
    n_common = n_method
    return spark.createDataFrame(
        [
            (
                "weighted_minhash",
                n_exact,
                n_method,
                n_common,
                n_common / n_method if n_method else 1.0,
                n_common / n_exact if n_exact else 1.0,
            )
        ],
        "method string, n_exact long, n_method long, n_common long, "
        "prec double, recall double",
    )


def q_dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint pairs (operators/dedup.py
    winnow_fingerprints/winnow_pairs — the MOSS algorithm, SIGMOD
    2003): 5-gram hashes, window 4, rightmost-min selection packed
    into one BIGINT key; pairs sharing >= 2 selected hashes with the
    df <= 1000 stop-hash cap. Position-aware shared-passage evidence
    (guarantee: every shared run of >= 8 tokens shares a
    fingerprint), complementing the whole-doc jaccard/minhash
    families."""
    return dd.winnow_pairs(
        _t(spark, sf_dir, "documents"),
        k=5, window=4, min_shared=2, max_df=1000,
    )


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 bigram collocations by PMI (min pair count 5) — the
    multi-word-expression / tokenizer-merge-candidate table. Totally
    deterministic top-k: rounded pmi desc, then (w1, w2)."""
    return txt.pmi_collocations(
        _t(spark, sf_dir, "documents"), min_count=5, k=50
    )


def q_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL vs the corpus blend over the top-500
    vocab (add-one smoothed) — the data-mixing diagnostic."""
    return txt.source_kl_table(_t(spark, sf_dir, "documents"), top_v=500)


def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General interval×interval overlap join, grid-cell blocked:
    30-min-gap user sessions (closed epoch-second intervals) against
    global busy hours (hourly event count ≥ 1.25× the mean, i.e.
    5·Σn ≥ 4·cnt·n — exact integer arithmetic on both engines).
    Exactly-once pairing via the first-shared-cell condition, no
    BroadcastNestedLoopJoin, no distinct."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "sec", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gap = F.col("sec") - F.lag("sec").over(w)
    brk = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    grp = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        ev.withColumn("__grp", grp)
        .groupBy("user_id", "__grp")
        .agg(
            F.min("sec").alias("s_start"),
            F.max("sec").alias("s_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "s_start", "s_end", "n_events")
    )
    hours = ev.groupBy(
        F.floor(F.col("sec") / 3600).cast("long").alias("hr")
    ).agg(F.count(F.lit(1)).alias("h_n"))
    thr = hours.agg(
        (
            (F.sum("h_n") * 5).cast("double")
            / (F.count(F.lit(1)) * 4).cast("double")
        ).alias("t")
    )
    busy = (
        hours.crossJoin(F.broadcast(thr))
        .where(F.col("h_n") >= F.col("t"))
        .select(
            (F.col("hr") * 3600).alias("h_start"),
            (F.col("hr") * 3600 + 3599).alias("h_end"),
            "h_n",
        )
    )
    return iv.interval_overlap_join(
        sessions, busy, "s_start", "s_end", "h_start", "h_end", cell_width=3600
    )


def q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quantiles (p50/p95/p99 of document length by
    language) via Spark's sort-based ``percentile`` — the
    ground-truth twin of ``approx_percentile``. Exactness costs a
    per-group sort of all values; at 100 TB prefer approx_percentile
    (t-digest, map-side combinable) and keep this for oracle checks
    and small dims. Both engines define quantiles by linear
    interpolation; results are fixed-rounded to 1e-6 to absorb
    summation-order ulps."""
    docs = _t(spark, sf_dir, "documents")
    qs = F.expr("percentile(n_chars, array(0.5D, 0.95D, 0.99D))")
    out = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), qs.alias("qs")
    )
    return out.select(
        "lang",
        "n_docs",
        txt.round_fixed(F.col("qs")[0], 6).alias("p50"),
        txt.round_fixed(F.col("qs")[1], 6).alias("p95"),
        txt.round_fixed(F.col("qs")[2], 6).alias("p99"),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (exact 3-gram Jaccard >= 0.5) resolved to
    connected components: (id, cluster_id=min of component). The
    transitive-closure step the pair-emitting dedup ops stop short
    of — A~B, B~C groups A,B,C even when A~C never met a band."""
    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.5
    )
    return cl.connected_components(pairs)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id%100==0 act as the
    held-out benchmark; every other doc reports how many of its
    3-gram shingles collide with ANY benchmark shingle."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 100 != 0)
    benchmark = docs.where(F.col("doc_id") % 100 == 0)
    return dc.contamination_check(
        corpus, benchmark, ngram=3, threshold=0.1
    )


def q_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics + keep flag per document."""
    return txt.repetition_metrics_table(_t(spark, sf_dir, "documents"))


def q_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data curation pipeline in one plan:
    benchmark held out (doc_id%100==0) → Gopher repetition filter →
    n-gram decontamination against the benchmark → near-dup removal
    via df-capped exact-Jaccard pairs resolved to connected
    components (keep the smallest id per cluster) → per (lang,
    source) corpus stats.
    Composition is the point: each stage is an independently
    oracle-checked operator; this gate checks they agree end-to-end.
    The pair stage runs with max_df=1000 (the flagship regime — a hot
    boilerplate shingle must not fan out df² candidates at scale);
    the oracle replays the same cap, so the hash gate checks the
    BOUNDED plan, not the unbounded ground-truth one (which remains
    the dedup_ngram_jaccard gate's regime)."""
    # r14 note: spreading the docs scan here (guide §2.5) measured
    # 1.08x WORSE in interleaved A/B — the composition's cost sits in
    # its joins/aggregations, not the scan-side expressions, and the
    # extra exchange feeds five consumers. Operator-level spreads
    # (repetition_metrics_table) still apply internally where they
    # won; the scan stays as-is.
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 100 != 0)
    bench = docs.where(F.col("doc_id") % 100 == 0)
    # tokenize+shingle the corpus ONCE; decontam and the jaccard
    # pair stage both consume the shared cached table
    csh = scoped_cache(
        "entry.pipeline_full.shingles",
        dd.shingle_table(corpus, "doc_id", "text", 3),
    )
    rep_keep = (
        txt.repetition_metrics_table(corpus)
        .where(F.col("keep"))
        .select(F.col("id").alias("doc_id"))
    )
    not_contaminated = (
        dc.contamination_check(
            corpus, bench, ngram=3, threshold=0.1, corpus_shingles=csh
        )
        .where(~F.col("contaminated"))
        .select("doc_id")
    )
    # df-cap the shared table ONCE (VERDICT r8 #3; reworked r10):
    # cap_shingles probes the hot set eagerly and embeds it as a
    # broadcast literal, so the df aggregation runs a single time and
    # each downstream consumer replays only the map-side broadcast
    # anti-join from the cached shingle table; semantics are
    # identical to passing max_df=1000 through — the oracle replays
    # the same cap
    capped = dd.cap_shingles(csh, max_df=1000)
    pairs = dd.ngram_jaccard_pairs(
        corpus, ngram=3, threshold=0.5, shingles=capped
    )
    dupes = (
        cl.connected_components(pairs)
        .where(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias("doc_id"))
    )
    kept = (
        corpus.join(rep_keep, "doc_id")
        .join(not_contaminated, "doc_id")
        .join(dupes, "doc_id", "left_anti")
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for the vec_id%50==0 query subset."""
    return sim.ann_bruteforce_topk(_t(spark, sf_dir, "embeddings"), k=3)


def q_ann_gemm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 via per-partition BLAS matmul + local
    top-(k+slack) prune, then exact expression re-score of the tiny
    survivor set (the 100 TB exact-search layout). The re-score uses
    the same codegen expression as ``ann_bruteforce_topk``, so the
    oracle is the brute-force SQL verbatim; set-equality with the
    expression form is additionally pytest-verified
    (tests/test_similarity_extra.py::test_gemm_topk_matches_expression_form)."""
    return sim.ann_bruteforce_topk_gemm(_t(spark, sf_dir, "embeddings"), k=3)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN (the 100 TB scale path) at the
    scale-safe defaults: 60 planes / 4 bands → 15-bit band keys
    (32,768 buckets per band) with hamming-1 multi-probe on the query
    side, so the candidate join stays ∝ true near neighbours instead
    of ~n²/buckets while probing restores the recall wide bands alone
    give up. The seeded hyperplanes are plan literals, so the DuckDB
    oracle embeds the same planes as SQL literals (``_lsh_oracle``)
    and replays the signature → probed band join → exact re-rank
    pipeline; recall ≥ 0.8 on planted near-dups is additionally
    pytest-verified
    (tests/test_dedup_similarity.py::test_ann_lsh_recall)."""
    return sim.ann_lsh_topk(_t(spark, sf_dir, "embeddings"), k=3, probe_bits=1)


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INT8-quantized ANN re-rank over the probed-LSH candidates
    (operators/similarity.py ann_quantized_topk): the 4x-memory
    re-rank path for candidate joins that dominate executor memory at
    10^8+ vectors. The quantized dot is an exact integer, so the
    DuckDB oracle replays quantization + banding + integer re-rank
    bit-for-bit; recall vs the float re-rank is pytest-pinned."""
    return sim.ann_quantized_topk(
        _t(spark, sf_dir, "embeddings"), k=3, probe_bits=1
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact all-pairs form (the
    oracle-checkable ground truth; the LSH/IVF variants are the scale
    paths, recall-verified in pytest). Threshold 0.45 because the
    synthetic embeddings are i.i.d. random (max pairwise cos ~0.51)
    — high-threshold behavior is covered by pytest with planted
    near-dups."""
    return sim.embedding_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.45
    )


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via the LSH scale path
    (use_lsh=True): probed wide-band candidates (60 planes / 4 bands
    → 15-bit keys, hamming-1 multi-probe) re-scored with the exact
    round-6 cosine and thresholded — the 100 TB regime of
    embedding_dup_pairs, where the exact all-pairs form is size-gated
    out. Hash-verified: the seeded hyperplanes are plan literals, so
    the DuckDB oracle embeds the same planes and replays signature →
    probed band join → qid<nid pair re-score (the LSH candidate set
    is deterministic — no recall slack needed in the gate)."""
    return sim.embedding_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.45, use_lsh=True
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means coarse quantizer + n_probe inverted lists).
    The gate uses driver-side deterministic centroids
    (``ivf_centroids_from_parquet``) so the DuckDB oracle can embed
    the SAME centroid literals and replay assignment → probe →
    exact re-rank in SQL; the distributed ``ivf_build_centroids``
    remains the 100 TB build path and its recall vs brute force is
    pytest-verified."""
    cents = sim.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", n_centroids=8, iterations=3
    )
    return sim.ann_ivf_topk(
        _t(spark, sf_dir, "embeddings"), k=3, n_centroids=8, n_probe=3,
        centroids=cents,
    )


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, stopword/punct ratios, quality score, content
    fingerprint per document."""
    docs = _t(spark, sf_dir, "documents")
    return txt.text_metrics_table(docs).withColumnRenamed("id", "doc_id")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language guess per document."""
    docs = _t(spark, sf_dir, "documents")
    pred = txt.lang_id_table(docs).withColumnRenamed("id", "doc_id")
    return docs.select("doc_id", "lang").join(pred, "doc_id")


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: 3-way join + agg + top-10
    (deterministic tie-break on orderkey).

    Scale strategy: NO hard-coded broadcast hints — every join side
    here (customer, orders, lineitem) grows with SF, so a forced
    broadcast is an OOM at cluster scale (a hint is obeyed regardless
    of size). AQE decides at runtime: at small SF it converts the
    shuffle joins to broadcasts from actual sizes; at 100 TB it keeps
    SortMergeJoin, which the bucketed layout (sources/storage.py,
    plan-asserted in test_stateful_streaming.py::
    test_bucketed_join_has_no_shuffle) runs shuffle-free on
    l_orderkey."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    co = cust.join(orders, cust["c_custkey"] == orders["o_custkey"]).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    return (
        co.join(li, F.col("o_orderkey") == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item reporting: 4-way join (lineitem
    ⨝ orders ⨝ customer ⨝ nation) with a date-window filter + top-20
    customers by lost revenue. Same scale stance as q3/q5: no
    fact-side broadcast hints — only the fixed 25-row nation keeps
    one; AQE + the bucketed layout carry the fact joins; the date
    filter pushes to the orders scan (PushedFilters in PLANS.md)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue: 6-way star join keyed
    through region→nation→(customer, supplier)→orders→lineitem.

    Shaped so lineitem (the biggest fact) is the PROBE stream: dims
    fold into orders first, then the order→nation map joins into the
    lineitem scan. Only region⋈nation (fixed 5/25 rows) carries a
    broadcast hint; customer, orders, and lineitem all grow with SF,
    so their join strategies are left to AQE — broadcast at small
    actual sizes, SortMergeJoin at scale (shuffle-free on l_orderkey
    under the bucketed layout, sources/storage.py)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    dims = (
        F.broadcast(region.join(nation, region["r_regionkey"] == nation["n_regionkey"]))
        .join(cust, F.col("n_nationkey") == cust["c_nationkey"])
        .select("r_name", "n_name", "n_nationkey", "c_custkey")
    )
    co = (
        dims.join(orders, dims["c_custkey"] == orders["o_custkey"])
        .select("r_name", "n_name", "n_nationkey", "o_orderkey")
    )
    return (
        li.join(co, co["o_orderkey"] == li["l_orderkey"])
        .join(
            sup,
            (li["l_suppkey"] == sup["s_suppkey"])
            & (sup["s_nationkey"] == F.col("n_nationkey")),
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan + conjunctive
    filter + 1-row agg — the predicate-pushdown benchmark (every
    filter reaches the parquet scan; zero joins, zero shuffles beyond
    the 1-row partial-agg merge). Boundary comparisons are done in
    DECIMAL on both engines so float ulps can't flip a row."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(12,2)"
    disc = F.col("l_discount").cast(dec)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (disc >= F.lit("0.02").cast(dec))
            & (disc <= F.lit("0.06").cast(dec))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(dec) * disc)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: the deepest join tree in the
    suite — lineitem ⨝ part ⨝ orders ⨝ customer ⨝ nation(cust) ⨝
    region + supplier ⨝ nation(supp), two roles for the nation dim.
    Only the fixed-size nation/region dims carry broadcast hints;
    part/customer/orders/lineitem grow with SF and are left to AQE
    (broadcast at small actual size, SortMergeJoin at scale)."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    eu_cust = cust.join(
        F.broadcast(
            nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        ),
        cust["c_nationkey"] == F.col("n_nationkey"),
    ).select("c_custkey")
    ord_f = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year"))
    supn = sup.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        sup["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    j = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(ord_f, li["l_orderkey"] == ord_f["o_orderkey"])
        .join(eu_cust, ord_f["o_custkey"] == eu_cust["c_custkey"])
        .join(supn, li["l_suppkey"] == supn["s_suppkey"])
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", rev)).cast("double").alias("nation_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
        )
        .select(
            "o_year",
            (F.coalesce(F.col("nation_rev"), F.lit(0.0)) / F.col("total_rev")).alias("mkt_share"),
            "total_rev",
        )
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: lineitem ⨝ part with a conditional
    aggregate (CASE inside SUM) over one ship month — the classic
    numerator/denominator-in-one-pass pattern. Decimal sums cast to
    double only at the division."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = _t(spark, sf_dir, "part")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev)).cast("double").alias("promo_rev"),
            F.sum(rev).cast("double").alias("total_rev"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            (F.lit(100.0) * F.coalesce(F.col("promo_rev"), F.lit(0.0)) / F.col("total_rev")).alias("promo_pct"),
            "total_rev",
            "n_items",
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING over a fact groupBy
    feeding a join back to orders/customer — the aggregate-then-join
    pattern (the 300-qty filter shrinks the fact to dozens of rows
    BEFORE any join, so the joins are broadcast-cheap at every SF)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    dec = "decimal(12,2)"
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(dec)).alias("qty"))
        .where(F.col("qty") > F.lit("300").cast(dec))
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast(dec).cast("double").alias("o_totalprice"),
            F.col("qty").cast("double").alias("sum_qty"),
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted to this schema's columns:
    brand/size/quantity in place of container/shipmode): a DISJUNCTION
    of three conjunctive band predicates across both join sides — the
    stress test for OR-predicate handling (Catalyst keeps the partkey
    equi-join and evaluates the residual OR post-join rather than
    falling into a nested loop; plan-guarded)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    q = F.col("l_quantity")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 25)
            & q.between(20, 30)
        )
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .where(clause)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: revenue view → scalar max over the
    view → equi-select the achiever(s) — the aggregate-of-aggregate
    pattern where the comparison must stay in EXACT decimal (a double
    max would tie-break on ulps). The view is supplier-cardinality,
    so the max 'subquery' is a 1-row broadcast."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    sup = _t(spark, sf_dir, "supplier")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    view = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    mx = view.agg(F.max("total_rev").alias("mx"))
    return (
        view.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("mx"))
        .join(sup, F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_rev"),
        )
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand by retail price (window top-k pattern)."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


def q_annotate_multisnapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2∘J1 through the real machinery: TWO dated snapshots of the
    network table (v2 brands suffixed), an as-of join over the
    registry, and the snapshot-keyed broadcast range join — requests
    before the first snapshot take the first (fallback rule)."""
    import datetime as dt

    part = _t(spark, sf_dir, "part")
    max_pk = _max_partkey(spark, sf_dir)
    d1, d2 = dt.date(2020, 1, 1), dt.date(2020, 7, 1)

    ranges_v1 = part.select(
        (F.lit(167772160) + F.col("p_partkey") * 256).alias("low"),
        (F.lit(167772160) + F.col("p_partkey") * 256 + 255).alias("high"),
        F.col("p_brand").alias("brand"),
    ).withColumn("dataset_date", F.lit(d1))
    ranges_v2 = part.select(
        (F.lit(167772160) + F.col("p_partkey") * 256).alias("low"),
        (F.lit(167772160) + F.col("p_partkey") * 256 + 255).alias("high"),
        F.concat(F.col("p_brand"), F.lit("-v2")).alias("brand"),
    ).withColumn("dataset_date", F.lit(d2))
    ranges = ranges_v1.unionByName(ranges_v2)
    registry = spark.createDataFrame([(d1,), (d2,)], "dataset_date date")

    m_val = (max_pk + 1) * 10 // 9
    ev = _t(spark, sf_dir, "events")
    k = (F.col("user_id") * 131 + F.col("event_id") * 7919) % m_val
    probes = ev.select(
        "event_id",
        (F.lit(167772160) + k * 256 + F.col("event_id") % 256).alias("v"),
        F.when(F.col("event_id") % 3 == 0, F.lit(dt.date(2019, 6, 1)))
        .when(F.col("event_id") % 3 == 1, F.lit(dt.date(2020, 3, 1)))
        .otherwise(F.lit(dt.date(2021, 1, 1)))
        .alias("req_date"),
    )
    probed = ao.asof_join(probes, registry, probe_date="req_date")
    out = iv.range_join_broadcast(
        probed,
        ranges,
        probe_col="v",
        low="low",
        high="high",
        payload=["brand"],
        how="left",
        keys=["dataset_date"],
    )
    return out.select(
        "event_id",
        "req_date",
        "dataset_date",
        F.coalesce(F.col("brand"), F.lit("MISSING")).alias("brand"),
    )


_LEGACY_FIXTURE_PATH = "/tmp/asvc_legacy_fixture.dat"


def _v4_long(c):
    # canonical 16-byte v4-mapped bytes → host-order long (last 4 bytes)
    return F.conv(F.substring(F.hex(c), 25, 8), 16, 10).cast("long")


def q_legacy_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 end-to-end: deterministic city-edition .dat fixture →
    binaryFile + mapInPandas binary parse (sources/legacy_dat.py) →
    v4 ranges → event-derived probes → broadcast range join. The
    binary parser itself is pytest-validated against the reference's
    own binary fixture (legacy/testdata/GeoIPv6.dat, geoip_test.go
    expectations); this gate verifies the distributed pipeline around
    it, with the oracle embedding the converted ranges as literals."""
    from annotation_service_spark.sources import legacy_dat as ld

    path = ld.ensure_demo_fixture(_LEGACY_FIXTURE_PATH)
    recs = ld.legacy_dat_table(spark, path)
    ranges = recs.select(
        _v4_long(F.col("ip_low")).alias("low"),
        _v4_long(F.col("ip_high")).alias("high"),
        "country_code", "city", "metro_code", "area_code",
    )
    ev = _t(spark, sf_dir, "events")
    k = F.col("user_id") * 131 + F.col("event_id") * 7919
    v = (
        F.when(F.col("event_id") % 4 == 0,
               F.lit(207 * 2**24 + 171 * 2**16) + k % 65536)
        .when(F.col("event_id") % 4 == 1, F.lit(10 * 2**24) + k % (1 << 24))
        .when(F.col("event_id") % 4 == 2,
              F.lit(192 * 2**24 + 2 * 2**8) + k % 256)
        .otherwise(F.lit(8 * 2**24) + k % 65536)  # guaranteed miss
    )
    probes = ev.select("event_id", v.cast("long").alias("v"))
    out = iv.range_join_broadcast(
        probes, ranges, probe_col="v", low="low", high="high",
        payload=["country_code", "city", "metro_code", "area_code"], how="left",
    )
    return out.select(
        "event_id",
        "v",
        F.coalesce("country_code", F.lit("MISS")).alias("country_code"),
        F.coalesce("city", F.lit("")).alias("city"),
        F.coalesce(F.col("metro_code"), F.lit(-1)).cast("long").alias("metro_code"),
        F.coalesce(F.col("area_code"), F.lit(-1)).cast("long").alias("area_code"),
    )


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation composite: text metrics → quality filter →
    exact-dedup keep-list → language partition → per (lang, source)
    corpus stats. The shape of a real training-data curation job."""
    docs = _t(spark, sf_dir, "documents")
    metrics = txt.text_metrics_table(docs).withColumnRenamed("id", "doc_id")
    langs = txt.lang_id_table(docs).withColumnRenamed("id", "doc_id")
    keep = dd.dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    q4 = F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")
    curated = (
        docs.join(keep, "doc_id")
        .join(metrics, "doc_id")
        .join(langs, "doc_id")
        .where(F.col("quality") >= 0.55)
        .select("doc_id", "source", "pred_lang", q4.alias("q4"), "n_tokens")
    )
    return curated.groupBy("pred_lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("q4") / F.count(F.lit(1)) / 10000.0).alias("avg_quality"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens) with the engine's standard word
    tokenization (same rule the text metrics / dedup family uses)."""
    n_tok = F.size(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
    )
    return docs.select("doc_id", "source", n_tok.cast("int").alias("n_tokens"))


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sample packing map: documents laid end-to-end per
    source shard, cut into 512-token blocks; each doc → its block
    span. Window cumsum, no UDF — the packing layout a pretraining
    writer consumes."""
    docs = _t(spark, sf_dir, "documents")
    return cu.concat_chunk_map(
        _doc_tokens(docs), block_size=512, partition_by=["source"]
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold stratified sampling (training-mix
    weighting): per-source keep rates, md5 coin — reproducible across
    engines/runs."""
    docs = _t(spark, sf_dir, "documents")
    kept = cu.stratified_sample(
        docs,
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
        salt="mix1",
    )
    return kept.select("doc_id", "source")


def q_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation under worst-case key skew: all
    events collapse onto 5 keys; the partial phase runs on
    (key, salt) so no single reducer owns a hot key's full state."""
    from annotation_service_spark.operators import skew as sk

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 5).alias("k"),
        F.floor(F.col("value") * 1000).cast("long").alias("v"),
    )
    return sk.two_phase_agg(
        ev,
        ["k"],
        {
            "n": (F.count, F.sum, None),  # COUNT(*) row-count parity
            "total": (F.sum, F.sum, "v"),
            "mx": (F.max, F.max, "v"),
        },
        n_salts=8,
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over documents with deterministic PLANTED PII
    (synthetic docs carry none): each doc gains an email, a phone,
    and an IPv4 literal derived from doc_id; the redactor must find
    and replace all of them plus anything already present."""
    docs = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com"),
        F.lit(" tel 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-1234 host 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    out = docs.select("doc_id", txt.redact_pii(planted).alias("r"))
    return out.select(
        "doc_id",
        F.col("r.n_emails").alias("n_emails"),
        F.col("r.n_phones").alias("n_phones"),
        F.col("r.n_ips").alias("n_ips"),
        F.md5(F.col("r.redacted")).alias("redacted_md5"),
    )


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted equi-join (operators/skew.py): every event
    lands on one of FIVE hot region keys — the worst-case shuffle
    skew — and the dim joins without a broadcast hint: the
    deterministic salt spreads each hot key over 8 reducers."""
    from annotation_service_spark.operators import skew as sk

    ev = _t(spark, sf_dir, "events")
    big = ev.select("event_id", (F.col("user_id") % 5).alias("rkey"))
    region = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("rkey"), "r_name"
    )
    return sk.salted_join(big, region, ["rkey"], n_salts=8)


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing end-to-end: documents wrapped as
    opaque binary media + typed metadata, Arrow-batched mapInPandas
    decode/featurize (codec stubbed deterministically), video-style
    frame sampling, and aspect-preserving resize planning — one
    summary row per media blob. The decode stage is the real
    mapInPandas path; only the byte→pixels codec is a stub."""
    from annotation_service_spark.operators import multimodal as mm

    docs = _t(spark, sf_dir, "documents")
    media = mm.documents_as_fake_media(docs)
    feats = mm.extract_features(media, feature_dim=16)
    frames = (
        mm.sample_frames(media, every_n=2)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n_sampled_frames"))
    )
    resized = mm.resize_meta(media, max_side=32).select(
        "media_id",
        F.col("resize_target.width").cast("long").alias("resize_w"),
        F.col("resize_target.height").cast("long").alias("resize_h"),
    )
    return (
        feats.select(
            "media_id",
            "n_bytes",
            F.size("features").cast("long").alias("feat_dim"),
        )
        .join(frames, "media_id")
        .join(resized, "media_id")
    )


def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-wins merge (the Delta MERGE / merge-on-read
    analog): a base snapshot plus two change batches collapse to the
    newest version per key — union + one per-key window, shuffle
    keyed by the (uniform) primary key. Change batches are derived
    deterministically from the customer table: batch 1 retags every
    3rd customer's segment, batch 2 re-retags every 9th (so later
    versions must win twice)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = cust.select(
        "c_custkey", "c_mktsegment", F.lit(0).alias("seq")
    )
    b1 = cust.where(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("B1_"), F.col("c_mktsegment")).alias("c_mktsegment"),
        F.lit(1).alias("seq"),
    )
    b2 = cust.where(F.col("c_custkey") % 9 == 0).select(
        "c_custkey",
        F.concat(F.lit("B2_"), F.col("c_mktsegment")).alias("c_mktsegment"),
        F.lit(2).alias("seq"),
    )
    all_v = base.unionByName(b1).unionByName(b2)
    w = Window.partitionBy("c_custkey").orderBy(F.desc("seq"))
    return (
        all_v.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("c_custkey", "c_mktsegment", F.col("seq").cast("long").alias("seq"))
    )


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase: cumulative user counts
    where step k only counts events strictly after the user's
    earliest step-k-1 time (the standard product-analytics funnel,
    per-user earliest qualifying progression)."""
    from annotation_service_spark.operators import funnel as fu

    return fu.funnel_counts(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users by first-seen week × distinct
    active week offsets."""
    from annotation_service_spark.operators import funnel as fu

    return fu.cohort_retention(_t(spark, sf_dir, "events"))


def q_event_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup lattice: counts + fixed-point sums by
    (event_type, hour-of-day) with ROLLUP subtotals and a grouping id
    distinguishing aggregation levels — one pass computes all levels
    via Spark's partial-agg expansion (same at 100 TB: the lattice
    multiplies partials, not input rows)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        "value",
    )
    return (
        ev.rollup("event_type", "hod")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long"))
            .cast("long")
            .alias("sum_v_milli"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


def q_doc_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile rank of every document's length within its
    language (percent_rank window) — the bucketing signal quantile
    mixing consumes, exact rank arithmetic so no float drift.
    Parallelism follows the partition keys (languages)."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        txt.round_fixed(F.percent_rank().over(w), 6).alias("pr"),
    )


def q_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling mean over the last 4 events (ROWS frame,
    deterministic (ts, event_id) ordering) — the moving-average
    time-series primitive; 1e-6 rounding absorbs any frame-sum
    reassociation."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        txt.round_fixed(F.avg("value").over(w), 6).alias("roll_avg"),
    )


def q_quality_quantile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-bucketed mixing: docs at or above their language's
    p25 length keep rate 1.0; the bottom quartile is thinned to 20%
    by the deterministic md5 coin — the 'downweight the worst bucket'
    recipe. Thresholds are 1e-6-rounded on BOTH engines so the
    percentile interpolation's ulp differences cannot flip a
    boundary comparison."""
    docs = _t(spark, sf_dir, "documents")
    thr = docs.groupBy("lang").agg(
        txt.round_fixed(F.expr("percentile(n_chars, 0.25D)"), 6).alias("thr")
    )
    kept = docs.join(F.broadcast(thr), "lang").where(
        (F.col("n_chars") >= F.col("thr"))
        | (cu.sample_hash(F.col("doc_id"), "qmix") < 2000)
    )
    return kept.select("doc_id", "lang")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup eviction: clusters from exact 3-gram
    Jaccard pairs, keep the LONGEST document per cluster (n_chars,
    ties to smallest id) instead of the smallest id — the eviction
    policy real curation uses (keep the best representative, drop
    the rest). One extra broadcast-sized join + per-cluster rank on
    top of the oracle-checked clustering."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, ngram=3, threshold=0.5)
    comp = cl.connected_components(pairs)
    j = comp.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("id")
    )
    return j.withColumn("rk", F.row_number().over(w)).select(
        "id", "cluster_id", (F.col("rk") == 1).alias("keep")
    )


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup signal (Lee et al. 2022): per doc,
    the fraction of tokens covered by an 8-token span occurring at
    least twice anywhere in the corpus — catches repeated boilerplate
    inside otherwise-unique documents that doc-level dedup misses."""
    return dd.duplicate_span_coverage(
        _t(spark, sf_dir, "documents"), k=8
    ).withColumnRenamed("id", "doc_id")


def q_span_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of span dedup: cut every duplicated 8-token
    span out of the normalized corpus text (Lee et al. 2022 remove
    spans, not documents). Emits the cleaned text itself so the
    oracle compares reconstruction byte-for-byte."""
    return dd.remove_duplicate_spans(
        _t(spark, sf_dir, "documents"), k=8
    ).withColumnRenamed("id", "doc_id")


def q_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal shared token runs between document pairs with
    positions (ExactSubstr evidence, Lee et al. 2022): k=8 anchor
    grams, max_df=1000 stop-gram cap (the production path — the
    oracle replicates the cap), default min run 2k-1=15 tokens.
    Output (id_a, id_b, start_a, start_b, length), the dot-plot
    diagonal islands as rows."""
    return dd.shared_passages(
        _t(spark, sf_dir, "documents"), k=8, max_df=1000
    ).orderBy("id_a", "id_b", "start_a")


def q_span_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first span dedup (the literal Lee et al. 'all but one'
    semantics): each duplicated 8-token passage keeps exactly its
    first corpus occurrence in (id, pos) order; every other
    occurrence is cut. Compare span_dedup_apply, which cuts them
    all."""
    return dd.remove_duplicate_spans_keep_first(
        _t(spark, sf_dir, "documents"), k=8
    ).withColumnRenamed("id", "doc_id")


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup: docs with doc_id%3==0 are the
    already-seen corpus (their hashes the state table); the incoming
    batch is every other doc PLUS re-submissions of seen docs (id
    offset +2000000) and an in-batch duplicate pair (+1000000).
    Survivors = fresh content, smallest id per batch-dup group."""
    docs = _t(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 3 == 0).select(
        F.md5(F.col("text")).alias("content_hash")
    )
    incoming = (
        docs.where(F.col("doc_id") % 3 != 0)
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
    )
    return dd.incremental_dedup(incoming, seen)


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) source rebalancing: per-stratum keep
    rate sqrt(n_min/n_s) with the deterministic md5 coin — the
    smallest stratum keeps all rows, larger strata thin toward the
    p^0.5 mix. Rates derive from the data in one tiny groupBy. The
    testdata sources are deliberately uniform, so the gate derives a
    60/30/10 skewed stratum from doc_id to exercise the rates."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "stratum",
        F.when(F.col("doc_id") % 10 < 6, "big")
        .when(F.col("doc_id") % 10 < 9, "mid")
        .otherwise("small"),
    )
    return cu.temperature_mix(
        docs, alpha=0.5, stratum_col="stratum", salt="temp1"
    ).select("doc_id", "stratum")


def q_event_topk_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window heavy hitters: top-3 event types per 6-hour
    tumbling window by count (ties broken by type asc) — the
    rollup × rank composition a monitoring pipeline runs. The rank
    window partitions by the time bucket, so parallelism follows
    the buckets, not a global sort."""
    from annotation_service_spark.operators import rollup as ru

    counts = ru.tumbling_rollup(
        _t(spark, sf_dir, "events"),
        window_width="6 hours",
        dims=("event_type",),
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "window_start",
            "event_type",
            "n_events",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch vs exact term counts: build a 4x1024 md5-
    seeded sketch over the corpus tokens, estimate every distinct
    token, and emit (token, cnt, est). The sketch is deterministic
    (seeded md5), so est is exactly reproducible — the oracle
    recomputes identical cells, and est >= cnt by construction."""
    from annotation_service_spark.operators import sketch as sk

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(dd.tokens(F.col("text"))).alias("token"))
    # r13 (guide §2.3 "aggregate before you shuffle"): the corpus is
    # tokenized ONCE into the exact (token, cnt) vocabulary relation;
    # the sketch is then built from it WEIGHTED (cell = Σ cnt — the
    # occurrence count by definition) and the estimate probes the
    # same tiny cached vocab, instead of all three legs re-running
    # the regex tokenize over the corpus. (Caching the raw token
    # explode instead was measured 1.28x WORSE cold — a corpus-sized
    # cache write costs more than the scans it saves.)
    exact = scoped_cache(
        "entry.cms_counts.exact",
        tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("cnt")),
    )
    sketch = sk.count_min_build(
        exact, "token", depth=4, width=1024, weight_col="cnt"
    )
    est = sk.count_min_estimate(sketch, exact, "token", depth=4, width=1024)
    return exact.join(est, "token")


def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity-bucket signal: per-doc mean -log2
    p(token) under the corpus's own unigram distribution (vocab agg +
    token equi-join + per-doc mean; 1e-6 rounding absorbs log2 ulps)."""
    return txt.unigram_nll_table(
        _t(spark, sf_dir, "documents")
    ).withColumnRenamed("id", "doc_id")


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary heavy hitters: top-100 tokens by total count
    with document frequency (the IDF/stopword-discovery table). Total
    deterministic order (cnt desc, token asc) makes top-k unique."""
    return txt.vocab_topk(_t(spark, sf_dir, "documents"), k=100)


def q_event_rollup_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup (1h windows sliding every 30min): each
    event expands into exactly 2 overlapping windows. Same
    fixed-point exact sums as the tumbling gate."""
    from annotation_service_spark.operators import rollup as ru

    return ru.hopping_rollup(
        _t(spark, sf_dir, "events"),
        window_width="1 hour",
        slide="30 minutes",
        dims=("event_type",),
    )


def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix of the embedding corpus in exact
    int64 fixed point: per-partition numpy GEMM partials, only d×d
    sufficient statistics shuffle (the normal-equations trick). The
    fixed-point quantization makes the distributed sum associative-
    exact, hence bit-checkable against the DuckDB oracle."""
    from annotation_service_spark.operators import linalg as la

    emb = _t(spark, sf_dir, "embeddings")
    return la.gram_fixed(emb)


def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts per event type — the ground-truth
    twin of ``approx_count_distinct`` (HLL++). Exact distinct is a
    two-level shuffle (dedup on (type, user), then count); the HLL
    sketch path is single-shuffle map-side-combinable and is
    error-bound-tested against this in tests/test_sketches.py — at
    100 TB prefer the sketch, keep this as the oracle."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def q_scd_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 as-of attachment at dimension scale: a per-user DAILY
    version table (first event of each day opens a version whose tier
    derives from user and day) is attached to every event via the
    union+window as-of join — no broadcast, one shuffle keyed by
    user_id. Oracle: DuckDB's native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    versions = (
        ev.groupBy(F.col("user_id"), day.alias("d"))
        .agg(F.min("ts").alias("vts"))
        .select(
            "user_id",
            "vts",
            (
                (F.col("user_id") + F.floor(F.unix_timestamp("d") / 86400))
                % 4
            ).cast("long").alias("tier"),
        )
    )
    probes = ev.select("event_id", "user_id", "ts")
    out = ao.asof_join_union(
        probes,
        versions,
        probe_ts="ts",
        version_ts="vts",
        payload=["tier"],
        partition_by=["user_id"],
        inclusive=True,
    )
    return out.select("event_id", "user_id", "tier")


def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup of the event stream per event_type —
    the batch twin of the streaming windowed aggregation. Value sums
    are fixed-point BIGINT so the distributed reduction is
    associative-exact."""
    from annotation_service_spark.operators import rollup as ru

    return ru.tumbling_rollup(
        _t(spark, sf_dir, "events"),
        window_width="1 hour",
        dims=("event_type",),
    )


def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the exact-match search/decontamination
    support structure): token → sorted distinct posting list +
    document frequency, for tokens appearing in ≥5 documents. The
    explode→distinct→collect shuffle is keyed by token (zipfian, but
    the df≥5 posting arrays are bounded by the doc-frequency cut the
    query itself applies). The posting list is emitted as a canonical
    comma-joined string (numeric sort, then cast) so the result is a
    flat scalar column — hashable by any downstream comparator."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(dd.tokens(F.col("text"))).alias("token")
        )
        .distinct()
        .groupBy("token")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
            F.count(F.lit(1)).alias("df"),
        )
        .where(F.col("df") >= 5)
    )


def q_tfidf_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse all-pairs tf-idf cosine over 3-gram shingles
    (operators/ranking.py tfidf_shingle_pairs): near-dup detection
    without embeddings via a df-pruned posting-list self-join — the
    Bayardo all-pairs-similarity shape. Every shuffle keys on shingle
    strings or doc ids; max_df bounds the worst-case candidate count."""
    from annotation_service_spark.operators.ranking import tfidf_shingle_pairs

    return tfidf_shingle_pairs(
        _t(spark, sf_dir, "documents"), n=3, max_df=1000, min_sim=0.5
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunk index with overlap (chunk_size=200,
    overlap=50 over n_chars): the RAG/pretraining chunker's span map
    (operators/curation.py chunk_spans) — pure sequence+explode row
    expressions, integer span math on both engines."""
    return cu.chunk_spans(
        _t(spark, sf_dir, "documents"), chunk_size=200, overlap=50
    )


def q_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram NLL with Laplace smoothing under the corpus's
    own bigram counts (functions/text.py bigram_nll_table) — the
    sequence-aware perplexity filter signal."""
    return txt.bigram_nll_table(
        _t(spark, sf_dir, "documents")
    ).withColumnRenamed("id", "doc_id")


def q_linear_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-grid LINEAR interpolation between surrounding
    observations (operators/timeseries.py linear_interp_daily) — the
    continuous-signal resampler next to gap_fill's LOCF step fill.
    Same 4-op IEEE double sequence on both engines + 1e-6 rounding."""
    from annotation_service_spark.operators.timeseries import (
        linear_interp_daily,
    )

    return linear_interp_daily(_t(spark, sf_dir, "events"))


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch attribution per user via the min_by/max_by
    ARGMIN aggregate class (no window, no self-join — one map-side-
    combinable groupBy carrying (key, value) pairs). Deterministic
    because (user_id, ts) is unique in the corpus; ordering key is
    exact integer microseconds."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.groupBy("user_id").agg(
        F.min_by("event_type", us).alias("first_touch"),
        F.max_by("event_type", us).alias("last_touch"),
        F.min(us).alias("first_us"),
        F.max(us).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate class: per event type, sample stddev /
    covariance / Pearson correlation of value vs hour-of-day — the
    profiling moments a feature pipeline computes. All are single-pass
    map-side-combinable moment sums; 1e-6 rounding absorbs sum-order
    ulps."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("v"),
        F.hour("ts").cast("double").alias("h"),
    )
    return ev.groupBy("event_type").agg(
        txt.round_fixed(F.stddev_samp("v"), 6).alias("sd_v"),
        txt.round_fixed(F.covar_samp("v", "h"), 6).alias("cov_vh"),
        txt.round_fixed(F.corr("v", "h"), 6).alias("corr_vh"),
        F.count(F.lit(1)).alias("n"),
    )


def q_session_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE session windows (F.session_window, 30-min gap) — the
    Structured-Streaming-capable sessionizer (same operator runs on a
    stream with watermarked state; tests/test_streaming_extra.py pins
    streaming==batch). Spark defines session end = last event + gap;
    the oracle replays that with gaps-and-islands SQL — two different
    algorithms, same rows."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window(F.col("ts").cast("timestamp"), "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("sum_v_milli"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_v_milli",
        )
    )


def q_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile assignment per language (NTILE window)
    — the quantile-bucketizer used for curriculum/mixture binning.
    Standard SQL ntile semantics (first buckets take the remainder);
    (n_chars, doc_id) ordering makes ties deterministic."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (Levenshtein — the record-linkage
    primitive): distance between each doc's 40-char prefix and the
    NEXT doc's within the same source (lead window — one shuffle keyed
    by source). JVM levenshtein on both engines."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.substring("text", 1, 40).alias("head")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("next_head", F.lead("head").over(w))
        .where(F.col("next_head").isNotNull())
        .select(
            "doc_id",
            "source",
            F.levenshtein("head", "next_head").cast("long").alias("edit_dist"),
            (
                F.levenshtein("head", "next_head")
                <= F.greatest(F.length("head"), F.length("next_head")) * 0.3
            ).alias("is_fuzzy_match"),
        )
    )


def q_mom_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue deltas: rollup to months, then lag
    arithmetic over the AGGREGATED series (the BI trend pattern —
    the window runs on month-cardinality rows, not the fact table).
    Decimal sums; delta in exact decimal, pct rounded 1e-6."""
    orders = _t(spark, sf_dir, "orders")
    dec = "decimal(14,2)"
    monthly = (
        orders.groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast(dec)).alias("rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return monthly.select(
        "month",
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        (F.col("rev") - prev).cast("double").alias("mom_delta"),
        txt.round_fixed(
            (F.col("rev") - prev).cast("double") / prev.cast("double"), 6
        ).alias("mom_pct"),
    )


def q_price_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() vs dense_rank() tie semantics per brand on retail price
    (ties are real in the data): gap-ranking and dense-ranking are
    pinned against each other and the oracle — the remaining window
    ranking class next to row_number (topk_per_group) and ntile."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
    ).where(F.col("price_rank") <= 5)


def q_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE relational PIVOT (df.groupBy().pivot(values=...)) —
    long→wide event counts/sums per user-day across event types. The
    explicit values list keeps it single-pass (no distinct-values
    pre-scan) and schema-stable at any scale; complements the manual
    CASE pivot (case_pivot) and UNPIVOT (unpivot_measures) gates."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
            F.floor(F.col("value") * 1000).cast("long").alias("v_milli"),
        )
        .groupBy("user_id", "day")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_milli").alias("v"),
        )
    )


def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semijoin reduction (operators/sketch.py
    bloom_build/bloom_might_contain): the probe side (lineitem) is
    prefiltered by a 2^17-bit / 5-hash bloom of the urgent orders'
    keys BEFORE the join shuffle — the runtime-filtering optimization
    for builds too big to broadcast as hash tables. The ORACLE IS THE
    PLAIN JOIN: the gate hashes green iff the reduction is
    result-preserving (a bloom admits false positives — dropped again
    by the join — but never false negatives)."""
    from annotation_service_spark.operators import sketch as sk

    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    bloom = sk.bloom_build(orders, "o_orderkey", n_bits=1 << 17)
    pref = sk.bloom_might_contain(li, "l_orderkey", bloom, n_bits=1 << 17)
    return pref.join(orders, pref["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderdate",
        F.col("l_quantity").cast("long").alias("quantity"),
    )


def q_knn_pagerank_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE composition of knn_pagerank: edges built via the
    collect-free banded-LSH self-join (knn_edges(method="lsh") —
    the corpus is never materialized on the driver), PageRank over
    them. Runs the scale-safe band regime (60 planes / 4 bands →
    15-bit keys) so the benchmarked composition is the one you'd run
    at 100 TB, not the exhaustive narrow-band oracle regime. The
    oracle independently replays the LSH bands, the cosine re-rank,
    AND the integer recurrence (_pagerank_lsh_oracle) — so the 100 TB
    path carries the same hash-green evidence as the GEMM oracle
    regime."""
    from annotation_service_spark.operators.graph import knn_pagerank

    return knn_pagerank(
        _t(spark, sf_dir, "embeddings"),
        k=3,
        iterations=3,
        method="lsh",
        n_planes=60,
        bands=4,
        probe_bits=1,
    )


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_orderkey, l_partkey)
    — the multi-column data-skipping layout (sources/storage.py
    zorder_layout): min/max-normalize each key to 16 bits (1-row
    stats broadcast) and bit-interleave JVM-side; the write pass
    range-partitions + sorts by z_key so min/max file stats prune on
    EITHER column. The oracle replays the identical integer bit
    arithmetic."""
    from annotation_service_spark.sources.storage import zorder_layout

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    return zorder_layout(li, "l_orderkey", "l_partkey", bits=16)


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-then-prune) over the embeddings corpus:
    exact-int64 k-means assignment (k=8, 2 iterations) + within-
    cluster quantized-cosine ≥ 17/20 prune keeping the smallest id.
    Every arithmetic step is integer-exact or the established
    round-parity double op, so the whole composition hash-checks."""
    return sim.semantic_dedup(
        _t(spark, sf_dir, "embeddings"), k=8, iterations=2,
        thr_num=17, thr_den=20,
    )


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the exact 3-gram-Jaccard ≥ 0.3
    near-dup graph — the clustering-coefficient primitive on the same
    edge relation dedup_clusters consumes. Ordered two-join
    enumeration (a<b<c found exactly once), equi-joins only."""
    from annotation_service_spark.operators.graph import triangle_counts

    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.3
    )
    return triangle_counts(pairs)


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (event_type → next event_type) the count and
    conditional probability P(next|cur). The sequence-mining shape
    behind funnels/attribution, reduced to builtins: one lead()
    window keyed by user (single shuffle), one map-side-combinable
    pair count, one broadcast-sized row-marginal join. Output is at
    most |types|² rows regardless of corpus size."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .where(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    marg = pairs.groupBy("cur").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(marg), "cur").select(
        "cur",
        "nxt",
        F.col("n").cast("long").alias("n"),
        txt.round_fixed(
            F.col("n").cast("double") / F.col("row_n").cast("double"), 6
        ).alias("p"),
    )


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type robust outlier flagging via the modified
    z-score 0.6745·(v−median)/MAD (Iglewicz–Hoaglin), |z| > 3.5.
    Median and MAD are EXACT here (the oracle regime — both engines
    interpolate the even-count midpoint identically); at 100 TB swap
    the two exact medians for approx_percentile (t-digest, map-side
    combinable) — the downstream join/filter shape is unchanged.
    Two passes over events, both keyed by the low-cardinality type
    (broadcast joins), nothing single-partition."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5D)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(abs(value - med), 0.5D)").alias("mad")
    )
    z = (
        F.lit(0.6745)
        * (F.col("value") - F.col("med"))
        / F.col("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            txt.round_fixed(z, 6).alias("z"),
        )
        .where(F.abs(F.col("z")) > 3.5)
    )


def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + defaulted lag per language — the remaining window
    primitives next to rank/dense_rank/ntile/percent_rank/lead: the
    cumulative distribution is tie-stable (peers share a value), and
    lag(, 2, -1) pins the offset+default semantics."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        txt.round_fixed(F.cume_dist().over(w), 6).alias("cd"),
        F.lag("n_chars", 2, -1).over(w).cast("long").alias("lag2"),
    )


def q_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with IGNORE NULLS — the forward-fill /
    first-observation window shape the timeseries operators use
    internally (operators/timeseries.py, operators/asof.py:109) but
    never separately gated. ``value`` is masked NULL on error events
    (deterministic on both engines), then per user ordered by
    (ts, event_id): ``ffill`` = last non-null value so far (running
    forward-fill), ``first_v`` = first non-null value in the whole
    user history. One shuffle on user_id serves both frames."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(run).alias("ffill"),
        F.first("v", ignorenulls=True).over(full).alias("first_v"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary (non-hierarchical) GROUPING SETS lattice:
    (type×dow), (type), (dow) — the aggregation-lattice class beyond
    event_cube's ROLLUP. One pass, partial aggs expand per set;
    grouping_id disambiguates levels. isodow (1=Mon) is used because
    Spark's dayofweek and DuckDB's dow disagree on week origin."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.weekday("ts") + 1).cast("long").alias("dow"), "value"
    )
    return ev.groupingSets(
        [["event_type", "dow"], ["event_type"], ["dow"]],
        "event_type",
        "dow",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("long"))
        .cast("long")
        .alias("sum_v_milli"),
        F.grouping_id().cast("long").alias("gid"),
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py): daily
    grid per user over the corpus span, latest observation per day
    forward-filled in exact fixed point. The DuckDB oracle uses a
    native ASOF JOIN — a different algorithm reaching the same rows,
    the strongest kind of cross-engine check."""
    from annotation_service_spark.operators.timeseries import gap_fill_daily

    return gap_fill_daily(_t(spark, sf_dir, "events"))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the events.props JSON column
    with a TYPED from_json (schema'd JVM parse, not per-row string
    plucking) and aggregate the extracted field per event type.
    Integer sums are engine-exact; n_missing counts rows whose JSON
    lacks the key (NULL after parse)."""
    ev = _t(spark, sf_dir, "events")
    k = F.from_json("props", "k long")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k").isNull().cast("long")).alias("n_missing"),
        )
    )


def q_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join (view→click attribution within 30
    minutes per user) — the batch twin of the stream-stream join in
    streaming/joins.py; the streaming form is proven equal on a
    replayed file stream in tests/test_stream_join.py. delay_us is
    exact integer microseconds."""
    from annotation_service_spark.streaming.joins import attribution_join

    ev = _t(spark, sf_dir, "events")
    imps = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("imp_id"), F.col("ts").alias("imp_ts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = attribution_join(
        imps,
        clicks.withColumnRenamed("c_user", "user_id"),
        horizon="30 minutes",
    )
    return out


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of the orders table (nulls,
    exact cardinality, min/max) — the ingest data-quality sweep
    (operators/profile.py). Every statistic map-side combines to one
    row per partition before a 1-row shuffle."""
    from annotation_service_spark.operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "orders"))


def q_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx twin of ``profile_table`` (VERDICT r3 #7): HLL-sketch
    cardinalities (approx_count_distinct — no Expand duplication of
    the scan, the wide-table/100 TB profile form) verified against the
    exact distinct counts through a tolerance column. The gate hashes
    green iff every estimate sits inside a generous HLL error envelope
    (3x the default 5% rsd, +10 absolute for small columns); the exact
    stats (nulls/min/max/nd_exact) hash as real values."""
    from annotation_service_spark.operators.profile import profile_table

    orders = _t(spark, sf_dir, "orders")
    # r13 measurement note (guide §1.1): folding the HLL estimates
    # into the exact pass (one aggregation, no join) was tried and
    # MEASURED ~2x SLOWER (interleaved A/B at sf0.1: cold ~4.6 ->
    # ~9.1 s) — the combined multi-countDistinct Expand plus 9 extra
    # HLL ImperativeAggregate buffers costs more than the cheap
    # Expand-free approx pass plus a 9-row column_name join. The
    # two-pass + tiny-join form stays deliberately.
    ap = profile_table(orders, approx=True).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "min_value",
        "max_value",
        F.col("n_distinct").alias("nd_approx"),
    )
    ex = profile_table(orders).select(
        "column_name", F.col("n_distinct").alias("nd_exact")
    )
    return ap.join(ex, "column_name").select(
        "column_name",
        "n_rows",
        "n_nulls",
        "min_value",
        "max_value",
        "nd_exact",
        (
            F.abs(F.col("nd_approx") - F.col("nd_exact"))
            <= F.col("nd_exact") * 0.15 + 10
        ).alias("distinct_ok"),
    )


def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-percentile scale form (VERDICT r3 #7): GK-sketch
    percentiles (accuracy=1000 ⇒ rank error ≤ n/1000) of event values
    per type, verified by the EXACT rank-bound definition: for each
    estimate v of percentile p over n non-null values,
    count(value ≤ v) ≥ ⌊(p−ε)n⌋ and count(value < v) ≤ ⌈(p+ε)n⌉.
    The booleans + exact group counts are what the oracle hashes —
    tolerance-style evidence for an estimator DuckDB can't replay."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    acc = 1000
    ps = [0.5, 0.95]
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", ps, acc).alias("vs"),
        F.count("value").alias("n"),
    )
    pv = agg.select(
        "event_type",
        "n",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(p) for p in ps]).alias("p"),
                F.col("vs").alias("v"),
            )
        ).alias("z"),
    ).select(
        "event_type", "n", F.col("z.p").alias("p"), F.col("z.v").alias("v")
    )
    j = (
        ev.join(F.broadcast(pv), "event_type")
        .groupBy("event_type", "p", "n", "v")
        .agg(
            F.sum((F.col("value") <= F.col("v")).cast("long")).alias("le"),
            F.sum((F.col("value") < F.col("v")).cast("long")).alias("lt"),
        )
    )
    eps = 1.5 / acc
    ok = (F.col("le") >= F.floor((F.col("p") - eps) * F.col("n"))) & (
        F.col("lt") <= F.ceil((F.col("p") + eps) * F.col("n"))
    )
    return j.select("event_type", "p", "n", ok.alias("rank_ok"))


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC + whitespace canonicalization digest per document
    (functions/text.py normalize_text_table): one Arrow-batched NFC
    pass, everything else JVM expressions; md5 pins the exact
    normalized bytes against utf8proc's NFC in DuckDB."""
    return txt.normalize_text_table(
        _t(spark, sf_dir, "documents")
    ).withColumnRenamed("id", "doc_id")


def q_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed fixed-point Lloyd k-means (2 iterations, k=8) over
    the embeddings corpus — the iterative-ML operator class. All
    arithmetic is exact int64 (operators/clustering.py), so the
    distributed result is bit-identical to the sequential numpy
    replica whose FINAL centroids the oracle embeds as literals; the
    gate then checks cluster sizes, exact inertia, and centroid
    checksums — pinning both the iteration trajectory and the final
    assignment."""
    return cl.kmeans_fixed(
        _t(spark, sf_dir, "embeddings"), k=8, iterations=2
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style correlated semi join (TPC-H Q4 shape): orders with
    at least one lineitem shipped >60 days after the order date,
    counted per priority. SURVEY §2.3 notes the reference has no
    semi/anti joins — this adds the class.

    Scale strategy: LEFT SEMI short-circuits on first probe match, so
    the lineitem side is never materialized per-order (no dedup
    shuffle). The equi-key is l_orderkey, which the bucketed layout
    (sources/storage.py) co-locates — at 100 TB this is a
    shuffle-free SMJ-semi; the >60-day predicate rides the join as a
    residual condition."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti join + scalar subquery (TPC-H Q22 shape):
    above-average-balance customers with no urgent order, by segment.

    The global average is compared WITHOUT division — cross-multiplied
    as decimal ``c_acctbal * n_total > sum_total`` so both engines do
    exact integer-scaled arithmetic (decimal division would round
    differently at the ulp). The 2-row scalar aggregate is broadcast;
    the anti join probes orders on o_custkey (uniform key, AQE
    handles strategy at scale — anti joins can't broadcast the LEFT
    side, and the right side here is a filtered fact that shrinks
    with the priority predicate)."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    dec = "decimal(12,2)"
    tot = cust.agg(
        F.sum(F.col("c_acctbal").cast(dec)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rich = cust.crossJoin(F.broadcast(tot)).where(
        F.col("c_acctbal").cast(dec) * F.col("n") > F.col("s")
    )
    return (
        rich.join(urgent, rich["c_custkey"] == urgent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.col("c_acctbal").cast(dec)).cast("double").alias("sum_acctbal"),
        )
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): revenue from
    lineitems whose quantity is below 20% of their part's average.

    The per-part average comparison is cross-multiplied to integers
    (``qty * 5 * n < sum_qty`` ⟺ ``qty < 0.2 * avg``) — quantities
    are integral, so both engines compare exact BIGINTs; no float
    average crosses the engine boundary. Physically this is the
    classic self-join decorrelation Catalyst would produce for the
    subquery: one partial-agg pass over lineitem keyed on l_partkey,
    then a re-join on the same key (both sides shuffle on l_partkey;
    map-side combine keeps the agg side small)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("long")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("n_li")
    )
    below = li.join(stats, "l_partkey").where(
        qty * F.lit(5) * F.col("n_li") < F.col("sum_qty")
    )
    return below.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


def q_case_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot (TPC-H Q14 shape): PROMO revenue
    share per ship year. CASE-guarded decimal sums stay exact; the
    share divides two identical doubles at the very end (IEEE-same in
    both engines). The part join carries no hint — part grows with
    SF, AQE broadcasts at small actual sizes."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(dec)))
            .alias("promo_d"),
            F.sum(rev).alias("total_d"),
        )
        .select(
            "ship_year",
            F.col("promo_d").cast("double").alias("promo_revenue"),
            F.col("total_d").cast("double").alias("total_revenue"),
            (F.col("promo_d").cast("double") / F.col("total_d").cast("double")).alias(
                "promo_share"
            ),
        )
    )


def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dual-dimension-role join (TPC-H Q7 shape): shipping volume
    between supplier-nation and customer-nation pairs per year. The
    25-row nation dim joins TWICE under different roles — both
    broadcast (the only safe hints here; customer/supplier/orders/
    lineitem all grow with SF and are left to AQE). The fact probe
    order keeps lineitem streaming: orders folds in on l_orderkey
    (bucket-aligned), supplier on l_suppkey."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(n1), sup["s_nationkey"] == F.col("s_nkey"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nkey"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).cast("double").alias("volume"))
    )


def q_having_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery-on-HAVING (TPC-H Q18 shape): large-volume orders —
    orders whose total lineitem quantity exceeds 150, joined back to
    customer, top-100 by price. The qualifying-keys set is a
    map-side-combinable integer agg on l_orderkey (bucket-aligned →
    shuffle-free partial agg), and the re-join on the same key stays
    co-located; integer quantity sums are engine-exact."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native UNPIVOT (wide→long melt) of the lineitem measures into
    (keys, measure, v_milli) — the relational melt every metrics/
    feature pipeline needs before a long-form groupBy. Values are
    fixed-pointed FIRST so the melted column is a single exact BIGINT
    type. Unpivot is a per-row generator (like Expand) — zero
    shuffles, output = rows × measures."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        *[
            F.floor(F.col(c).cast("double") * 1000)
            .cast("long")
            .alias(c)
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        ],
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "v_milli",
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set-operator class: customers with orders in
    1995 INTERSECT those with 1996 orders (retained), minus (EXCEPT)
    those who ever placed an urgent order — tagged and unioned. Both
    engines implement set ops as hash semi/anti joins on the full row;
    keys here are customer ids (uniform, bucketed layout co-locates).
    """
    orders = _t(spark, sf_dir, "orders")
    y = F.year(F.col("o_orderdate"))
    c95 = orders.where(y == 1995).select("o_custkey")
    c96 = orders.where(y == 1996).select("o_custkey")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    retained = c95.intersect(c96)
    calm = retained.subtract(urgent)
    return retained.select(
        "o_custkey", F.lit("retained").alias("cohort")
    ).unionByName(
        calm.select("o_custkey", F.lit("retained_calm").alias("cohort"))
    )


def q_table_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-source content digest of the corpus
    (operators/profile.py::table_digest) — the anti-entropy check two
    engines/replicas can run independently and compare: BIT_XOR of a
    60-bit md5-derived row hash + row count, map-side combinable,
    overflow-free, row-order-blind."""
    from annotation_service_spark.operators.profile import table_digest

    return table_digest(
        _t(spark, sf_dir, "documents"),
        ["doc_id", "text"],
        group_cols=["source"],
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset diff between two corpus versions
    (operators/profile.py::table_diff — the release audit). Version
    B is derived deterministically in-plan: doc_id%7==0 dropped
    (removed), doc_id%11==0 text-amended (changed), doc_id%13==0
    re-added under new ids (added). Only (key, md5) pairs reach the
    FULL OUTER join — the first full-outer-join gate in the suite."""
    from annotation_service_spark.operators.profile import table_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit("X"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.lit("new"), F.col("text")).alias("text"),
            )
        )
    )
    return table_diff(docs, b, "doc_id", ["text"])


def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1-hour count + fixed-point sum per user
    (operators/timeseries.py::trailing_window_sum) — true event-time
    RANGE frame over exact epoch microseconds (membership by ordering
    VALUE, which ROWS frames can't express); the velocity-feature
    primitive. One uniform user_id shuffle, streaming frame state."""
    from annotation_service_spark.operators.timeseries import (
        trailing_window_sum,
    )

    return trailing_window_sum(_t(spark, sf_dir, "events"))


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-rollup maintenance
    (operators/rollup.py::merge_rollups): the 6-hour rollup is built
    as standing STATE (events before 2024-01-25 12:30) plus a fresh
    DELTA partition, then merged — and must equal the oracle's full
    recompute exactly. The deliberately bucket-straddling cutoff
    proves partial windows merge correctly (counts add, fixed-point
    sums add). At 100 TB this is the nightly pattern: scan only the
    new partition, merge rollup-sized tables."""
    from annotation_service_spark.operators import rollup as ru

    ev = _t(spark, sf_dir, "events")
    cut = F.lit("2024-01-25 12:30:00").cast("timestamp")
    mk = lambda df: ru.tumbling_rollup(  # noqa: E731
        df, window_width="6 hours", dims=("event_type",)
    )
    return ru.merge_rollups(
        mk(ev.where(F.col("ts") < cut)), mk(ev.where(F.col("ts") >= cut))
    )


def q_weighted_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k weighted sampling per stratum
    (curation.weighted_sample_per_stratum): 10 docs per source,
    probability ∝ length, same deterministic A-ES key as the global
    gate but selected by a per-stratum row_number window (one
    stratum-keyed shuffle)."""
    from annotation_service_spark.operators.curation import (
        weighted_sample_per_stratum,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        (F.length("text") + 1).cast("double").alias("weight"),
    )
    return weighted_sample_per_stratum(
        docs, k=10, weight_col="weight", stratum_col="source", salt="wss1"
    )


def q_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the embedding 3-NN cosine graph
    (operators/graph.py) — graph-centrality representativeness
    scoring, the second iterative-algorithm gate. Exact int64
    recurrence end-to-end; the oracle replays the WHOLE computation
    independently in DuckDB (edges from the exact-cosine SQL, the
    three iterations unrolled as chained CTEs) — no literals cross
    engines."""
    from annotation_service_spark.operators.graph import knn_pagerank

    return knn_pagerank(
        _t(spark, sf_dir, "embeddings"), k=3, iterations=3
    )


def _pagerank_oracle(k: int = 3, iterations: int = 3) -> str:
    """Independent DuckDB replay of ``knn_pagerank``: exact k-NN
    edges via the established round-6 cosine SQL (same as the ANN
    oracles), then the integer PageRank recurrence unrolled — one
    CTE per iteration. All-integer ops (`//` = floor division), so
    agreement is exact, not approximate."""
    damping, scale = 85, 1_000_000
    base = ((100 - damping) * scale) // 100
    cte = [
        f"""{_V_CTE},
        pairs AS (
            SELECT q.vec_id AS src, v.vec_id AS dst,
                   {_cos6('q.e', 'v.e')} AS cos
            FROM v q, v WHERE v.vec_id <> q.vec_id
        ),
        e AS (
            SELECT src, dst FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY src ORDER BY cos DESC, dst) AS rn
                FROM pairs) WHERE rn <= {k}
        ),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                FROM e GROUP BY 1),
        n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        s0 AS (SELECT node, CAST({scale} AS BIGINT) AS score FROM n)"""
    ]
    for i in range(iterations):
        cte.append(f"""
        s{i + 1} AS (
            SELECT n.node,
                   CAST({base} + ({damping} * COALESCE(t.m, 0)) // 100
                        AS BIGINT) AS score
            FROM n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM(s{i}.score // deg.deg) AS BIGINT) AS m
                FROM e
                JOIN s{i} ON s{i}.node = e.src
                JOIN deg ON deg.src = e.src
                GROUP BY 1) t ON t.node = n.node)""")
    return (
        "WITH "
        + ",".join(cte)
        + f"""
        SELECT node AS vec_id, CAST(score AS BIGINT) AS pr_score
        FROM s{iterations}"""
    )


BM25_TERMS = ["dup", "vector", "merge"]


def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance scoring of the corpus against a 3-term query
    (operators/ranking.py) — the IR-class operator for query-driven
    corpus slicing. Two passes, zero corpus shuffles: a 1-row stats
    agg, then a pure-expression score with the stats as literals.
    The oracle recomputes the stats with an INDEPENDENT sequential
    tokenizer (bm25_stats_reference) and replays the identical
    literal-for-literal double arithmetic, so scores are bit-exact
    across engines (fixed-point micro units)."""
    from annotation_service_spark.operators.ranking import bm25_score

    return bm25_score(_t(spark, sf_dir, "documents"), BM25_TERMS)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size weighted sampling without replacement
    (Efraimidis–Spirakis A-ES, operators/curation.py): 50 docs with
    probability ∝ text length, via the deterministic md5 uniform.
    The top-k is TakeOrderedAndProject (per-partition k-heaps + a
    k-row driver merge) — no sort shuffle, no RNG state."""
    from annotation_service_spark.operators.curation import weighted_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.length("text") + 1).cast("double").alias("weight")
    )
    return weighted_sample(docs, k=50, weight_col="weight", salt="ws1")


def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-guarded train/val split (operators/curation.py):
    the 90/10 hash coin is thrown on the exact-dup content hash
    (md5(text)), so duplicate documents always share a split — the
    eval-contamination guard. Pure expression, zero shuffles."""
    from annotation_service_spark.operators.curation import group_split

    docs = _t(spark, sf_dir, "documents")
    return group_split(
        docs, F.md5(F.col("text")), salt="sp1"
    ).select("doc_id", "split_group", "split")


def q_embedding_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (operators/decontam.py::embedding_contamination_check — the
    semantic twin of the n-gram `decontaminate` gate): vectors with
    vec_id%50==0 act as the held-out benchmark, every other vector
    reports its hit count and max cosine against the broadcast
    benchmark set. No shuffle on the corpus side; threshold 0.45
    because the synthetic embeddings are i.i.d. random (same
    calibration as dedup_embedding_cosine)."""
    emb = _t(spark, sf_dir, "embeddings")
    from annotation_service_spark.operators.decontam import (
        embedding_contamination_check,
    )

    return embedding_contamination_check(
        emb.where(F.col("vec_id") % 50 != 0),
        emb.where(F.col("vec_id") % 50 == 0),
        threshold=0.45,
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year),
    adapted to the synthetic schema (no partsupp table: unit cost =
    p_retailprice/10). amount = extprice·(1−disc) − retail·qty/10;
    both terms are summed EXACTLY in decimal and only the final
    subtraction/division runs in double (identical IEEE ops both
    engines). Joins: lineitem ⨝ part('%gear%') ⨝ orders(year) ⨝
    supplier ⨝ nation — dims broadcast, facts left to AQE."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    rev = F.col("l_extendedprice").cast(dec) * (one - F.col("l_discount").cast(dec))
    cost = F.col("p_retailprice").cast(dec) * F.col("l_quantity").cast(dec)
    j = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(
            F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"]
        )
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            (
                F.sum(rev).cast("double")
                - F.sum(cost).cast("double") / F.lit(10.0)
            ).alias("sum_profit")
        )
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): LEFT join with
    a filtered right side (non-'4-NOT SPECIFIED' orders), count per
    customer, then the histogram of those counts — the
    double-aggregation shape. Customers with no qualifying orders
    land in the c_count=0 bucket via the outer join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    double-correlated EXISTS/NOT-EXISTS, rewritten as per-order
    distinct-supplier counts (the standard decorrelation): supplier s
    'waits' on a finished order when s has an 'R'-returned line, the
    order involves >1 supplier, and s is the ONLY supplier with an
    'R' line (synthetic schema has no commit/receipt dates — the
    returnflag stands in for 'late'). Exact integer counts; output
    (s_name, numwait)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    lf = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = lf.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r"),
    )
    r_lines = (
        lf.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    waits = (
        r_lines.join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_r") == 1)),
            "l_orderkey",
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    return waits.join(sup, waits["l_suppkey"] == sup["s_suppkey"]).select(
        "s_name", "numwait"
    )


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking, adapted to this schema (no
    l_commitdate/l_receiptdate): an order counts as LATE when some
    lineitem shipped > 30 days after the order date. Keeps Q4's
    defining shape — EXISTS decorrelated to a left-semi join with an
    extra non-equi residual on top of the orderkey equi-join."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: revenue between two nations by
    direction and ship year — the two-role dimension join (nation
    joined twice under different keys), a disjunctive cross-side
    predicate, and a decimal-exact rollup."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    dec = "decimal(12,2)"
    one = F.lit(1).cast("decimal(4,2)")
    n1 = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    vol = F.col("l_extendedprice").cast(dec) * (
        one - F.col("l_discount").cast(dec)
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            vol.alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lineitems of one brand
    below 20% of their part's average quantity. The correlated-AVG
    comparison is decorrelated into a per-part (sum, count) aggregate
    join and rewritten EXACT-decimal: l_q < 0.2·(sum/cnt) ⇔
    5·l_q·cnt < sum — no float average ever materializes, so
    distributed summation order cannot flip a row on either engine."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    dec = "decimal(12,2)"
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast(dec)).alias("sum_q"),
        F.count(F.lit(1)).alias("cnt_q"),
    )
    j = (
        li.join(
            F.broadcast(part.where(F.col("p_brand") == "Brand#23")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .where(
            F.lit(5).cast("decimal(4,0)")
            * F.col("l_quantity").cast(dec)
            * F.col("cnt_q")
            < F.col("sum_q")
        )
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast(dec)).cast("double")
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity, adapted (no c_phone —
    country code := c_nationkey): customers above the positive-balance
    average with no RECENT orders (none since 2001-06-01 — the
    synthetic history gives every customer SOME order, so the
    lapsed-customer form keeps Q22's anti-join non-degenerate),
    counted per country. The global-average threshold uses the same
    exact-decimal rewrite as Q17 (bal·cnt > sum), plus the defining
    anti-join against orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp")
    )
    dec = "decimal(12,2)"
    bal = F.col("c_acctbal").cast(dec)
    pos = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("sum_b"), F.count(F.lit(1)).alias("cnt_b")
    )
    rich = (
        cust.crossJoin(F.broadcast(pos))
        .where(bal * F.col("cnt_b") > F.col("sum_b"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return (
        rich.groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


def q_perceptron_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus filtering (operators/classify.py): a batch
    perceptron over md5-hashed bag-of-words buckets, trained 2 epochs
    against the lang='en' label, scoring every document with an EXACT
    int64 margin. Weights, updates, and scores are integer sums, so
    the trained model is bit-identical under any partitioning and the
    oracle replays the two unrolled epochs verbatim. (The synthetic
    corpus draws lang independently of text, so this gate pins the
    TRAINING ARITHMETIC, not accuracy; learning behavior is pinned by
    tests/test_classify.py on planted-separable corpora.)"""
    from annotation_service_spark.operators import classify as cf

    docs = _t(spark, sf_dir, "documents")
    return cf.perceptron_scores(
        docs,
        label=F.when(F.col("lang") == "en", 1).otherwise(-1),
        n_buckets=64,
        epochs=2,
    ).withColumnRenamed("id", "doc_id")


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-mixture assembly under per-source token budgets
    (operators/curation.py::token_budget_sample): sources src0..src14
    get budgets 2000/2500/3000 (cycling), src15..src19 are absent
    from the spec and contribute nothing; documents fill each budget
    in seeded-md5 priority order until the budget is crossed
    (boundary doc kept). Two-phase per-source cumsum — range-shard +
    bounded offset broadcast, no per-source SinglePartition window;
    the oracle replays it as one window over the same total order."""
    budgets = {f"src{i}": 2000 + 500 * (i % 3) for i in range(15)}
    return cu.token_budget_sample(
        _t(spark, sf_dir, "documents"), budgets, seed=7
    )


def q_token_budget_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture assembly weighted by REAL token counts
    (functions/text.py::token_count — the engine-portable regex
    tokenizer) instead of n_chars: budgets are expressed in tokens,
    the unit mixture specs are actually written in (VERDICT r11 item
    6). Identical two-phase cumsum plan — ``weight_col`` is generic,
    only the weight expression changes. The BPE-count twin
    (functions/bpe.py::bpe_encode n_tokens) is pinned end-to-end by
    tests/test_sampling_split.py; greedy merge application is not
    SQL-expressible, so the ORACLE-MATCHED gate uses the regex
    count."""
    from annotation_service_spark.functions import text as tx

    budgets = {f"src{i}": 400 + 100 * (i % 3) for i in range(15)}
    docs = _t(spark, sf_dir, "documents").withColumn(
        "n_tok", tx.token_count(F.col("text"))
    )
    return cu.token_budget_sample(docs, budgets, seed=11, weight_col="n_tok")


def _lined_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-cut into deterministic 2-token lines (newline
    joined) — the synthetic corpus has no real line structure, so the
    line-family gates synthesize one the oracle reproduces exactly:
    line i = words[2i:2i+2]."""
    from annotation_service_spark.partitioning import spread_underparallel

    # r14 (guide §2.5): the O(words^2) transform/slice synthesis is
    # the expensive projection — spread the RAW docs first so it runs
    # on every core, not on the one-row-group scan task (A/B showed
    # spreading ABOVE the synthesis is a net loss: the exchange is
    # paid but the bottleneck stays serial)
    docs = spread_underparallel(_t(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    lines = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    return docs.select("doc_id", F.concat_ws("\n", lines).alias("text"))


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (functions/text.py::gopher_quality_table —
    Rae et al. 2021 Table A1): per-document word/symbol/bullet/alpha/
    stopword heuristics with the combined verdict, every pass
    condition in integer arithmetic so the boolean is bit-portable.
    Thresholds pick the discriminating regime for the synthetic
    corpus: min_words=50 sits at its median, and min_stop_hits=1
    because 'the' is the only published stop word in its vocabulary
    (~75% of documents carry it)."""
    from annotation_service_spark.functions import text as tx

    return tx.gopher_quality_table(
        _t(spark, sf_dir, "documents"), min_stop_hits=1
    )


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning (functions/text.py::c4_clean — Raffel et al. 2020
    §2.2): terminal-punctuation line retention, short/javascript line
    drops, lorem-ipsum/brace/min-sentences page drops. The synthetic
    corpus has no punctuation, so the gate plants it
    deterministically: 2-token lines (the line-family synthesis), a
    '.' appended when md5(line) starts 0-7 (half the lines, both
    engines agree on md5 hex), and ' {' appended to every 97th
    document's text to exercise the page-drop rule. The operator
    under test is unmodified; only its input is synthesized."""
    from annotation_service_spark.functions import text as tx

    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    dotted = F.transform(
        lines_arr,
        lambda l: F.when(
            F.substring(F.md5(l), 1, 1) < F.lit("8"), F.concat(l, F.lit("."))
        ).otherwise(l),
    )
    txt = F.concat_ws("\n", dotted)
    txt = F.when(
        F.col("doc_id") % 97 == 0, F.concat(txt, F.lit(" {"))
    ).otherwise(txt)
    return tx.c4_clean(
        docs.select("doc_id", txt.alias("text")),
        min_line_words=2,
        min_sentences=3,
    )


def _synth_url() -> "F.Column":
    """Deterministic URL column over doc_id — the messes
    canonicalization exists for, shared by every URL gate (the oracle
    CTE `_URL_SYNTH_CASE` replays it verbatim): uppercase scheme/host
    + default port + utm/fragment noise + a %7E that must DECODE to
    '~' (doc_id%3==0); the clean twin that only collides with it
    after percent-decoding (%3==1, same host/path key space); and
    userinfo + http:80 + a path mixing a RESERVED escape that must
    stay encoded-but-uppercased (%2f → %2F) with an unreserved one
    that decodes (%41 → A) (%3==2)."""
    m7 = (F.col("doc_id") % 7).cast("string")
    m11 = (F.col("doc_id") % 11).cast("string")
    return (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("HTTPS://Site"), m7, F.lit(".COM:443/Page%7E/"), m11,
                F.lit("?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("https://site"), m7, F.lit(".com/Page~/"), m11,
                F.lit("?a=1&b=2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://user:pw@Host"), m7, F.lit(".org:80/%2fx%41")
            )
        )
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup after canonicalization
    (functions/url.py::dedup_urls_keep_first — the RefinedWeb first
    stage; C4 also dedupes pages by URL). The synthetic corpus has no
    URL column, so the gate synthesizes one deterministically
    (see ``_synth_url``) — including RFC 3986 §6.2.2 percent-encoding
    normalization cases (%7E decodes, %2f uppercases, %41 decodes).
    One content-keyed groupBy; the oracle replays synthesis +
    canonicalization in SQL."""
    from annotation_service_spark.functions import url as fu

    docs = _t(spark, sf_dir, "documents")
    return fu.dedup_urls_keep_first(
        docs.select("doc_id", _synth_url().alias("url"))
    )


def q_url_host_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-blocklist filtering with dot-suffix matching
    (functions/url.py::filter_blocked_hosts — RefinedWeb §3.1's URL
    blocklist stage): a blocked registrable domain covers every
    subdomain, the matched entry is the LONGEST (most specific) hit,
    and garbage URLs (no scheme) are never blocked. Synthesis covers
    subdomain-via-parent blocking (cdn.adsN.net ← adsN.net),
    specificity (www.site3.com beats site3.com), port/case stripping,
    and an unparseable row every 13th doc. Plan: bounded suffix
    explode (≤ label count) + broadcast dim join + one id-keyed
    reduce."""
    from annotation_service_spark.functions import url as fu

    docs = _t(spark, sf_dir, "documents")
    m5 = (F.col("doc_id") % 5).cast("string")
    m7 = (F.col("doc_id") % 7).cast("string")
    m11 = (F.col("doc_id") % 11).cast("string")
    url = (
        F.when(F.col("doc_id") % 13 == 0, F.lit("oops no scheme"))
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("https://www.site"), m7, F.lit(".com/p/"), m11
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("HTTP://CDN.Ads"), m5, F.lit(".NET:8080/x")),
        )
        .otherwise(F.concat(F.lit("https://host"), m7, F.lit(".org")))
    )
    blocklist = spark.createDataFrame(
        [
            ("ads0.net",),
            ("ads1.net",),
            ("site3.com",),
            ("www.site3.com",),
            ("host5.org",),
        ],
        "domain string",
    )
    return fu.filter_blocked_hosts(
        docs.select("doc_id", url.alias("url")), blocklist
    )


def _synth_html() -> F.Column:
    """Deterministic HTML page per document — the corpus has no
    markup column, so the gate synthesizes one from (doc_id, lang,
    text), exercising every branch of the extraction chain: comments,
    script/style blocks (with tags INSIDE the script body), break
    tags in mixed case, inline-tag welding, the entity set
    (&amp;/&lt;/&nbsp;/&#39; plus a double-encoded &amp;lt;), a
    titleless page, a markupless page, and a 4-newline squeeze run.
    The oracle rebuilds the identical string in SQL (_HTML_SYNTH_CASE).
    """
    m3 = F.col("doc_id") % 3
    ds = F.col("doc_id").cast("string")
    return (
        F.when(
            m3 == 0,
            F.concat(
                F.lit("<html><head><title> Doc "), ds,
                F.lit(" &amp; "), F.col("lang"),
                F.lit("</title><style>p{color:red}</style></head>"
                      "<body><!-- nav\nchrome --><P>"),
                F.col("text"),
                F.lit("</P><script type=\"x\">var a='<p>null</p>';"
                      "</script><div>tail<b>bold</b>weld&nbsp;"
                      "&#39;q&#39;</div>"
                      "<ul><li>lang "),
                F.col("lang"),
                F.lit("</li><li>item&amp;lt;2</li></ul>"
                      "<a href=\"https://Site"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".com/p/"), (F.col("doc_id") % 11).cast("string"),
                F.lit("\">x</a><a href=\"/rel/"),
                (F.col("doc_id") % 5).cast("string"),
                F.lit("\">r</a></body></html>"),
            ),
        )
        .when(
            m3 == 1,
            F.concat(
                F.lit("<div>"), F.col("text"),
                F.lit("<BR/>second&nbsp;line</div>"
                      "<a href=\"HTTP://EXT"),
                (F.col("doc_id") % 4).cast("string"),
                F.lit(".NET:8080/y\">e</a>"),
            ),
        )
        .otherwise(
            F.concat(
                F.col("text"),
                F.lit("\n\n\n\ntail &amp; end"),
            )
        )
    )


# The same synthesis as ONE SQL CASE (DuckDB) — string-identical to
# _synth_html() output: CAST(bigint AS VARCHAR) and Spark's
# cast(long as string) both render plain digits.
_HTML_SYNTH_CASE = (
    "CASE WHEN doc_id % 3 = 0 THEN "
    "'<html><head><title> Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; ' "
    "|| lang || '</title><style>p{color:red}</style></head>"
    "<body><!-- nav' || chr(10) || 'chrome --><P>' || text || "
    "'</P><script type=\"x\">var a=''<p>null</p>'';</script>"
    "<div>tail<b>bold</b>weld&nbsp;&#39;q&#39;</div>"
    "<ul><li>lang ' || lang || '</li><li>item&amp;lt;2</li></ul>"
    "<a href=\"https://Site' || CAST(doc_id % 7 AS VARCHAR) || "
    "'.com/p/' || CAST(doc_id % 11 AS VARCHAR) || '\">x</a>"
    "<a href=\"/rel/' || CAST(doc_id % 5 AS VARCHAR) || '\">r</a>"
    "</body></html>' "
    "WHEN doc_id % 3 = 1 THEN "
    "'<div>' || text || '<BR/>second&nbsp;line</div>"
    "<a href=\"HTTP://EXT' || CAST(doc_id % 4 AS VARCHAR) || "
    "'.NET:8080/y\">e</a>' "
    "ELSE text || chr(10) || chr(10) || chr(10) || chr(10) "
    "|| 'tail &amp; end' END"
)

# Source URL for the link-graph gate: parseable for most docs, a
# scheme-less string every 13th (the relative-href fallback then
# resolves to src_host '').
_HTML_SRC_URL_CASE = (
    "CASE WHEN doc_id % 13 = 0 THEN 'no scheme here' "
    "ELSE 'https://src' || CAST(doc_id % 4 AS VARCHAR) || '.org/d/' "
    "|| CAST(doc_id AS VARCHAR) END"
)


# Shared DuckDB replay of page synthesis + the 6-step extraction
# chain (html_extract and html_pipeline build on the same CTEs —
# one chain per engine, so the two gates cannot drift):
# pg(html) -> s4 (comments/script/style removed, break tags ->
# newline) -> s6 (tag strip + ordered entity decode) -> fin
# (title + whitespace-canonical clean_text per doc).
_HTML_EXTRACT_CTES = f"""
            pg AS (
                SELECT doc_id, {_HTML_SYNTH_CASE} AS html
                FROM documents
            ),
            s4 AS (
                SELECT doc_id, html,
                    regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(html,
                        '(?s)<!--.*?-->', '', 'g'),
                        '(?is)<script\\b[^>]*>.*?</script>', '', 'g'),
                        '(?is)<style\\b[^>]*>.*?</style>', '', 'g'),
                        '(?i)<br\\s*/?>|</(?:p|div|h[1-6]|li|tr|ul|ol|table|blockquote|title)\\s*>',
                        chr(10), 'g') AS c
                FROM pg
            ),
            s6 AS (
                SELECT doc_id, html,
                    replace(replace(replace(replace(replace(replace(
                        regexp_replace(c, '<[^>]*>', ' ', 'g'),
                        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                        '&#39;', chr(39)), '&nbsp;', ' '),
                        '&amp;', '&') AS c
                FROM s4
            ),
            fin AS (
                SELECT doc_id,
                    regexp_replace(regexp_replace(
                        replace(replace(replace(replace(replace(replace(
                            regexp_extract(html,
                                '(?is)<title[^>]*>(.*?)</title>', 1),
                            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                            '&#39;', chr(39)), '&nbsp;', ' '),
                            '&amp;', '&'),
                        '[ \\t\\r\\n\\f]+', ' ', 'g'),
                        '^ +| +$', '', 'g') AS title,
                    regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(c,
                        '[ \\t\\r\\f]+', ' ', 'g'),
                        ' *\\n *', chr(10), 'g'),
                        '\\n{{3,}}', chr(10)||chr(10), 'g'),
                        '^[ \\n]+|[ \\n]+$', '', 'g') AS clean_text
                FROM s6
            )"""


def _synth_src_url() -> F.Column:
    return F.when(
        F.col("doc_id") % 13 == 0, F.lit("no scheme here")
    ).otherwise(
        F.concat(
            F.lit("https://src"), (F.col("doc_id") % 4).cast("string"),
            F.lit(".org/d/"), F.col("doc_id").cast("string"),
        )
    )


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → visible-text extraction (functions/html.py::
    extract_html_text — the C4/CCNet/RefinedWeb stage every web
    corpus runs FIRST): comment/script/style removal, break-tag →
    newline, tag strip with inline-weld protection, ordered entity
    decode (&amp; last), whitespace canonicalization. Pure per-row
    regex/replace Column chain — scan + project, no shuffle; the
    oracle replays the identical 6-step chain in RE2."""
    from annotation_service_spark.functions import html as fh
    from annotation_service_spark.partitioning import spread_underparallel

    # r14 (guide §2.5): synth + the 6-step regex chain are the whole
    # query and run scan-side — spread the one-row-group scan first
    docs = spread_underparallel(_t(spark, sf_dir, "documents"))
    return fh.extract_html_text(
        docs.select("doc_id", _synth_html().alias("html"))
    ).withColumnRenamed("id", "doc_id")


def q_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from raw markup (functions/html.py::
    link_host_edges): quoted hrefs via regexp_extract_all group 1,
    relative links resolved to the SOURCE host (url.py::url_host,
    '' for unparseable sources), one content-keyed groupBy to
    (src_host, dst_host, n_links) — the crawl-frontier edge list. A
    host pair crawled 10^9 times is one aggregation key."""
    from annotation_service_spark.functions import html as fh

    docs = _t(spark, sf_dir, "documents")
    return fh.link_host_edges(
        docs.select(
            "doc_id",
            _synth_html().alias("html"),
            _synth_src_url().alias("url"),
        )
    )


def q_html_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-rooted composition: raw markup → text extraction →
    word-blocklist drop → Gopher quality gate → boilerplate line
    removal — web_pipeline's chain but STARTING from HTML, the way a
    production pipeline actually runs (WARC bytes in, training text
    out). Every stage is the unmodified gated operator; the
    interplay being pinned here is that the blocklist, quality
    rules, and hot-line counts all judge the EXTRACTED text — chrome
    the extractor turns into repeated lines ('second line', link
    anchors) becomes exactly the boilerplate the line stage removes."""
    from annotation_service_spark.functions import html as fh
    from annotation_service_spark.functions import text as tx

    # r14 note: spread_underparallel on this scan measured 1.18x
    # WORSE (composition: the docs scan feeds several verdict
    # branches; same lesson as q_pipeline_full). Bare q_html_extract
    # keeps its spread — there the regex chain IS the whole query.
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select("doc_id", _synth_html().alias("html"))
    ext = fh.extract_html_text(pages).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
    )
    # r13 measurement note (guide §1.1): chaining the blocklist and
    # Gopher verdicts in one projection (keep_cols, zero joins) was
    # tried and MEASURED ~2x SLOWER (interleaved A/B at sf0.1: cold
    # ~5.2 -> ~10.8 s) — filter pushdown re-substitutes the extracted
    # clean_text regex chain into every verdict use site, so the
    # extraction evaluates 4-5x per row vs once per id-join branch.
    # The id-keyed verdict joins stay deliberately.
    bw_keep = (
        tx.blocked_word_filter(ext, ["dup"])
        .where(~F.col("blocked"))
        .select(F.col("id").alias("doc_id"))
    )
    gq_pass = (
        tx.gopher_quality_table(ext, min_stop_hits=1)
        .where(F.col("passes"))
        .select(F.col("id").alias("doc_id"))
    )
    # r13: the boilerplate stage's hot-set limit probe executes its
    # input once before the main action does — scoped-cache the
    # staged survivors so the probe's execution is the one the main
    # query reuses (without it the HTML extraction ran twice; A/B
    # showed the probe regressing this composition ~+2.5 s cold).
    staged = scoped_cache(
        "entry.html_pipeline.staged",
        ext.join(bw_keep, "doc_id").join(gq_pass, "doc_id"),
    )
    # cache_units=False: staged is already cached — re-splitting it
    # beats materializing a second corpus-sized units cache (A/B r13)
    return cu.remove_boilerplate_lines(
        staged, max_line_df=15, cache_units=False
    )


def q_stream_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sentence-level dedup, hash-verified: the
    sentence_dedup gate's dotted synthesis streams through
    ``_doc_sentences`` (posexplode + per-row expressions — runs
    UNMODIFIED on the stream) and a streaming dropDuplicates keyed by
    the normalized sentence — the live-ingest twin of
    ``dedup_sentences_keep_first``. Which occurrence survives is
    batch-order dependent, so the gate pins the NORM SET — the
    deterministic projection of the operator's state (the
    stream_url_dedup pattern). Oracle: the closed input's distinct
    sentence norms."""
    from annotation_service_spark.operators.curation import _doc_sentences

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    words = F.split(F.col("text"), " ")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    dotted = F.transform(
        lines_arr,
        lambda l: F.when(
            F.substring(F.md5(l), 1, 1) < F.lit("8"), F.concat(l, F.lit("."))
        ).otherwise(l),
    )
    txt = F.concat_ws(" ", dotted)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(F.col("doc_id"), txt.alias("text"))
    )
    sents = (
        _doc_sentences(stream, "doc_id", "text")
        .select("norm")
        .dropDuplicates(["norm"])
    )
    name = f"stream_sentence_dedup_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        sents.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("norm").distinct()


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance filter (functions/url.py::filter_robots
    — RFC 9309 §2.2.2 longest-match, allow-wins-ties, no-rule →
    allowed). Synthesis covers the site-wide ban with a longer
    Allow carve-out, a deeper carve-out inside a Disallow subtree,
    the equal-length tie (allow wins), a host whose rules match
    nothing (allowed), and an unparseable URL (host '', no ''-host
    rules → allowed). Plan: broadcast dim join on host + per-row
    startswith + ONE id-keyed max over a packed ordering key — the
    URL fact side never shuffles by content."""
    from annotation_service_spark.functions import url as fu

    docs = _t(spark, sf_dir, "documents")
    m7 = (F.col("doc_id") % 7).cast("string")
    m11 = (F.col("doc_id") % 11).cast("string")
    url = (
        F.when(F.col("doc_id") % 13 == 0, F.lit("not a url"))
        .when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("https://site"), m7, F.lit(".com/private/"), m11
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.lit("https://site"), m7, F.lit(".com/public/"), m11),
        )
        .otherwise(F.concat(F.lit("https://open"), m7, F.lit(".org")))
    )
    rules = spark.createDataFrame(
        [
            ("site0.com", False, "/"),
            ("site0.com", True, "/public/"),
            ("site1.com", False, "/private/"),
            ("site1.com", True, "/private/7"),
            ("site2.com", False, "/private"),
            ("site2.com", True, "/private"),
            ("open3.org", False, "/x"),
        ],
        "host string, allow boolean, prefix string",
    )
    return fu.filter_robots(docs.select("doc_id", url.alias("url")), rules)


def q_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SENTENCE-level exact dedup keeping the first occurrence
    (operators/curation.py::dedup_sentences_keep_first — the Dolma
    sentence-dedup stage in its exact compaction-time form, sharing
    the line family's broadcast keep-first core). The corpus has no
    sentence punctuation, so the gate synthesizes it with the
    web_pipeline dotting rule (2-token chunks, '.' appended when the
    chunk's md5 leads < '8') and joins chunks with SPACES — dotless
    chunks merge into their successor sentence, the realistic ragged
    shape. The oracle re-segments in SQL and decides keep-first with
    a row_number window — a different formulation of the same
    semantics than the operator's min-struct."""
    from annotation_service_spark.partitioning import spread_underparallel

    # r14: spread before the O(words^2) dotting synthesis (see
    # _lined_documents)
    docs = spread_underparallel(_t(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    dotted = F.transform(
        lines_arr,
        lambda l: F.when(
            F.substring(F.md5(l), 1, 1) < F.lit("8"), F.concat(l, F.lit("."))
        ).otherwise(l),
    )
    txt = F.concat_ws(" ", dotted)
    return cu.dedup_sentences_keep_first(
        docs.select("doc_id", txt.alias("text"))
    ).withColumnRenamed("id", "doc_id")


def q_kn_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram NLL under interpolated KNESER-NEY smoothing
    (functions/text.py::kneser_ney_nll_table, D=0.75) — the
    CCNet-class LM perplexity filter signal, next to bigram_nll's
    Laplace baseline. Continuation/backoff arithmetic is replayed
    op-for-op by the oracle; 1e-6 rounding absorbs log2 ulps."""
    return txt.kneser_ney_nll_table(
        _t(spark, sf_dir, "documents")
    ).withColumnRenamed("id", "doc_id")


def q_badword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-blocklist page filter (functions/text.py::
    blocked_word_filter — the C4 §2.2 blocklist stage, mechanism
    only: the list is the caller's policy). Whole-token matching on
    the shared tokenizer; hit set returned sorted for determinism.
    The blocklist folds into the plan as a literal array —
    array_intersect per row, NO join, no shuffle beyond the scan."""
    docs = _t(spark, sf_dir, "documents")
    return txt.blocked_word_filter(
        docs, ["slow", "dup", "crash", "spill", "skew"]
    ).withColumnRenamed("id", "doc_id")


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficient batch assignment (operators/curation.py::
    length_bucket_batches — the group-by-length batching trainers
    use): exact global (n_chars, doc_id) rank via the epoch_shuffle
    two-phase scan, batch_idx = rank // 64, per-batch max and padding
    waste. The oracle replays it as one row_number() + a batch-keyed
    window over the same total order."""
    return cu.length_bucket_batches(
        _t(spark, sf_dir, "documents"), batch_size=64
    )


def q_web_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standard web-curation CHAIN, end-to-end (RefinedWeb §3's
    ordering of the published stages): URL dedup keep-first
    (functions/url.py) → C4 line/page cleaning (Raffel et al. 2020)
    → Gopher quality gate (Rae et al. 2021) → line-level boilerplate
    removal (CCNet/RefinedWeb line hash). Every stage is the
    already-oracle-gated operator, unmodified; the composition pins
    the INTERACTIONS (boilerplate line-df counts are computed over
    the FILTERED corpus, C4 text feeds the line stage, Gopher judges
    the original text). Input synthesis reuses the url_dedup and
    c4_filter gates' deterministic constructions verbatim."""
    return _web_pipeline(spark, sf_dir, with_repetition=False)


def q_web_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """web_pipeline plus the OTHER half of Rae et al. 2021 Table A1 —
    the repetition fractions (functions/text.py::
    repetition_metrics_table), which RefinedWeb applies alongside the
    quality heuristics: URL dedup → C4 cleaning → Gopher quality →
    Gopher repetition filter → boilerplate removal. The repetition
    stage judges the ORIGINAL text (like the quality stage) and its
    keep flag inner-joins into the staged set, so a document that is
    all duplicate n-grams never reaches the line stage."""
    return _web_pipeline(spark, sf_dir, with_repetition=True)


def _web_pipeline(
    spark: SparkSession, sf_dir: str, with_repetition: bool
) -> DataFrame:
    from annotation_service_spark.functions import text as tx
    from annotation_service_spark.functions import url as fu

    # r14 note: spreading this scan measured within drift cold and
    # par warm (the composition lesson from q_pipeline_full /
    # q_html_pipeline: multi-consumer scans don't pay for the
    # exchange) — left un-spread.
    docs = _t(spark, sf_dir, "documents")
    first = fu.dedup_urls_keep_first(
        docs.select("doc_id", _synth_url().alias("url"))
    ).select(F.col("first_id").alias("doc_id"))
    survivors = docs.join(first, "doc_id")

    words = F.split(F.col("text"), " ")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    dotted = F.transform(
        lines_arr,
        lambda l: F.when(
            F.substring(F.md5(l), 1, 1) < F.lit("8"), F.concat(l, F.lit("."))
        ).otherwise(l),
    )
    txt = F.concat_ws("\n", dotted)
    txt = F.when(
        F.col("doc_id") % 97 == 0, F.concat(txt, F.lit(" {"))
    ).otherwise(txt)
    # r13 measurement note (guide §1.1): chaining the C4/Gopher
    # verdicts in one projection (keep_cols passthrough, zero joins)
    # was tried and MEASURED SLOWER (interleaved A/B at sf0.1:
    # web_pipeline ~6.5 -> ~9.9 s cold, web_pipeline_full worse) —
    # filter pushdown re-substitutes the collapsed synthesized-text
    # expression tree into every verdict use site, so the heavy
    # expressions evaluate 3-5x per row vs once per id-join branch.
    # The id-keyed verdict joins stay deliberately.
    c4 = tx.c4_clean(
        survivors.select("doc_id", txt.alias("text")),
        min_line_words=2,
        min_sentences=3,
    )
    c4_ok = c4.where(F.col("kept_page")).select(
        F.col("id").alias("doc_id"), F.col("clean_text").alias("text")
    )
    gopher_pass = (
        tx.gopher_quality_table(survivors, min_stop_hits=1)
        .where(F.col("passes"))
        .select(F.col("id").alias("doc_id"))
    )
    staged = c4_ok.join(gopher_pass, "doc_id")
    if with_repetition:
        rep_keep = (
            tx.repetition_metrics_table(survivors)
            .where(F.col("keep"))
            .select(F.col("id").alias("doc_id"))
        )
        staged = staged.join(rep_keep, "doc_id")
    # r13: same probe-reuse cache as q_html_pipeline — the boilerplate
    # stage's hot-set limit probe otherwise re-executes the whole
    # synthesize+C4+Gopher upstream a second time.
    staged = scoped_cache(
        f"entry.web_pipeline.staged.rep{with_repetition}", staged
    )
    # cache_units=False: staged is already cached — re-splitting it
    # beats materializing a second corpus-sized units cache (A/B r13)
    return cu.remove_boilerplate_lines(
        staged, max_line_df=15, cache_units=False
    )


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (operators/curation.py::
    remove_boilerplate_lines — the CCNet/RefinedWeb line-hash family):
    lines whose normalized form appears in > 15 distinct documents are
    template furniture and are removed everywhere; documents come back
    reassembled in original line order with (n_lines, n_kept). Plan:
    linear line explode + one content-keyed distinct-doc count +
    left_anti join — no all-pairs, hot lines are single aggregation
    keys. The oracle replays the same threshold over the same
    synthesized lines."""
    return cu.remove_boilerplate_lines(
        _lined_documents(spark, sf_dir), max_line_df=15
    )


def q_line_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/line-level exact dedup keeping one canonical copy
    (operators/curation.py::dedup_lines_keep_first — the literal CCNet
    paragraph-dedup semantics): every repeated normalized line keeps
    only its first corpus occurrence in (id, line_no) order (min over
    values — deterministic under any partitioning), all other
    occurrences are removed."""
    return cu.dedup_lines_keep_first(_lined_documents(spark, sf_dir))


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training order (operators/curation.py::
    epoch_shuffle): exact global rank under the epoch-1 md5 coin
    order and the (batch_idx, pos_in_batch) assignment at
    batch_size=256 — computed by the two-phase scan decomposition
    (range-shard + offset broadcast), never a single-partition
    window; the oracle replays it as one row_number() over the same
    total order."""
    return cu.epoch_shuffle(
        _t(spark, sf_dir, "documents"), epoch=1, batch_size=256
    )


def q_filter_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter calibration: decile the perceptron margins over the
    (score, doc_id) total order and report per-decile document and
    positive-label counts plus the exact score range — the
    threshold-sanity table read before applying any model-based
    filter (does the top decile actually concentrate the target
    class?). Counts and scores are integer-exact; the global ntile is
    a one-pass window over one slim row per doc (the already-reduced
    score table, not the corpus — same global-rank precedent as the
    ntile_deciles gate)."""
    from annotation_service_spark.operators import classify as cf

    docs = _t(spark, sf_dir, "documents")
    scores = cf.perceptron_scores(
        docs,
        label=F.when(F.col("lang") == "en", 1).otherwise(-1),
        n_buckets=64,
        epochs=2,
    )
    w = Window.orderBy("score", "id")
    return (
        scores.withColumn("decile", F.ntile(10).over(w))
        .groupBy(F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.min("score").cast("long").alias("min_score"),
            F.max("score").cast("long").alias("max_score"),
        )
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide heavy hitters (every word with frequency ≥
    1/100 of all words) via the two-pass Misra–Gries scheme
    (operators/sketch.py::heavy_hitters): per-partition bounded-state
    candidate fold → broadcast semi-join → exact count vs the 1-row
    total, integer-compared. Output is bit-identical to the naive
    full groupBy + HAVING the oracle runs — the sketch changes the
    shuffle profile (≤ capacity keys/partition instead of the full
    vocabulary), not the answer."""
    from annotation_service_spark.operators import sketch as sk

    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).where(F.col("word") != "")
    return sk.heavy_hitters(words, "word", threshold_denom=100)


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping modes / order priority, adapted to this
    schema (no l_shipmode/l_commitdate/l_receiptdate): mode :=
    l_returnflag restricted to two values, the receipt-year window
    runs on l_shipdate, and the commit<receipt residual becomes the
    non-equi l_shipdate > o_orderdate. Keeps Q12's defining shape —
    a fact/fact equi-join with a residual predicate feeding two
    CASE-conditional counts per mode."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


_PARTSUPP_SQL = """
            SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
                   CAST((l_partkey*31 + l_suppkey*17) % 9999 + 1 AS BIGINT)
                       AS ps_availqty,
                   CAST((l_partkey*73 + l_suppkey*151) % 1000 + 1 AS BIGINT)
                       AS ps_supplycost
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp view: the synthetic schema has no partsupp
    table, so the four TPC-H shapes that need one (Q2/Q11/Q16/Q20)
    run against the distinct (l_partkey, l_suppkey) pairs observed in
    lineitem, with ps_availqty/ps_supplycost derived from the keys by
    pure integer arithmetic — deterministic and engine-identical, so
    the DuckDB oracle replays the exact same view (`_PARTSUPP_SQL`).
    Costs stay int64 (whole dollars 1..1000, qty 1..9999) so every
    min/sum/threshold downstream is exact on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    pk, sk = F.col("l_partkey"), F.col("l_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            pk.alias("ps_partkey"),
            sk.alias("ps_suppkey"),
            ((pk * 31 + sk * 17) % 9999 + 1).cast("long").alias("ps_availqty"),
            ((pk * 73 + sk * 151) % 1000 + 1).cast("long").alias("ps_supplycost"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier: for each LARGE size-15 part,
    the EUROPE supplier(s) at the regional minimum supply cost. The
    correlated MIN subquery is decorrelated into a per-part groupBy
    over the region-restricted partsupp and joined back on
    (part, cost) — equality on an exact int64 cost, so no float min
    can drop a tie. Supplier/nation/region dims broadcast; the only
    shuffle is the per-part min over the derived partsupp."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu_sup = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu_ps = ps.join(F.broadcast(eu_sup), F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = eu_ps.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        eu_ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            min_cost,
            (F.col("ps_partkey") == F.col("mk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_type",
            F.col("ps_supplycost").alias("supplycost"),
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey"
        )
        .limit(100)
    )


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: per-part inventory value within one
    nation, kept when above 0.01% of that nation's total. The HAVING
    threshold is the exact-integer rewrite value·10000 > total (costs
    and quantities are int64 in the derived view), so the global
    scalar subquery broadcasts one row and no float fraction is ever
    compared."""
    ps = _partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nps = ps.join(
        F.broadcast(
            sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey")
        ),
        F.col("ps_suppkey") == F.col("s_suppkey"),
    ).withColumn("val", F.col("ps_supplycost") * F.col("ps_availqty"))
    total = nps.agg(F.sum("val").alias("total_val"))
    return (
        nps.groupBy(F.col("ps_partkey").cast("long").alias("ps_partkey"))
        .agg(F.sum("val").cast("long").alias("part_value"))
        .crossJoin(F.broadcast(total))
        .where(F.col("part_value") * 10000 > F.col("total_val"))
        .select("ps_partkey", "part_value")
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship: distinct supplier count
    per (brand, type, size) bucket, excluding one brand, one type
    class, and "complaint" suppliers — adapted to this schema as
    s_acctbal < 0 (no comment column to grep). The exclusion list is
    a broadcast left-anti join; the distinct count shuffles once on
    the grouping key."""
    ps = _partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    bad_sup = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_sup),
            F.col("ps_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: NATION_3 suppliers holding
    excess stock (availqty > half of what they shipped in 1996) of
    'red %' parts. The correlated shipped-quantity SUM decorrelates
    into a per-(part, supplier) aggregate joined to partsupp — the
    same key the view is derived on, so AQE can co-locate both sides —
    and the half-threshold is the exact rewrite 2·availqty > sum_qty
    in decimal. NULL-sum pairs (nothing shipped in the window) drop
    via the inner join, matching the spec's NULL-comparison semantics.
    The surviving pair set reduces to a semi-join on supplier.

    Plan note (round 8): the red-part restriction is pushed BELOW
    both heavy shuffles — lineitem is broadcast-semi-joined to the
    red part keys BEFORE the partsupp-derivation distinct AND before
    the shipped aggregate, so both shuffles carry only the red slice
    (~1/#colors of the fact table) instead of the whole corpus.
    Value-identical: the partsupp derivation is per-key arithmetic,
    so deriving after the semi-join equals deriving first and joining
    red after (the previous shape, and still the oracle's)."""
    red_keys = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red %"))
        .select("p_partkey")
    )
    li_all = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(red_keys),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    ps = (
        li_all.select("l_partkey", "l_suppkey")
        .distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            (
                (F.col("l_partkey") * 31 + F.col("l_suppkey") * 17) % 9999 + 1
            ).cast("long").alias("ps_availqty"),
        )
    )
    li = li_all.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    dec = "decimal(12,2)"
    shipped = li.groupBy(
        F.col("l_partkey").alias("qk"), F.col("l_suppkey").alias("qs")
    ).agg(F.sum(F.col("l_quantity").cast(dec)).alias("sum_qty"))
    excess = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("qk"))
            & (F.col("ps_suppkey") == F.col("qs")),
        )
        .where(
            (F.lit(2) * F.col("ps_availqty")).cast(dec) > F.col("sum_qty")
        )
        .select("ps_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(excess, F.col("s_suppkey") == F.col("ps_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )


def q_dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion NEAR-dup dedup
    (operators/dedup.py::incremental_minhash_dedup): state = the
    MinHash signature table of already-seen docs (16 longs/doc,
    bounded — never shingles). Fixture: docs with doc_id%3==0 are
    seen; the incoming batch is every other doc PLUS lightly-edited
    resubmissions of seen docs (id+1e6, ' tail tail' appended — must
    be caught by the signature estimator, not an exact hash) and
    lightly-edited in-batch twins (id+2e6, ' x' appended — caught by
    in-batch pair dominance). Survivors return (id, mh0..mh15), the
    rows the caller appends to state."""
    docs = _t(spark, sf_dir, "documents")
    seen_docs = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    # cached: the operator consumes the state table twice (band keys +
    # estimator side); in production it's a cheap parquet read, here
    # it's a full shingle+minhash pipeline worth computing once
    seen_sigs = (
        scoped_cache(
            "entry.incremental_minhash.seen_sig",
            dd.minhash_signatures(
                dd.shingle_table(seen_docs, "doc_id", "text", 3), 16
            ).withColumnRenamed("id", "doc_id"),
        )
    )
    incoming = (
        docs.where(F.col("doc_id") % 3 != 0)
        .select("doc_id", "text")
        .unionByName(
            docs.where(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" tail tail")).alias("text"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 10 == 1).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" x")).alias("text"),
            )
        )
    )
    return dd.incremental_minhash_dedup(incoming, seen_sigs)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware train/val split: the 90/10 hash coin is thrown
    on the NEAR-DUP CLUSTER representative (connected components over
    exact 3-gram Jaccard ≥ 0.5 pairs; singletons represent
    themselves), so an entire near-dup family co-assigns — the
    strictly stronger form of group_split's exact-hash guard (A~B,
    B~C keeps A and C together even though their texts differ and
    never even met a band). Composition: pair emit → CC label
    propagation → left join (clusters table ≪ corpus) → pure-
    expression coin. Disjointness of splits per cluster is asserted
    by tests/test_sampling_split.py."""
    from annotation_service_spark.operators.curation import group_split

    docs = _t(spark, sf_dir, "documents")
    clusters = cl.connected_components(
        dd.ngram_jaccard_pairs(docs, ngram=3, threshold=0.5)
    )
    rep = docs.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
    )
    return group_split(rep, F.col("rep"), salt="lk1").select(
        "doc_id",
        F.col("split_group").cast("long").alias("split_group"),
        "split",
    )


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (8 subspaces × 16 codes, int64 ADC,
    top-16 candidates, exact float re-rank). Codebooks are the
    deterministic per-subspace fixed-point k-means
    (``pq_codebooks_from_parquet``), so the DuckDB oracle replays
    encode → LUT → ADC → re-rank from the same literals; the ADC
    candidate set is exact-integer, not slack-guarded."""
    books = sim.pq_codebooks_from_parquet(
        f"{sf_dir}/embeddings.parquet", m=8, codes=16, iterations=2
    )
    return sim.ann_pq_topk(
        _t(spark, sf_dir, "embeddings"), books, k=3, adc_top=16
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFADC composition,
    operators/similarity.py::ann_ivfpq_topk): rows coarse-assign to 8
    inverted lists, each query probes its 2 nearest lists, and the
    int64 ADC scan runs only over probed rows before the exact float
    re-rank — the billion-vector layout where neither the float
    vectors nor the full ADC scan is affordable. Assignment and probe
    order reuse ann_ivf_topk's rounded-distance argmin, codebooks/LUT
    reuse ann_pq_topk's exact-integer trainer, so the oracle replays
    the whole composition from literals."""
    cents = sim.ivf_centroids_from_parquet(
        f"{sf_dir}/embeddings.parquet", n_centroids=8, iterations=3
    )
    books = sim.pq_codebooks_from_parquet(
        f"{sf_dir}/embeddings.parquet", m=8, codes=16, iterations=2
    )
    return sim.ann_ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), cents, books,
        k=3, n_probe=2, adc_top=16,
    )


_STREAM_SINK_SEQ = iter(range(1_000_000))


def q_stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling rollup as event_rollup, executed under
    Structured Streaming: the events parquet becomes a file-stream
    source, tumbling_rollup's one query text runs unmodified as a
    streaming aggregation (the module's design point), an
    availableNow trigger drains it to a memory sink, and the
    finalized table is returned. Deterministic — the aggregate is a
    pure function of the closed input — so this is a HASH-verified
    streaming gate: the DuckDB oracle is the identical batch SQL
    (streaming ≡ batch on bounded input, Spark's own unification
    claim, here driver-checked)."""
    from annotation_service_spark.operators import rollup as ru

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file-stream source requires a DIRECTORY basePath; point it
    # at sf_dir and glob-filter down to the events file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # mirror sources/testdata.load_table: nanos arrive either as
    # bigint (legacy conf honored -> integer div to micros) or as
    # TIMESTAMP_NTZ (Spark 4 native nanos read, truncated) by engine
    # version — the batch gates read through the same branch
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("`ts` div 1000"))
        )
    agg = ru.tumbling_rollup(stream, window_width="1 hour", dims=("event_type",))
    name = f"stream_rollup_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def q_stream_hot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hot-line (boilerplate) detection, hash-verified
    (streaming/stateful.py::streaming_hot_lines): the documents
    parquet streams through the same deterministic 2-token line
    synthesis as the batch line gates, and a stateful per-line
    counter (two longs per distinct line) emits each normalized line
    ONCE when its cumulative occurrence count first exceeds 20. The
    emitted SET is a pure function of the input — batch boundaries
    move when a line reports, never whether — so the oracle is the
    closed-input occurrence count."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    words = F.split(F.col("text"), " ")
    lines_arr = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(words) / 2).cast("int") - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i * 2 + 1, 2)),
    )
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(F.explode(lines_arr).alias("line"))
        .select(
            F.trim(
                F.regexp_replace(F.lower(F.col("line")), r"\s+", " ")
            ).alias("norm")
        )
    )
    from annotation_service_spark.streaming.stateful import (
        streaming_hot_lines,
    )

    out = streaming_hot_lines(stream, threshold=20)
    name = f"stream_hot_lines_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("norm").distinct()


def q_stream_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming URL-level dedup, hash-verified: the url_dedup gate's
    synthesized URL column streams through ``canonical_url``
    (functions/url.py — a pure per-row expression, so it runs
    UNMODIFIED on the stream) and a streaming dropDuplicates keyed by
    the canonical form — the live-ingest twin of
    ``dedup_urls_keep_first`` (which survivor passes is batch-order
    dependent, so the gate pins the canonical SET, the deterministic
    projection of the operator's state — the stream_dedup_exact
    pattern). Oracle: the closed-input distinct canonical set."""
    from annotation_service_spark.functions.url import canonical_url

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(canonical_url(_synth_url()).alias("canonical_url"))
        .dropDuplicates(["canonical_url"])
    )
    name = f"stream_url_dedup_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("canonical_url").distinct()


def q_stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup, hash-verified: the documents parquet
    streams through md5-content hashing and a streaming
    dropDuplicates (the unbounded-state exact-dedup operator), and
    the surviving HASH SET is emitted — the set is a pure function of
    the input (which representative row survives is batch-order
    dependent, so the gate pins the deterministic projection of the
    operator's state, exactly what the incremental dedup state table
    stores). Oracle: the identical batch DISTINCT."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select(F.md5("text").alias("h"))
        .dropDuplicates(["h"])
    )
    name = f"stream_dedup_sink_{next(_STREAM_SINK_SEQ)}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("h").distinct()


def q_stream_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6, hash-verified — MULTI-BATCH and file-sinked (VERDICT r8
    #2/#4): the flagship annotate pipeline under Structured Streaming
    (handler/handler.go:194-243 — the reference annotates request
    batches as they ARRIVE OVER TIME, not as one closed batch). The
    events land as ≥3 parquet files and ``maxFilesPerTrigger=1``
    makes availableNow drain them as ≥3 micro-batches, exercising
    real trigger boundaries; the probe-IP projection and the fused
    parse/6to4/broadcast-binary-search range join run UNMODIFIED on
    the stream (stream-static: the ranges build is static and
    broadcast; stateless, so no watermark). The sink is a
    checkpointed PARQUET directory — nothing is pinned on the driver
    (the r8 memory-sink caveat is retired). Every step is a
    deterministic per-row transform, so streaming output ≡ the batch
    plan on the closed input — the oracle is the SAME SQL as the
    annotate gate. The mid-stream SNAPSHOT-SWAP variant of this
    pipeline (ST4 under load) is pinned by
    tests/test_stream_annotate_multibatch.py — a swap is inherently
    two-oracle, so it lives in pytest, not a single-oracle gate."""
    import shutil
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # one stable workspace per process; a prior run's result has been
    # consumed by the time a new run starts (same lifecycle the old
    # memory-sink cleanup relied on). The chunked INPUT is immutable
    # per source dir, so it is keyed by sf_dir and reused across the
    # bench's repeated runs; only sink+checkpoint reset per run.
    base = os.path.join(tempfile.gettempdir(), "spark_graft_stream_annotate")
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    in_dir = os.path.join(base, f"incoming-{key}")
    sink = os.path.join(base, "sink")
    ckpt = os.path.join(base, "ckpt")
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    ev_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not os.path.exists(os.path.join(in_dir, "_SUCCESS")):
        shutil.rmtree(in_dir, ignore_errors=True)
        # chunked file drops: ≥3 files → ≥3 micro-batches under
        # maxFilesPerTrigger=1 (availableNow honors per-trigger limits)
        ev_batch.repartition(3).write.parquet(in_dir)
    ev = (
        spark.readStream.schema(ev_batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    probes = _probe_ips(ev, _annotate_m_val(spark, sf_dir))
    annotated = _annotate_join(spark, sf_dir, probes)
    q = (
        annotated.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    if n_batches < 3:
        raise RuntimeError(
            f"stream_annotate drained in {n_batches} micro-batches; the "
            "gate's multi-batch claim requires >= 3"
        )
    return spark.read.parquet(sink)


def q_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (3 rounds,
    (count DESC, label ASC) tie-break) on the 3-gram-Jaccard ≥ 0.3
    near-dup graph — the community view (frequency beats minimum)
    next to dedup_clusters' reachability view. Oracle unrolls the
    same three rounds as chained CTEs."""
    from annotation_service_spark.operators.graph import lpa_communities

    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.3
    )
    return lpa_communities(pairs, rounds=3)


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the 3-gram-Jaccard ≥ 0.3 near-dup graph (the
    triangle_count edge relation): iterated degree peeling to a fixed
    point, surviving (id, degree). The oracle unrolls the same peel
    rounds as chained CTEs; the early-exit-at-fixed-point Spark loop
    is round-count-equivalent by absorption."""
    from annotation_service_spark.operators.graph import k_core

    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), ngram=3, threshold=0.3
    )
    return k_core(pairs, k=2, rounds=12)


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    importance weights of every document against the English subset
    as the target distribution, deterministic Gumbel-top-20%
    resampling. The whole chain — md5 feature hashing, add-one
    smoothed log-ratios, md5-uniform Gumbel noise, exact percentile
    threshold — is engine-portable and replayed verbatim by the
    DuckDB oracle."""
    docs = _t(spark, sf_dir, "documents")
    return cu.dsir_resample(docs, F.col("lang") == "en").withColumnRenamed(
        "id", "doc_id"
    )


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship annotate query on /root/testdata/sf0.001."""
    return q_annotate(spark, "/root/testdata/sf0.001")


DRIVER_WINDOW = 50  # the correctness driver hash-verifies the FIRST this-many


def _window_gates() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The exactly-DRIVER_WINDOW gates the r13 driver run verifies
    (rows + schema + value-hash vs the DuckDB oracle).  Composition,
    per VERDICT r12 item 1: the new r13 gate first, then the gates
    whose implementing source r13 code changes touch (blank-line
    exclusion + broadcast keep-first shape in the line family, URL
    percent-encoding normalization + parameterized tracker list,
    streaming hot-line TTL plumbing), then the FULL 33-gate cohort
    whose newest driver evidence was round 9, then a fill of the
    oldest round-10 gates (9 — the second new gate takes the tenth
    slot). `queries()` asserts the count so a rotation edit can never
    silently misplace the boundary."""
    return {
        # -- NEW round-13 operators --------------------------------------
        "web_pipeline_full": q_web_pipeline_full,
        "url_host_filter": q_url_host_filter,
        "html_extract": q_html_extract,
        "html_links": q_html_links,
        "html_pipeline": q_html_pipeline,
        "robots_filter": q_robots_filter,
        "sentence_dedup": q_sentence_dedup,
        "stream_sentence_dedup": q_stream_sentence_dedup,
        "kn_nll": q_kn_nll,
        "badword_filter": q_badword_filter,
        # -- touched by round-13 code (empty-norm exclusion + broadcast
        #    keep-first in curation.py, pct_normalize + tracker-param
        #    parameter in url.py, TTL in streaming_hot_lines) ----------
        "boilerplate_lines": q_boilerplate_lines,
        "line_dedup_keep_first": q_line_dedup_keep_first,
        "url_dedup": q_url_dedup,
        "stream_url_dedup": q_stream_url_dedup,
        "web_pipeline": q_web_pipeline,
        "stream_hot_lines": q_stream_hot_lines,
        # -- the 33 gates whose newest driver row was round 9 ----------
        "anti_join": q_anti_join,
        "attribution_join": q_attribution_join,
        "bigram_nll": q_bigram_nll,
        "bm25_rank": q_bm25_rank,
        "case_pivot": q_case_pivot,
        "cms_counts": q_cms_counts,
        "cohort_retention": q_cohort_retention,
        "corpus_diff": q_corpus_diff,
        "dedup_incremental": q_dedup_incremental,
        "distinct_users": q_distinct_users,
        "doc_chunks": q_doc_chunks,
        "doc_percentiles": q_doc_percentiles,
        "embedding_gram": q_embedding_gram,
        "event_cube": q_event_cube,
        "event_rollup": q_event_rollup,
        "event_rollup_hopping": q_event_rollup_hopping,
        "event_topk_windowed": q_event_topk_windowed,
        "first_touch": q_first_touch,
        "funnel": q_funnel,
        "gap_fill": q_gap_fill,
        "group_split": q_group_split,
        "grouping_sets": q_grouping_sets,
        "having_subquery": q_having_subquery,
        "incremental_rollup": q_incremental_rollup,
        "json_extract": q_json_extract,
        "knn_pagerank": q_knn_pagerank,
        "linear_interp": q_linear_interp,
        "pii_redact": q_pii_redact,
        "quality_quantile_mix": q_quality_quantile_mix,
        "rolling_avg": q_rolling_avg,
        "span_dedup": q_span_dedup,
        "span_dedup_apply": q_span_dedup_apply,
        "upsert_merge": q_upsert_merge,
        # -- fill: the oldest round-10 gates (4 slots ceded to the new
        #    r13 html/kn/badword gates — never-verified gates must sit
        #    in the window; the displaced r10 gates rejoin the backlog
        #    head at exactly the rotation horizon) ----------------------
        "pipeline_full": q_pipeline_full,
    }


def _backlog_gates() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Gates below the driver window — every one hash-green in an
    earlier round's CORRECTNESS_r*.json over since-unchanged source.
    Ordered oldest evidence first so the next rotation is a straight
    slice: the remaining round-10 gates head the r14 window, then the
    r11 cohort, then the gates the r12 driver verified (rotated out
    this round, freshest evidence)."""
    return {
        # -- remaining round-10 gates (head of the r14 rotation; the
        #    first four were displaced from the r13 fill by the new
        #    html/kn/badword gates) --------------------------------------
        "dedup_keep_best": q_dedup_keep_best,
        "leakage_safe_split": q_leakage_safe_split,
        "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
        "dedup_weighted_jaccard": q_dedup_weighted_jaccard,
        "stream_annotate": q_stream_annotate,
        "dedup_clusters": q_dedup_clusters,
        "dedup_containment": q_dedup_containment,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_winnow": q_dedup_winnow,
        "decontaminate_spans": q_decontaminate_spans,
        "nation_volume": q_nation_volume,
        "percentile_approx": q_percentile_approx,
        "posting_lists": q_posting_lists,
        "profile_approx": q_profile_approx,
        "profile_table": q_profile_table,
        "scalar_subquery": q_scalar_subquery,
        "scd_asof": q_scd_asof,
        "semi_join": q_semi_join,
        "set_ops": q_set_ops,
        "table_digest": q_table_digest,
        "temperature_mix": q_temperature_mix,
        "text_normalize": q_text_normalize,
        "tfidf_pairs": q_tfidf_pairs,
        "tpch_q6": q_tpch_q6,
        "tpch_q8": q_tpch_q8,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "trailing_window": q_trailing_window,
        "unigram_nll": q_unigram_nll,
        "unpivot_measures": q_unpivot_measures,
        "weighted_sample": q_weighted_sample,
        "weighted_sample_stratified": q_weighted_sample_stratified,
        "bloom_join": q_bloom_join,
        "cume_dist": q_cume_dist,
        "dedup_incremental_minhash": q_dedup_incremental_minhash,
        "dsir_resample": q_dsir_resample,
        "embedding_decontam": q_embedding_decontam,
        "epoch_shuffle": q_epoch_shuffle,
        "event_transitions": q_event_transitions,
        "filter_calibration": q_filter_calibration,
        "first_last_ignore_nulls": q_first_last_ignore_nulls,
        "fuzzy_match": q_fuzzy_match,
        "interval_overlap_join": q_interval_overlap_join,
        # -- the r11 cohort (rotated out of the r12 window) -------------
        "span_dedup_keep_first": q_span_dedup_keep_first,
        "geo_radius_join": q_geo_radius_join,
        "annotate_nearest_site": q_annotate_nearest_site,
        "kmeans_fixed": q_kmeans_fixed,
        "knn_pagerank_lsh": q_knn_pagerank_lsh,
        "mom_revenue": q_mom_revenue,
        "native_pivot": q_native_pivot,
        "ntile_deciles": q_ntile_deciles,
        "perceptron_filter": q_perceptron_filter,
        "pmi_collocations": q_pmi_collocations,
        "price_ranks": q_price_ranks,
        "robust_outliers": q_robust_outliers,
        "session_rollup": q_session_rollup,
        "source_kl": q_source_kl,
        "stats_agg": q_stats_agg,
        "stream_dedup_exact": q_stream_dedup_exact,
        "stream_rollup": q_stream_rollup,
        "tpch_q2": q_tpch_q2,
        "tpch_q4": q_tpch_q4,
        "tpch_q7": q_tpch_q7,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q17": q_tpch_q17,
        "tpch_q22": q_tpch_q22,
        "zorder_layout": q_zorder_layout,
        "annotate": q_annotate,
        "annotate_multisnapshot": q_annotate_multisnapshot,
        "asn_decode": q_asn_decode,
        "asof_select": q_asof_select,
        "corpus_curation": q_corpus_curation,
        "decontaminate": q_decontaminate,
        "dedup_exact": q_dedup_exact,
        "group_quantiles": q_group_quantiles,
        "heavy_hitters": q_heavy_hitters,
        "histogram": q_histogram,
        "interval_flatten": q_interval_flatten,
        "interval_merge": q_interval_merge,
        "kcore": q_kcore,
        "lang_id": q_lang_id,
        "legacy_annotate": q_legacy_annotate,
        # -- the r12 cohort (rotated out of the r13 window) -------------
        "token_budget_sample_tokens": q_token_budget_sample_tokens,
        "gopher_quality": q_gopher_quality,
        "c4_filter": q_c4_filter,
        "length_buckets": q_length_buckets,
        "token_budget_sample": q_token_budget_sample,
        "shared_passages": q_shared_passages,
        "multimodal_pipeline": q_multimodal_pipeline,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_weighted_minhash": q_dedup_weighted_minhash,
        "dedup_eval_report": q_dedup_eval_report,
        "dedup_eval_weighted": q_dedup_eval_weighted,
        "lpa_communities": q_lpa_communities,
        "merge_annotators": q_merge_annotators,
        "pack_chunks": q_pack_chunks,
        "range_lookup": q_range_lookup,
        "repetition_filter": q_repetition_filter,
        "response_keys": q_response_keys,
        "sessionize": q_sessionize,
        "skew_agg": q_skew_agg,
        "skew_join": q_skew_join,
        "stratified_sample": q_stratified_sample,
        "text_metrics": q_text_metrics,
        "topk_per_group": q_topk_per_group,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q9": q_tpch_q9,
        "tpch_q10": q_tpch_q10,
        "tpch_q13": q_tpch_q13,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "triangle_count": q_triangle_count,
        "vocab_topk": q_vocab_topk,
        "ann_gemm_topk": q_ann_gemm_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_quantized_topk": q_ann_quantized_topk,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "semantic_dedup": q_semantic_dedup,
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Gate registry.  ORDER MATTERS: the correctness driver verifies the
    FIRST DRIVER_WINDOW entries, so staleness rotation is done by editing
    `_window_gates` / `_backlog_gates`; the asserts below make a
    miscounted rotation fail every pytest run instead of silently
    shifting the boundary (VERDICT r10 nit 1)."""
    window = _window_gates()
    backlog = _backlog_gates()
    assert len(window) == DRIVER_WINDOW, (
        f"_window_gates must hold exactly {DRIVER_WINDOW} gates, "
        f"got {len(window)}"
    )
    dup = window.keys() & backlog.keys()
    assert not dup, f"gates listed in both window and backlog: {sorted(dup)}"
    return {**window, **backlog}


def _shingle_cte(n: int = 3) -> str:
    """Shared DuckDB CTE: distinct (id, word-n-gram shingle) pairs."""
    joins = "||' '||".join(f"ws[i+{j}]" for j in range(n))
    return f"""
        w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id AS id,
                   unnest(list_transform(range(1, len(ws)-{n - 2}), i -> {joins})) AS s
            FROM w WHERE len(ws) >= {n}
        )
    """


def _shingle_tf_cte(n: int = 3) -> str:
    """Shared DuckDB CTE: (id, shingle, tf) term frequencies — the
    multiset twin of _shingle_cte (no DISTINCT; occurrences counted)."""
    joins = "||' '||".join(f"ws[i+{j}]" for j in range(n))
    return f"""
        w AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM documents
        ),
        occ AS (
            SELECT doc_id AS id,
                   unnest(list_transform(range(1, len(ws)-{n - 2}), i -> {joins})) AS s
            FROM w WHERE len(ws) >= {n}
        ),
        tf AS (SELECT id, s, count(*) AS tf FROM occ GROUP BY 1, 2)
    """


def _weighted_minhash_oracle(
    num_hashes: int = 16, bands: int = 8, thr: float = 0.5, tf_cap: int = 8
) -> str:
    """DuckDB replay of ``weighted_minhash_pairs``: tf-expansion
    ("s#k" for k in 1..min(tf, cap)), the same md5/multiplicative
    minhash family and banding as _minhash_oracle, then the exact
    CAPPED weighted-jaccard verify from the tf relation."""
    from annotation_service_spark.operators.dedup import MOD_40, cw_constants

    r = num_hashes // bands
    mins = ", ".join(
        "min(({a}*h + {b}) % {p}) AS mh{i}".format(
            a=cw_constants(i)[0], b=cw_constants(i)[1], p=MOD_40, i=i
        )
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({parts}) AS bucket FROM sig".format(
            b=b,
            parts="||'|'||".join(f"mh{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    return f"""
        WITH {_shingle_tf_cte(3)},
        ctf AS (SELECT id, s, least(tf, {tf_cap}) AS ctf FROM tf),
        exp AS (
            SELECT id,
                   s || '#' || CAST(unnest(generate_series(1, ctf)) AS VARCHAR) AS s
            FROM ctf
        ),
        hw AS (
            SELECT id,
                   CAST('0x' || substr(md5(s), 1, 10) AS BIGINT) AS h
            FROM exp
        ),
        sig AS (SELECT id, {mins} FROM hw GROUP BY id),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.id < b.id
        ),
        wts AS (SELECT id, sum(ctf) AS wt FROM ctf GROUP BY 1),
        inter AS (
            SELECT c.id_a, c.id_b, sum(least(x.ctf, y.ctf)) AS i
            FROM cand c
            JOIN ctf x ON x.id = c.id_a
            JOIN ctf y ON y.id = c.id_b AND y.s = x.s
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(i AS DOUBLE)/(wa.wt + wb.wt - i) AS wjaccard
        FROM inter
        JOIN wts wa ON wa.id = id_a
        JOIN wts wb ON wb.id = id_b
        WHERE CAST(i AS DOUBLE)/(wa.wt + wb.wt - i) >= {thr}
    """


def _lpa_oracle(rounds: int = 3, thr: float = 0.3) -> str:
    """Unrolled synchronous-LPA replay of ``lpa_communities`` on the
    jaccard near-dup graph: same e0 edge CTEs as the kcore oracle,
    then ``rounds`` chained (neighbour-label count → (count DESC,
    label ASC) argmax) CTE pairs — the deterministic tie-break makes
    every round a pure function of the previous labels."""
    steps = []
    for i in range(1, rounds + 1):
        steps.append(
            f"n{i} AS (SELECT e.src AS id, l.label, count(*) AS c\n"
            f"         FROM e0 e JOIN l{i-1} l ON l.id = e.dst GROUP BY 1, 2),\n"
            f"l{i} AS MATERIALIZED (SELECT id, label FROM (\n"
            f"    SELECT id, label, row_number() OVER (\n"
            f"        PARTITION BY id ORDER BY c DESC, label) AS rn\n"
            f"    FROM n{i}) WHERE rn = 1)"
        )
    chain = ",\n".join(steps)
    return f"""
        WITH {_shingle_cte(3)},
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        prs AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY 1, 2
        ),
        je AS (
            SELECT id_a, id_b FROM prs
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= {thr}
        ),
        e0 AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM je
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM je
        ),
        l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS label FROM e0),
        {chain}
        SELECT id, CAST(label AS BIGINT) AS community FROM l{rounds}
    """


def _kcore_oracle(k: int = 2, rounds: int = 12, thr: float = 0.3) -> str:
    """Unrolled degree-peeling replay of ``k_core`` on the jaccard
    near-dup graph: e0 = the symmetric thresholded edge list, then
    ``rounds`` chained (degree → alive → filtered-edges) CTE
    triples — peeling is absorbing, so a converged Spark loop equals
    any ≥-convergence unroll."""
    # every e{i-1} is referenced twice (its degree table and its
    # filtered successor): MATERIALIZED stops DuckDB from inlining
    # the chain into 2^rounds copies of the base scan
    steps = []
    for i in range(1, rounds + 1):
        steps.append(
            f"d{i} AS (SELECT src, count(*) AS c FROM e{i-1} GROUP BY 1),\n"
            f"a{i} AS MATERIALIZED (SELECT src AS id FROM d{i} WHERE c >= {k}),\n"
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i-1} e\n"
            f"         JOIN a{i} s ON e.src = s.id\n"
            f"         JOIN a{i} t ON e.dst = t.id)"
        )
    chain = ",\n".join(steps)
    return f"""
        WITH {_shingle_cte(3)},
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        prs AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY 1, 2
        ),
        je AS (
            SELECT id_a, id_b FROM prs
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= {thr}
        ),
        e0 AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM je
            UNION ALL
            SELECT id_b AS src, id_a AS dst FROM je
        ),
        {chain}
        SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
        FROM e{rounds} GROUP BY 1
    """


def _minhash_oracle(num_hashes: int = 16, bands: int = 8, thr: float = 0.5) -> str:
    from annotation_service_spark.operators.dedup import MOD_40, cw_constants

    r = num_hashes // bands
    mins = ", ".join(
        "min(({a}*h + {b}) % {p}) AS mh{i}".format(
            a=cw_constants(i)[0], b=cw_constants(i)[1], p=MOD_40, i=i
        )
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT id, {b} AS band, md5({parts}) AS bucket FROM sig".format(
            b=b,
            parts="||'|'||".join(f"mh{b * r + j}" for j in range(r)),
        )
        for b in range(bands)
    )
    return f"""
        WITH {_shingle_cte(3)},
        hw AS (
            SELECT id,
                   CAST('0x' || substr(md5(s), 1, 10) AS BIGINT) AS h
            FROM sh
        ),
        sig AS (SELECT id, {mins} FROM hw GROUP BY id),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
            WHERE a.id < b.id
        ),
        sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        common AS (
            SELECT c.id_a, c.id_b, count(*) AS cnt
            FROM cand c
            JOIN sh x ON x.id = c.id_a
            JOIN sh y ON y.id = c.id_b AND y.s = x.s
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) AS jaccard
        FROM common
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= {thr}
    """


def _incremental_minhash_oracle(
    num_hashes: int = 16, bands: int = 8, need: int = 8
) -> str:
    """DuckDB replay of ``q_dedup_incremental_minhash``: signatures
    for the seen set and the synthesized incoming batch, band-bucket
    candidate joins, the minima-match Jaccard estimator (≥ need of
    num_hashes), vs-seen anti-join, then in-batch pair dominance."""
    from annotation_service_spark.operators.dedup import MOD_40, cw_constants

    r = num_hashes // bands
    mins = ", ".join(
        "min(({a}*h + {b}) % {p}) AS mh{i}".format(
            a=cw_constants(i)[0], b=cw_constants(i)[1], p=MOD_40, i=i
        )
        for i in range(num_hashes)
    )

    def bands_of(sig_src: str) -> str:
        return " UNION ALL ".join(
            "SELECT id, {b} AS band, md5({parts}) AS bucket FROM {src}".format(
                b=b,
                parts="||'|'||".join(f"mh{b * r + j}" for j in range(r)),
                src=sig_src,
            )
            for b in range(bands)
        )

    def sig_of(doc_src: str, tag: str) -> str:
        joins = "||' '||".join(f"ws[i+{j}]" for j in range(3))
        return f"""
        w_{tag} AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                               x -> x <> '') AS ws
            FROM {doc_src}
        ),
        sh_{tag} AS (
            SELECT DISTINCT doc_id AS id,
                   unnest(list_transform(range(1, len(ws)-1), i -> {joins})) AS s
            FROM w_{tag} WHERE len(ws) >= 3
        ),
        hw_{tag} AS (
            SELECT id, CAST('0x' || substr(md5(s), 1, 10) AS BIGINT) AS h
            FROM sh_{tag}
        ),
        sig_{tag} AS (SELECT id, {mins} FROM hw_{tag} GROUP BY id)"""

    match = " + ".join(
        f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
        for i in range(num_hashes)
    )
    out_cols = ", ".join(
        f"CAST(mh{i} AS BIGINT) AS mh{i}" for i in range(num_hashes)
    )
    return f"""
        WITH inc AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
            UNION ALL
            SELECT doc_id + 1000000, text || ' tail tail'
            FROM documents WHERE doc_id % 6 = 0
            UNION ALL
            SELECT doc_id + 2000000, text || ' x'
            FROM documents WHERE doc_id % 10 = 1
        ),
        seen_src AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        ),
        {sig_of('inc', 'n')},
        {sig_of('seen_src', 's')},
        bands_n AS ({bands_of('sig_n')}),
        bands_s AS ({bands_of('sig_s')}),
        cand AS (
            SELECT DISTINCT n.id AS new_id, s.id AS seen_id
            FROM bands_n n JOIN bands_s s
              ON n.band = s.band AND n.bucket = s.bucket
        ),
        dup1 AS (
            SELECT DISTINCT cand.new_id AS id
            FROM cand
            JOIN sig_n a ON a.id = cand.new_id
            JOIN sig_s b ON b.id = cand.seen_id
            WHERE {match} >= {need}
        ),
        fresh AS (
            SELECT * FROM sig_n WHERE id NOT IN (SELECT id FROM dup1)
        ),
        bands_f AS ({bands_of('fresh')}),
        bpairs AS (
            SELECT DISTINCT x.id AS id_a, y.id AS id_b
            FROM bands_f x JOIN bands_f y
              ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
        ),
        dominated AS (
            SELECT DISTINCT bpairs.id_b AS id
            FROM bpairs
            JOIN fresh a ON a.id = bpairs.id_a
            JOIN fresh b ON b.id = bpairs.id_b
            WHERE {match} >= {need}
        )
        SELECT CAST(id AS BIGINT) AS id, {out_cols}
        FROM fresh WHERE id NOT IN (SELECT id FROM dominated)
    """


def _simhash_oracle(
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 2,
    probe_bits: int = 0,
) -> str:
    votes = []
    for j in range(bits):
        nib = f"(strpos('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1)"
        bit = f"((({nib} >> {3 - (j % 4)}) & 1) * 2 - 1)"
        votes.append(
            f"CASE WHEN list_sum(list_transform(hs, h -> {bit})) > 0"
            f" THEN {1 << (bits - 1 - j)} ELSE 0 END"
        )
    sh_expr = " + ".join(votes)
    bpb = bits // bands
    mask = (1 << bpb) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT id, {b} AS band, (sh >> {(bands - 1 - b) * bpb}) & {mask} AS key, sh FROM sig"
        for b in range(bands)
    )
    return f"""
        WITH {_shingle_cte(3)},
        hsh AS (SELECT id, list(md5(s)) AS hs FROM sh GROUP BY id),
        sig AS (SELECT id, CAST({sh_expr} AS BIGINT) AS sh FROM hsh),
        bands AS ({band_selects}),
        probes(pb) AS (VALUES {_probe_values_sql(bpb, probe_bits)}),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
            FROM bands a CROSS JOIN probes pr
            JOIN bands b ON a.band = b.band AND xor(a.key, pr.pb) = b.key
            WHERE a.id < b.id
        )
        SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
    """


def _oracle_sf_dir() -> str:
    """The sf dir the driver's DuckDB oracle runs against (contract:
    sf0.01). Data-dependent oracle literals (IVF centroids, embedding
    dim) are derived from these files."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _oracle_embedding_dim() -> int:
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{_oracle_sf_dir()}/embeddings.parquet", columns=["embedding"]
    )
    return len(t.column("embedding")[0])


def _cos6(a: str, b: str) -> str:
    """Round-6 cosine between two DOUBLE[] columns — same sequential
    arithmetic as the Spark dim-unrolled expression."""
    d = f"list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]))"
    na = f"sqrt(list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]*{a}[i])))"
    nb = f"sqrt(list_sum(list_transform(range(1, len({b})+1), i -> {b}[i]*{b}[i])))"
    return f"round({d} / ({na} * {nb}), 6)"


_ANN_RERANK = f"""
        s AS (
            SELECT cand.qid, cand.nid, {_cos6('qv.e', 'cv.e')} AS cos
            FROM cand
            JOIN v qv ON qv.vec_id = cand.qid
            JOIN v cv ON cv.vec_id = cand.nid
        )
        SELECT qid, nid, cos
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        WHERE rn <= 3
"""

_V_CTE = """
        v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        )
"""


def _ann_cosine_oracle(k: int = 3) -> str:
    return f"""
        WITH {_V_CTE},
        q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % 50 = 0),
        s AS (
            SELECT qid, v.vec_id AS nid, {_cos6('qe', 'v.e')} AS cos
            FROM q, v WHERE v.vec_id <> qid
        )
        SELECT qid, nid, cos
        FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
        WHERE rn <= {k}
    """


def _pq_oracle(
    k: int = 3,
    m: int = 8,
    codes: int = 16,
    iterations: int = 2,
    adc_top: int = 16,
    scale: int = 1_000_000,
    n_centroids: int | None = None,
    n_probe: int = 2,
) -> str:
    """DuckDB replay of ``ann_pq_topk``: codebook + query-LUT literals
    from the sequential trainer (bit-identical by exact-int64
    construction), fixed-point encode via per-subspace argmin
    (first-min tie-break = ORDER BY dist, j), integer ADC sum,
    (adc desc, nid) top-``adc_top`` candidates, exact round-6 cosine
    re-rank — every approximate step is exact integer arithmetic, so
    the candidate set cannot drift between engines.

    With ``n_centroids`` set, replays the IVF-PQ composition instead
    (``ann_ivfpq_topk``): the _ivf_oracle assignment/probe CTEs
    (1e-6-rounded distances, first-min tie-break) restrict the ADC
    join to rows whose inverted list the query probes."""
    import numpy as np
    import pyarrow.parquet as pq

    from annotation_service_spark.operators.similarity import (
        pq_codebooks_from_parquet,
    )

    path = f"{_oracle_sf_dir()}/embeddings.parquet"
    books = pq_codebooks_from_parquet(path, m, codes, iterations, scale)
    t = (
        pq.read_table(path, columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    qpdf = t[t["vec_id"] % 50 == 0]
    qids = qpdf["vec_id"].to_numpy(dtype=np.int64)
    qm = np.vstack(qpdf["embedding"].to_numpy()).astype(np.float64)
    qq = np.floor(qm * scale).astype(np.int64)
    cb = np.asarray(books, dtype=np.int64)
    dim = qq.shape[1]
    sub = dim // m
    lut = np.einsum("qsd,sjd->qsj", qq.reshape(len(qids), m, sub), cb)

    cb_rows = ", ".join(
        "({s}, {j}, [{vals}])".format(
            s=s, j=j, vals=", ".join(str(int(x)) for x in books[s][j])
        )
        for s in range(m)
        for j in range(codes)
    )
    lut_rows = ", ".join(
        f"({int(qids[qi])}, {s}, {j}, {int(lut[qi, s, j])})"
        for qi in range(len(qids))
        for s in range(m)
        for j in range(codes)
    )
    ivf_ctes = ""
    adc_ivf_joins = ""
    if n_centroids is not None:
        from annotation_service_spark.operators.similarity import (
            ivf_centroids_from_parquet,
        )

        cents = ivf_centroids_from_parquet(path, n_centroids, 3)
        c = np.asarray(cents, dtype=np.float64)
        ccv = (c * c).sum(axis=1)
        cent_rows = ", ".join(
            "({cid}, {cc}, [{vals}])".format(
                cid=i, cc=repr(float(ccv[i])),
                vals=", ".join(repr(float(x)) for x in cents[i]),
            )
            for i in range(n_centroids)
        )
        ivf_ctes = f"""
        cents(cid, cc, c) AS (VALUES {cent_rows}),
        cd AS (
            SELECT v.vec_id, ct.cid,
                   floor((ct.cc - 2 * list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i] * ct.c[i]))) * 1000000 + 0.5) AS dist
            FROM v CROSS JOIN cents ct
        ),
        cranked AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM cd
        ),
        cassign AS (SELECT vec_id, cid FROM cranked WHERE rn = 1),
        qprobe AS (
            SELECT vec_id AS qid, cid FROM cranked
            WHERE vec_id % 50 = 0 AND rn <= {n_probe}
        ),"""
        adc_ivf_joins = """
            JOIN cassign a ON a.vec_id = e.vec_id
            JOIN qprobe qp ON qp.cid = a.cid AND qp.qid = l.qid"""
    return f"""
        WITH {_V_CTE.strip().rstrip()},
        qv AS MATERIALIZED (
            SELECT vec_id,
                   list_transform(e, x -> CAST(floor(x * {scale}) AS BIGINT)) AS q
            FROM v
        ),
        {ivf_ctes}
        cb(s, j, cv) AS (VALUES {cb_rows}),
        lut(qid, s, code, ip) AS (VALUES {lut_rows}),
        enc AS MATERIALIZED (
            SELECT vec_id, s, j AS code FROM (
                SELECT qv.vec_id, cb.s, cb.j,
                       row_number() OVER (
                           PARTITION BY qv.vec_id, cb.s
                           ORDER BY list_sum(list_transform(range(1, {sub + 1}),
                               i -> (q[cb.s*{sub} + i] - cv[i])
                                  * (q[cb.s*{sub} + i] - cv[i]))), cb.j
                       ) AS rk
                FROM qv CROSS JOIN cb
            ) WHERE rk = 1
        ),
        adc AS (
            SELECT l.qid, e.vec_id AS nid, sum(l.ip) AS adc
            FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code{adc_ivf_joins}
            WHERE e.vec_id <> l.qid
            GROUP BY 1, 2
        ),
        cand AS (
            SELECT qid, nid FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY adc DESC, nid) AS rn
                FROM adc
            ) WHERE rn <= {adc_top}
        ),
        q2 AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % 50 = 0),
        s2 AS (
            SELECT c.qid, c.nid, {_cos6('qe', 'v.e')} AS cos
            FROM cand c
            JOIN q2 ON q2.qid = c.qid
            JOIN v ON v.vec_id = c.nid
        )
        SELECT qid, nid, cos FROM (
            SELECT *, row_number() OVER (
                PARTITION BY qid ORDER BY cos DESC, nid) AS rn
            FROM s2
        ) WHERE rn <= {k}
    """


def _probe_values_sql(bpb: int, probe_bits: int) -> str:
    """SQL literal list of xor-masks for multi-probe band keys:
    [0] for exact-only, [0, 1, 2, 4, ...] for hamming-1 probing."""
    masks = [0] + ([1 << j for j in range(bpb)] if probe_bits else [])
    return ", ".join(f"({m})" for m in masks)


def _lsh_cand_ctes(
    n_planes: int,
    bands: int,
    seed: int,
    queries_where: str | None,
    probe_bits: int = 0,
) -> str:
    """Shared CTE chain (v → planes → proj → sig → bands → cand) of
    the LSH replays: hyperplane literals, signature = sum of
    bit-weights where the projection is positive, band keys by
    shift+mask, candidates by band equi-join (query side expanded
    with xor probe masks when ``probe_bits=1``). ``queries_where``
    restricts the query side (None = every vector is a query, the
    k-NN-graph regime). repr() round-trips each float64 exactly."""
    from annotation_service_spark.operators.similarity import _hyperplanes

    dim = _oracle_embedding_dim()
    planes = _hyperplanes(dim, n_planes, seed)
    plane_rows = ", ".join(
        "({w}, [{vals}])".format(
            w=1 << (n_planes - 1 - i),
            vals=", ".join(repr(float(x)) for x in planes[i]),
        )
        for i in range(n_planes)
    )
    bpb = n_planes // bands
    mask = (1 << bpb) - 1
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {b} AS band, (sig >> {(bands - 1 - b) * bpb}) & {mask} AS key FROM sig"
        for b in range(bands)
    )
    qwhere = f"WHERE {queries_where}" if queries_where else ""
    qb = f"""SELECT DISTINCT vec_id, band, xor(key, pr.pb) AS key
             FROM bands CROSS JOIN probes pr {qwhere}"""
    return f"""{_V_CTE},
        probes(pb) AS (VALUES {_probe_values_sql(bpb, probe_bits)}),
        planes(w, p) AS (VALUES {plane_rows}),
        proj AS (
            SELECT v.vec_id, pl.w,
                   list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i] * pl.p[i])) AS pr
            FROM v CROSS JOIN planes pl
        ),
        sig AS (
            SELECT vec_id, CAST(SUM(CASE WHEN pr > 0 THEN w ELSE 0 END) AS BIGINT) AS sig
            FROM proj GROUP BY vec_id
        ),
        bands AS ({band_selects}),
        qb AS ({qb}),
        cand AS (
            SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
            FROM bands c JOIN qb q ON c.band = q.band AND c.key = q.key
            WHERE c.vec_id <> q.vec_id
        )"""


def _lsh_oracle(
    n_planes: int = 16,
    bands: int = 8,
    k: int = 3,
    seed: int = 7,
    probe_bits: int = 0,
) -> str:
    """DuckDB replay of ``ann_lsh_topk`` (query side = vec_id % 50),
    exact round-6 cosine re-rank of the (probed) banded candidates."""
    return f"""
        WITH {_lsh_cand_ctes(n_planes, bands, seed, "vec_id % 50 = 0", probe_bits)},
        {_ANN_RERANK.replace('rn <= 3', f'rn <= {k}')}
    """


def _semdedup_oracle(
    k: int = 8,
    iterations: int = 2,
    thr_num: int = 17,
    thr_den: int = 20,
) -> str:
    """DuckDB replay of ``semantic_dedup``: final-centroid literals
    from the sequential numpy k-means replica (same independence
    argument as _kmeans_oracle), first-min assignment, the int8
    quantization of _quantized_ann_oracle, and the pure-integer
    within-cluster cosine test d²·dot² ≥ n²·‖a‖²·‖b‖² — every step
    bit-identical across engines."""
    from annotation_service_spark.operators.clustering import (
        FIXED_SCALE,
        kmeans_fixed_reference,
    )

    cents = kmeans_fixed_reference(
        f"{_oracle_sf_dir()}/embeddings.parquet", k, iterations
    )
    dim = len(cents[0])
    cent_rows = ", ".join(
        "({j}, [{vals}])".format(
            j=j, vals=", ".join(str(int(x)) for x in c)
        )
        for j, c in enumerate(cents)
    )
    n2 = thr_num * thr_num
    d2 = thr_den * thr_den
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {FIXED_SCALE})
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        c(j, cv) AS (VALUES {cent_rows}),
        d AS (
            SELECT vec_id, j,
                   list_sum(list_transform(range(1, {dim + 1}),
                       i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))) AS dist
            FROM q, c
        ),
        asg AS (
            SELECT vec_id, j AS cl FROM (
                SELECT vec_id, j,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, j) AS rk
                FROM d
            ) WHERE rk = 1
        ),
        {_V_CTE.strip().rstrip()},
        am AS (
            SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) AS amax
            FROM v
        ),
        qq AS (
            SELECT vec_id,
                   CASE WHEN amax > 0
                        THEN list_transform(
                            e, x -> CAST(round(x / (amax / 127.0)) AS BIGINT))
                        ELSE list_transform(e, x -> CAST(0 AS BIGINT))
                   END AS q8
            FROM am
        ),
        f AS (
            SELECT asg.vec_id, asg.cl, qq.q8,
                   CAST(list_sum(list_transform(range(1, {dim + 1}),
                        i -> qq.q8[i] * qq.q8[i])) AS BIGINT) AS nrm
            FROM asg JOIN qq ON qq.vec_id = asg.vec_id
        ),
        pd AS (
            SELECT fa.vec_id AS id_a, fb.vec_id AS id_b,
                   fa.nrm AS na, fb.nrm AS nb,
                   CAST(list_sum(list_transform(range(1, {dim + 1}),
                        i -> fa.q8[i] * fb.q8[i])) AS BIGINT) AS dot
            FROM f fa JOIN f fb
              ON fa.cl = fb.cl AND fa.vec_id < fb.vec_id
        ),
        dropped AS (
            SELECT DISTINCT id_b
            FROM pd
            WHERE dot >= 0 AND {d2}*dot*dot >= {n2}*na*nb
              AND na > 0 AND nb > 0
        )
        SELECT asg.vec_id,
               CAST(asg.cl AS INTEGER) AS cluster_id,
               (dropped.id_b IS NULL) AS keep
        FROM asg LEFT JOIN dropped ON dropped.id_b = asg.vec_id
    """


def _embedding_decontam_oracle(threshold: float = 0.45) -> str:
    """DuckDB replay of ``q_embedding_decontam``: exact round-6
    cosine of every corpus vector against every benchmark vector,
    aggregated to (n_hits, max_cos, contaminated)."""
    return f"""
        WITH {_V_CTE},
        b AS (SELECT vec_id AS bid, e AS be FROM v WHERE vec_id % 50 = 0),
        c AS (SELECT vec_id AS id, e AS ce FROM v WHERE vec_id % 50 <> 0),
        s AS (
            SELECT c.id, {_cos6('c.ce', 'b.be')} AS cos
            FROM c CROSS JOIN b
        )
        SELECT id,
               CAST(SUM(CASE WHEN cos >= {threshold} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               MAX(cos) AS max_cos,
               MAX(cos) >= {threshold} AS contaminated
        FROM s GROUP BY id
    """


def _quantized_ann_oracle(
    n_planes: int = 60,
    bands: int = 4,
    k: int = 3,
    seed: int = 7,
    probe_bits: int = 1,
) -> str:
    """DuckDB replay of ``ann_quantized_topk``: probed LSH candidates,
    then symmetric int8 quantization (scale = max|x|/127, round
    half-away — both engines' double round) and the EXACT integer dot
    re-rank. Every arithmetic step is either bit-identical double ops
    or integer ops, so the gate hash-checks the full composition."""
    return f"""
        WITH {_lsh_cand_ctes(n_planes, bands, seed, "vec_id % 50 = 0", probe_bits)},
        am AS (
            SELECT vec_id, e,
                   list_max(list_transform(e, x -> abs(x))) AS amax
            FROM v
        ),
        qq AS (
            SELECT vec_id,
                   CASE WHEN amax > 0
                        THEN list_transform(
                            e, x -> CAST(round(x / (amax / 127.0)) AS BIGINT))
                        ELSE list_transform(e, x -> CAST(0 AS BIGINT))
                   END AS qv
            FROM am
        ),
        s AS (
            SELECT cand.qid, cand.nid,
                   CAST(list_sum(list_transform(
                        range(1, len(qa.qv) + 1),
                        i -> qa.qv[i] * qb.qv[i])) AS BIGINT) AS qdot
            FROM cand
            JOIN qq qa ON qa.vec_id = cand.qid
            JOIN qq qb ON qb.vec_id = cand.nid
        )
        SELECT qid, nid, qdot
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY qid ORDER BY qdot DESC, nid) AS rn FROM s)
        WHERE rn <= {k}
    """


def _pagerank_lsh_oracle(
    n_planes: int = 16,
    bands: int = 8,
    k: int = 3,
    iterations: int = 3,
    seed: int = 7,
    probe_bits: int = 0,
) -> str:
    """FULLY independent DuckDB replay of the SCALE path
    ``knn_pagerank(method="lsh")``: LSH-banded candidate edges with
    EVERY vector as a query (the collect-free k-NN-graph build),
    exact cosine re-rank to top-k edges, then the integer PageRank
    recurrence unrolled one CTE per iteration — the same replay
    structure as ``_pagerank_oracle`` but over the approximate edge
    set, so the driver now hash-checks the 100 TB composition, not
    just the GEMM oracle regime."""
    damping, scale = 85, 1_000_000
    base = ((100 - damping) * scale) // 100
    cte = [
        f"""{_lsh_cand_ctes(n_planes, bands, seed, None, probe_bits)},
        sc AS (
            SELECT cand.qid, cand.nid, {_cos6('qv.e', 'cv.e')} AS cos
            FROM cand
            JOIN v qv ON qv.vec_id = cand.qid
            JOIN v cv ON cv.vec_id = cand.nid
        ),
        e AS (
            SELECT qid AS src, nid AS dst FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY cos DESC, nid) AS rn
                FROM sc) WHERE rn <= {k}
        ),
        deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
                FROM e GROUP BY 1),
        n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        s0 AS (SELECT node, CAST({scale} AS BIGINT) AS score FROM n)"""
    ]
    for i in range(iterations):
        cte.append(f"""
        s{i + 1} AS (
            SELECT n.node,
                   CAST({base} + ({damping} * COALESCE(t.m, 0)) // 100
                        AS BIGINT) AS score
            FROM n LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(SUM(s{i}.score // deg.deg) AS BIGINT) AS m
                FROM e
                JOIN s{i} ON s{i}.node = e.src
                JOIN deg ON deg.src = e.src
                GROUP BY 1) t ON t.node = n.node)""")
    return (
        "WITH "
        + ",".join(cte)
        + f"""
        SELECT node AS vec_id, CAST(score AS BIGINT) AS pr_score
        FROM s{iterations}"""
    )


def _bm25_oracle() -> str:
    """DuckDB replay of ``bm25_rank``: the corpus statistics come
    from an independent sequential tokenizer over the oracle parquet
    (``bm25_stats_reference``), so the gate pins Spark's distributed
    pass-1 stats (equal ints ⇒ bit-equal literals) and the pass-2
    arithmetic (identical literal-for-literal double ops)."""
    from annotation_service_spark.operators.ranking import (
        bm25_oracle_select,
        bm25_stats_reference,
    )

    stats = bm25_stats_reference(
        f"{_oracle_sf_dir()}/documents.parquet", BM25_TERMS
    )
    return bm25_oracle_select(BM25_TERMS, stats)


def _kmeans_oracle(k: int = 8, iterations: int = 2) -> str:
    """DuckDB replay of the FINAL k-means assignment using centroid
    literals from the sequential numpy replica
    (``kmeans_fixed_reference`` — an independent implementation of
    the same exact-int64 algorithm). If any of the distributed
    iterations diverged by even one integer, the final centroids,
    inertia, and cluster sizes here would not match."""
    from annotation_service_spark.operators.clustering import (
        FIXED_SCALE,
        kmeans_fixed_reference,
    )

    cents = kmeans_fixed_reference(
        f"{_oracle_sf_dir()}/embeddings.parquet", k, iterations
    )
    dim = len(cents[0])
    cent_rows = ", ".join(
        "({j}, [{vals}], {s})".format(
            j=j, vals=", ".join(str(int(x)) for x in c), s=int(sum(c))
        )
        for j, c in enumerate(cents)
    )
    return f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * {FIXED_SCALE})
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        c(j, cv, csum) AS (VALUES {cent_rows}),
        d AS (
            SELECT vec_id, j, csum,
                   list_sum(list_transform(range(1, {dim + 1}),
                       i -> (qv[i] - cv[i]) * (qv[i] - cv[i]))) AS dist
            FROM q, c
        ),
        a AS (
            SELECT vec_id, j, dist, csum,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, j) AS rk
            FROM d
        )
        SELECT CAST(j AS INTEGER) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(dist) AS BIGINT) AS inertia,
               CAST(csum AS BIGINT) AS c_sum
        FROM a WHERE rk = 1
        GROUP BY j, csum
    """


def _ivf_oracle(n_centroids: int = 8, n_probe: int = 3, k: int = 3) -> str:
    """DuckDB replay of ``ann_ivf_topk`` with the SAME deterministic
    centroids the gate query uses (shared helper reads the oracle
    parquet): distance cc − 2·v·c with cc as a literal, assignment =
    first-min by (dist, cid), probes = n_probe smallest by the same
    order, candidates via inverted-list equi-join, exact re-rank.

    Distances are fixed-rounded to 1e-6 on BOTH sides before the
    argmin/argsort (matching ``_nearest_centroid``), so the BLAS-vs-
    sequential summation-order ulps cannot flip an assignment and
    residual true ties break toward the lower centroid id on both
    engines (closes the near-tie flakiness seen at sf0.1)."""
    import numpy as np

    from annotation_service_spark.operators.similarity import (
        ivf_centroids_from_parquet,
    )

    cents = ivf_centroids_from_parquet(
        f"{_oracle_sf_dir()}/embeddings.parquet", n_centroids, 3
    )
    c = np.asarray(cents, dtype=np.float64)
    cc = (c * c).sum(axis=1)
    cent_rows = ", ".join(
        "({cid}, {cc}, [{vals}])".format(
            cid=i, cc=repr(float(cc[i])),
            vals=", ".join(repr(float(x)) for x in cents[i]),
        )
        for i in range(n_centroids)
    )
    return f"""
        WITH {_V_CTE},
        cents(cid, cc, c) AS (VALUES {cent_rows}),
        d AS (
            SELECT v.vec_id, ct.cid,
                   floor((ct.cc - 2 * list_sum(list_transform(range(1, len(v.e)+1), i -> v.e[i] * ct.c[i]))) * 1000000 + 0.5) AS dist
            FROM v CROSS JOIN cents ct
        ),
        ranked AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM d
        ),
        assign AS (SELECT vec_id, cid FROM ranked WHERE rn = 1),
        qprobe AS (
            SELECT vec_id AS qid, cid FROM ranked
            WHERE vec_id % 50 = 0 AND rn <= {n_probe}
        ),
        cand AS (
            SELECT DISTINCT q.qid, a.vec_id AS nid
            FROM qprobe q JOIN assign a ON a.cid = q.cid
            WHERE a.vec_id <> q.qid
        ),
        {_ANN_RERANK.replace('rn <= 3', f'rn <= {k}')}
    """


def _legacy_oracle() -> str:
    """VALUES-table replay of q_legacy_annotate: the converted ranges
    come from the same deterministic fixture + pure-Python enumerator
    (which pytest validates against the reference's binary fixture);
    probes and the BETWEEN join are recomputed independently."""
    from annotation_service_spark.sources import legacy_dat as ld

    rows = []
    for r in ld.enumerate_dat(ld.build_dat(ld.demo_fixture_networks())):
        lo = int.from_bytes(r["ip_low"][-4:], "big")
        hi = int.from_bytes(r["ip_high"][-4:], "big")
        rows.append(
            f"({lo}, {hi}, '{r['country_code']}', '{r['city']}',"
            f" {r['metro_code']}, {r['area_code']})"
        )
    vals = ", ".join(rows)
    k = "(user_id*131 + event_id*7919)"
    return f"""
        WITH ranges(low, high, country_code, city, metro_code, area_code)
          AS (VALUES {vals}),
        probes AS (
            SELECT event_id,
                   CAST(CASE
                     WHEN event_id % 4 = 0 THEN {207 * 2**24 + 171 * 2**16} + {k} % 65536
                     WHEN event_id % 4 = 1 THEN {10 * 2**24} + {k} % {1 << 24}
                     WHEN event_id % 4 = 2 THEN {192 * 2**24 + 2 * 2**8} + {k} % 256
                     ELSE {8 * 2**24} + {k} % 65536
                   END AS BIGINT) AS v
            FROM events
        )
        SELECT p.event_id, p.v,
               COALESCE(r.country_code, 'MISS') AS country_code,
               COALESCE(r.city, '') AS city,
               CAST(COALESCE(r.metro_code, -1) AS BIGINT) AS metro_code,
               CAST(COALESCE(r.area_code, -1) AS BIGINT) AS area_code
        FROM probes p LEFT JOIN ranges r ON p.v BETWEEN r.low AND r.high
    """


_PERCEPTRON_CTES = """tok AS (
                SELECT doc_id, unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')) AS token
                FROM documents
            ),
            feat AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5('pc|' || token), 1, 8)
                            AS BIGINT) % 64 AS b,
                       CAST(count(*) AS BIGINT) AS x
                FROM tok GROUP BY 1, 2
                UNION ALL
                SELECT doc_id, CAST(64 AS BIGINT), CAST(1 AS BIGINT)
                FROM documents
            ),
            lab AS (
                SELECT doc_id,
                       CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
                FROM documents
            ),
            w1 AS (
                SELECT b, SUM(x * y) AS w
                FROM feat JOIN lab USING (doc_id) GROUP BY 1
            ),
            s1 AS (
                SELECT doc_id, SUM(x * w) AS s
                FROM feat JOIN w1 USING (b) GROUP BY 1
            ),
            miss1 AS (
                SELECT doc_id, y FROM s1 JOIN lab USING (doc_id)
                WHERE y * s <= 0
            ),
            d2 AS (
                SELECT b, SUM(x * y) AS dw
                FROM feat JOIN miss1 USING (doc_id) GROUP BY 1
            ),
            w2 AS (
                SELECT w1.b, w1.w + COALESCE(d2.dw, 0) AS w
                FROM w1 LEFT JOIN d2 ON w1.b = d2.b
            ),
            s2 AS (
                SELECT doc_id, SUM(x * w) AS s
                FROM feat JOIN w2 USING (b) GROUP BY 1
            )
"""


# Shared URL-oracle building blocks — ONE definition each for the
# synthesized URL column (the Spark twin is `_synth_url`) and the
# canonicalization chain (the Spark twin is functions/url.py::
# canonical_url), so the four URL gates can never drift apart.
_URL_SYNTH_CASE = """CASE WHEN doc_id % 3 = 0 THEN
                'HTTPS://Site' || (doc_id % 7) || '.COM:443/Page%7E/'
                || (doc_id % 11) || '?utm_source=x&b=2&a=1#frag'
            WHEN doc_id % 3 = 1 THEN
                'https://site' || (doc_id % 7) || '.com/Page~/'
                || (doc_id % 11) || '?a=1&b=2'
            ELSE 'http://user:pw@Host' || (doc_id % 7)
                 || '.org:80/%2fx%41'
       END"""

# the rebuilt canonical string over the p4 CTE's columns
_URL_CANON_KEY = (
    "scheme || '://' || host || path "
    "|| CASE WHEN qs <> '' THEN '?' || qs ELSE '' END"
)


def _url_canon_ctes(src: str = "u") -> str:
    """DuckDB CTE chain p0..p4 replaying functions/url.py::
    canonical_url over %SRC%(doc_id, url): p0 = RFC 3986 §6.2.2
    percent normalization (uppercase hex, decode unreserved), p1-p4 =
    scheme/authority/path/query parsing, default-port + userinfo +
    fragment + tracker-param drop, query sort. Splice into a WITH
    list; the canonical string is `_URL_CANON_KEY` over p4."""
    return """
            p0 AS (
                SELECT doc_id,
                       CASE WHEN len(string_split(url, '%')) = 1 THEN url
                            ELSE string_split(url, '%')[1] || array_to_string(
                                list_transform(string_split(url, '%')[2:], p ->
                                    CASE WHEN NOT regexp_matches(
                                             substr(p, 1, 2),
                                             '^[0-9A-Fa-f]{2}$')
                                         THEN '%' || p
                                         ELSE list_transform(
                                             [CAST(
                                               (strpos('0123456789abcdef',
                                                  lower(substr(p, 1, 1))) - 1)
                                               * 16
                                               + strpos('0123456789abcdef',
                                                  lower(substr(p, 2, 1))) - 1
                                              AS INT)],
                                             c -> CASE WHEN
                                                    (c BETWEEN 48 AND 57)
                                                    OR (c BETWEEN 65 AND 90)
                                                    OR (c BETWEEN 97 AND 122)
                                                    OR c IN (45, 46, 95, 126)
                                                  THEN chr(c) || substr(p, 3)
                                                  ELSE '%'
                                                       || upper(substr(p, 1, 2))
                                                       || substr(p, 3) END)[1]
                                    END), '')
                       END AS url
                FROM %SRC%
            ),
            p1 AS (
                SELECT doc_id,
                       lower(regexp_extract(url,
                           '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                       regexp_replace(url,
                           '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
                FROM p0
            ),
            p2 AS (
                SELECT doc_id, scheme,
                       regexp_extract(rest, '^([^/?#]*)', 1) AS authority,
                       regexp_replace(rest, '^[^/?#]*', '') AS after_auth
                FROM p1
            ),
            p3 AS (
                SELECT doc_id, scheme,
                       lower(CASE WHEN contains(authority, '@')
                                  THEN regexp_extract(authority, '@(.*)$', 1)
                                  ELSE authority END) AS hostport,
                       coalesce(nullif(
                           regexp_extract(after_auth, '^([^?#]*)', 1), ''),
                           '/') AS path,
                       regexp_extract(after_auth, '\\?([^#]*)', 1) AS query
                FROM p2
            ),
            p4 AS (
                SELECT doc_id, scheme, path,
                       CASE WHEN (scheme = 'http' AND hostport LIKE '%:80')
                              OR (scheme = 'https' AND hostport LIKE '%:443')
                            THEN regexp_extract(hostport, '^(.*):[0-9]+$', 1)
                            ELSE hostport END AS host,
                       array_to_string(list_sort(list_filter(
                           string_split(query, '&'),
                           p -> p <> ''
                                AND NOT (starts_with(p, 'utm_')
                                     OR list_contains(
                                            ['gclid','fbclid','ref','msclkid'],
                                            string_split(p, '=')[1])))), '&')
                           AS qs
                FROM p3
            )""".replace("%SRC%", src)


def _web_pipeline_oracle(with_repetition: bool) -> str:
    """DuckDB replay of the composed web pipeline (q_web_pipeline /
    q_web_pipeline_full): URL synthesis + canonicalization keep-first
    -> C4 line/page judging over the synthesized dotted lines ->
    Gopher quality over the original text [-> Gopher repetition
    fractions over the original text] -> boilerplate line removal
    over the staged survivors (empty norms excluded from the hot
    count — blank lines are structure)."""
    rep_ctes = """,
            rt AS (
                SELECT d.doc_id,
                       list_filter(regexp_split_to_array(lower(d.text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents d JOIN firsts USING (doc_id)
            ),
            rg2 AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS g
                FROM rt WHERE len(ws) >= 2
            ),
            rg3 AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS g
                FROM rt WHERE len(ws) >= 3
            ),
            rc2 AS (SELECT doc_id, g, count(*) AS c FROM rg2 GROUP BY 1, 2),
            rc3 AS (SELECT doc_id, g, count(*) AS c FROM rg3 GROUP BY 1, 2),
            ra2 AS (
                SELECT doc_id, sum(c) AS t2, count(*) AS d2, max(c) AS m2
                FROM rc2 GROUP BY doc_id
            ),
            ra3 AS (
                SELECT doc_id, sum(c) AS t3, count(*) AS d3
                FROM rc3 GROUP BY doc_id
            ),
            rpass AS (
                SELECT ra2.doc_id FROM ra2 JOIN ra3 USING (doc_id)
                WHERE (t2-d2)/CAST(t2 AS DOUBLE) <= 0.20
                  AND (t3-d3)/CAST(t3 AS DOUBLE) <= 0.18
                  AND m2/CAST(t2 AS DOUBLE) <= 0.20
            )"""
    rep_join = "JOIN rpass USING (doc_id)" if with_repetition else ""
    return f"""
            WITH u AS (
                SELECT doc_id, {_URL_SYNTH_CASE} AS url
                FROM documents
            ),
            {_url_canon_ctes("u")},
            firsts AS (
                SELECT min(doc_id) AS doc_id
                FROM p4
                GROUP BY {_URL_CANON_KEY}
            ),
            w AS (
                SELECT d.doc_id, string_split(d.text, ' ') AS ws
                FROM documents d JOIN firsts USING (doc_id)
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            dotted AS (
                SELECT doc_id, line_no,
                       CASE WHEN substr(md5(line), 1, 1) < '8'
                            THEN line || '.' ELSE line END AS line
                FROM lined
            ),
            braced AS (
                SELECT doc_id, line_no,
                       CASE WHEN doc_id % 97 = 0
                             AND line_no = max(line_no)
                                 OVER (PARTITION BY doc_id)
                            THEN line || ' {{' ELSE line END AS line
                FROM dotted
            ),
            judged AS (
                SELECT doc_id, line_no, line,
                       (substr(rtrim(line), -1, 1) IN ('.', '!', '?', '"')
                        AND len(list_filter(
                                regexp_split_to_array(line, '\\s+'),
                                x -> x <> '')) >= 2
                        AND NOT regexp_matches(lower(line), 'javascript'))
                           AS keep_line,
                       contains(line, '{{') AS has_brace,
                       contains(lower(line), 'lorem ipsum') AS has_lorem
                FROM braced
            ),
            c4agg AS (
                SELECT doc_id,
                       sum(CASE WHEN keep_line THEN 1 ELSE 0 END) AS kept,
                       bool_or(has_brace) AS brace,
                       bool_or(has_lorem) AS lorem
                FROM judged GROUP BY doc_id
            ),
            c4ok AS (
                SELECT doc_id FROM c4agg
                WHERE NOT brace AND NOT lorem AND kept >= 3
            ),
            gt AS (
                SELECT d.doc_id,
                       list_filter(regexp_split_to_array(d.text, '\\s+'),
                                   x -> x <> '') AS gws,
                       string_split(d.text, chr(10)) AS glines,
                       list_filter(regexp_split_to_array(lower(d.text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS gtoks,
                       d.text AS gtext
                FROM documents d JOIN firsts USING (doc_id)
            ),
            gm AS (
                SELECT doc_id,
                       len(gws) AS n_words,
                       coalesce(list_sum(list_transform(gws, x -> len(x))), 0)
                           AS total_len,
                       len(list_filter(gws,
                           x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
                       (len(gtext) - len(replace(gtext, '#', '')))
                       + (len(gtext) - len(replace(gtext, '...', ''))) // 3
                           AS n_symbols,
                       len(glines) AS n_lines,
                       len(list_filter(glines,
                           l -> substr(ltrim(l), 1, 1) IN ('-','*','•')))
                           AS bullets,
                       len(list_filter(glines, l -> rtrim(l) LIKE '%...'))
                           AS ells,
                       CAST(list_contains(gtoks, 'the') AS INT)
                       + CAST(list_contains(gtoks, 'be') AS INT)
                       + CAST(list_contains(gtoks, 'to') AS INT)
                       + CAST(list_contains(gtoks, 'of') AS INT)
                       + CAST(list_contains(gtoks, 'and') AS INT)
                       + CAST(list_contains(gtoks, 'that') AS INT)
                       + CAST(list_contains(gtoks, 'have') AS INT)
                       + CAST(list_contains(gtoks, 'with') AS INT) AS stop_hits
                FROM gt
            ),
            gpass AS (
                SELECT doc_id FROM gm
                WHERE n_words >= 50 AND n_words <= 100000
                  AND total_len >= n_words * 3 AND total_len <= n_words * 10
                  AND n_symbols * 10 <= n_words
                  AND bullets * 10 <= n_lines * 9
                  AND ells * 10 <= n_lines * 3
                  AND alpha_words * 5 >= n_words * 4
                  AND stop_hits >= 1
            ){rep_ctes if with_repetition else ''},
            staged AS (
                SELECT j.doc_id, j.line_no, j.line
                FROM judged j
                JOIN c4ok USING (doc_id)
                JOIN gpass USING (doc_id)
                {rep_join}
                WHERE j.keep_line
            ),
            nrm AS (
                SELECT doc_id, line_no, line,
                       trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))
                           AS norm
                FROM staged
            ),
            hot AS (
                SELECT norm FROM nrm WHERE norm <> '' GROUP BY norm
                HAVING count(DISTINCT doc_id) > 15
            ),
            kept2 AS (
                SELECT doc_id, line_no, line FROM nrm
                WHERE norm NOT IN (SELECT norm FROM hot)
            ),
            rebuilt AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY line_no)
                           AS clean_text
                FROM kept2 GROUP BY doc_id
            ),
            base AS (
                SELECT s.doc_id,
                       CAST(count(*) AS BIGINT) AS n_lines
                FROM staged s GROUP BY s.doc_id
            )
            SELECT base.doc_id AS id, base.n_lines,
                   coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.clean_text, '') AS clean_text
            FROM base LEFT JOIN rebuilt r USING (doc_id)
        """


def oracle_sql() -> dict[str, str]:
    oracles = {
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
                   CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "asof_select": """
            WITH snaps AS (
                SELECT DISTINCT date_trunc('month', o_orderdate) AS dataset_date FROM orders
            )
            SELECT e.event_id, e.ts,
                   COALESCE(
                       (SELECT max(s.dataset_date) FROM snaps s
                        WHERE CAST(s.dataset_date AS TIMESTAMP) < e.ts),
                       (SELECT min(s.dataset_date) FROM snaps s)
                   ) AS dataset_date
            FROM events e
        """,
        "range_lookup": """
            WITH ranges AS (
                SELECT (p_partkey-1)*100 AS low, (p_partkey-1)*100+49 AS high,
                       p_brand AS brand
                FROM part
            ),
            probes AS (
                SELECT l_orderkey, l_linenumber,
                       (l_partkey*37 + l_linenumber) % ((SELECT max(p_partkey) FROM part)*100) AS v
                FROM lineitem
            )
            SELECT p.l_orderkey, p.l_linenumber, p.v, r.brand
            FROM probes p LEFT JOIN ranges r ON p.v BETWEEN r.low AND r.high
        """,
        "interval_flatten": """
            WITH r AS (
                SELECT p_partkey AS seq,
                       (p_partkey % 50)*100 AS low,
                       (p_partkey % 50)*100 + 70 + (p_partkey % 7)*20 AS high,
                       p_brand AS payload
                FROM part
            ),
            b AS (
                SELECT low AS pos FROM r UNION SELECT high+1 FROM r
            ),
            s AS (
                SELECT pos AS seg_low, lead(pos) OVER (ORDER BY pos) - 1 AS seg_high FROM b
            ),
            cov AS (
                SELECT s.seg_low, s.seg_high, arg_max(r.payload, r.seq) AS payload
                FROM s JOIN r ON r.low <= s.seg_low AND r.high >= s.seg_high
                WHERE s.seg_high IS NOT NULL
                GROUP BY s.seg_low, s.seg_high
            ),
            m AS (
                SELECT *,
                       CASE WHEN lag(seg_high) OVER w IS NULL
                                 OR seg_low > lag(seg_high) OVER w + 1
                                 OR payload <> lag(payload) OVER w
                            THEN 1 ELSE 0 END AS brk
                FROM cov
                WINDOW w AS (ORDER BY seg_low)
            ),
            g AS (
                SELECT *, SUM(brk) OVER (ORDER BY seg_low ROWS UNBOUNDED PRECEDING) AS grp FROM m
            )
            SELECT MIN(seg_low) AS low, MAX(seg_high) AS high, payload
            FROM g GROUP BY grp, payload
        """,
        "interval_merge": """
            WITH src AS (
                SELECT (row_number() OVER (ORDER BY o_orderkey) - 1)*10 AS low,
                       (row_number() OVER (ORDER BY o_orderkey) - 1)*10 + 9 AS high,
                       o_orderstatus AS payload
                FROM orders
            ),
            m AS (
                SELECT *,
                       CASE WHEN lag(high) OVER w IS NULL
                                 OR low > lag(high) OVER w + 1
                                 OR payload <> lag(payload) OVER w
                            THEN 1 ELSE 0 END AS brk
                FROM src
                WINDOW w AS (ORDER BY low)
            ),
            g AS (
                SELECT *, SUM(brk) OVER (ORDER BY low ROWS UNBOUNDED PRECEDING) AS grp FROM m
            )
            SELECT MIN(low) AS low, MAX(high) AS high, payload
            FROM g GROUP BY grp, payload
        """,
        "merge_annotators": """
            WITH a AS (SELECT DISTINCT date_trunc('month', o_orderdate) AS d FROM orders),
                 b AS (SELECT DISTINCT date_trunc('month', ts) AS d FROM events),
                 all_d AS (SELECT d FROM a UNION SELECT d FROM b)
            SELECT d.d AS dataset_date,
                   (SELECT max(a.d) FROM a WHERE a.d <= d.d) AS geo_date,
                   (SELECT max(b.d) FROM b WHERE b.d <= d.d) AS asn_date
            FROM all_d d
        """,
        "annotate": """
            WITH mv AS (SELECT (max(p_partkey)+1)*10//9 AS m FROM part),
            p1 AS (
                SELECT event_id,
                       (user_id * 131 + event_id * 7919) % (SELECT m FROM mv) AS k,
                       event_id % 256 AS z
                FROM events
            ),
            p2 AS (
                SELECT event_id, k // 256 AS x, k % 256 AS y, z,
                       167772160 + k*256 + z AS v
                FROM p1
            ),
            ranges AS (
                SELECT 167772160 + p_partkey*256 AS low,
                       167772160 + p_partkey*256 + 255 AS high,
                       p_brand
                FROM part
            )
            SELECT p2.event_id,
                   CASE WHEN p2.event_id % 10 = 0
                        THEN printf('2002:0a%02x:%02x%02x::1', x, y, z)
                        ELSE printf('10.%d.%d.%d', x, y, z) END AS ip,
                   COALESCE(r.p_brand, 'MISSING') AS brand
            FROM p2 LEFT JOIN ranges r ON p2.v BETWEEN r.low AND r.high
        """,
        "sessionize": """
            WITH g AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            s AS (
                SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS grp
                FROM g
            )
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, grp
        """,
        "histogram": """
            SELECT event_type,
                   CAST(length(CAST(CAST(floor(value*1000) AS BIGINT) AS VARCHAR)) AS INTEGER) AS bucket,
                   COUNT(*) AS n
            FROM events
            GROUP BY 1, 2
        """,
        "asn_decode": """
            SELECT s_suppkey,
                   printf('%d_%d,%d', s_suppkey, s_nationkey, s_suppkey*7) AS asn_str,
                   s_suppkey AS best_asn,
                   2 AS n_systems,
                   3 AS n_asns
            FROM supplier
        """,
        "response_keys": """
            SELECT event_id,
                   printf('10.%d.%d.%d',
                          (user_id % 65536) // 256,
                          user_id % 256,
                          event_id % 256)
                   || lower(to_base(CAST(floor(epoch(ts)) AS BIGINT), 36)) AS rkey
            FROM events
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS keep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "legacy_annotate": _legacy_oracle(),
        "pack_chunks": """
            WITH t AS (
                SELECT doc_id, source,
                       CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                            x -> x <> '')) AS INTEGER) AS n_tokens
                FROM documents
            ),
            c AS (
                SELECT doc_id, source, n_tokens,
                       SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS e
                FROM t
            )
            SELECT source, doc_id, n_tokens,
                   CAST(e - n_tokens AS BIGINT) AS start_off,
                   CAST((e - n_tokens) // 512 AS BIGINT) AS first_block,
                   CAST(CASE WHEN n_tokens > 0 THEN (e - 1) // 512
                             ELSE (e - n_tokens) // 512 END AS BIGINT) AS last_block
            FROM c
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE CAST('0x' || substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000
                  < CASE source WHEN 'src0' THEN 10000
                                WHEN 'src1' THEN 5000
                                WHEN 'src2' THEN 2500
                                ELSE 1000 END
        """,
        "skew_join": """
            SELECT e.event_id, e.user_id % 5 AS rkey, r.r_name
            FROM events e JOIN region r ON r.r_regionkey = e.user_id % 5
        """,
        "skew_agg": """
            SELECT user_id % 5 AS k,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS total,
                   MAX(CAST(floor(value * 1000) AS BIGINT)) AS mx
            FROM events GROUP BY 1
        """,
        "pii_redact": """
            WITH planted AS (
                SELECT doc_id,
                       text || ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com tel 555-'
                            || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-1234 host 10.0.'
                            || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
                FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
                   CAST(len(regexp_extract_all(t, '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS INTEGER) AS n_phones,
                   CAST(len(regexp_extract_all(t, '\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b')) AS INTEGER) AS n_ips,
                   md5(regexp_replace(regexp_replace(regexp_replace(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                        '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b', '<PHONE>', 'g'),
                        '\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b', '<IP>', 'g')) AS redacted_md5
            FROM planted
        """,
        "dedup_minhash_lsh": _minhash_oracle(16, 8, 0.5),
        "dedup_simhash": _simhash_oracle(60, 4, 7, probe_bits=1),
        "dedup_ngram_jaccard": f"""
            WITH {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            pairs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
        """,
        "dedup_weighted_jaccard": f"""
            WITH {_shingle_tf_cte(3)},
            wts AS (SELECT id, sum(tf) AS wt FROM tf GROUP BY 1),
            inter AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       sum(least(a.tf, b.tf)) AS i
                FROM tf a JOIN tf b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(i AS DOUBLE)/(wa.wt + wb.wt - i) AS wjaccard
            FROM inter
            JOIN wts wa ON wa.id = id_a
            JOIN wts wb ON wb.id = id_b
            WHERE CAST(i AS DOUBLE)/(wa.wt + wb.wt - i) >= 0.5
        """,
        "dedup_weighted_minhash": _weighted_minhash_oracle(16, 8, 0.5, 8),
        # spatial oracle: INDEPENDENT brute force (lat-band prefilter
        # only — 9.2 deg > 1000km/111*1.02, so it never drops a true
        # pair), not a replay of the grid blocking; round(, 6) absorbs
        # libm trig ulps per the embedding-cosine precedent
        "geo_radius_join": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            p AS (
                SELECT user_id AS id,
                       (CAST('0x'||substr(md5('lat'||CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                            % 120000)/1000.0 - 60.0 AS lat,
                       (CAST('0x'||substr(md5('lon'||CAST(user_id AS VARCHAR)),1,8) AS BIGINT)
                            % 360000)/1000.0 - 180.0 AS lon
                FROM u
            ),
            cand AS (
                SELECT a.id AS id_l, b.id AS id_r,
                       a.lat AS la, a.lon AS loa, b.lat AS lb, b.lon AS lob
                FROM p a JOIN p b
                  ON a.id < b.id AND abs(a.lat - b.lat) <= 9.2
            ),
            scored AS (
                SELECT id_l, id_r,
                       round(2*6371.0*asin(sqrt(
                           sin(radians(lb-la)/2)*sin(radians(lb-la)/2)
                           + cos(radians(la))*cos(radians(lb))
                             *sin(radians(lob-loa)/2)*sin(radians(lob-loa)/2)
                       )), 6) AS dist_km
                FROM cand
            )
            SELECT id_l, id_r, dist_km FROM scored WHERE dist_km <= 1000.0
        """,
        # serving composition: annotate's range join replayed (inner
        # join = non-miss), nearest site brute-forced with a window
        # rank — independent of the Spark side's grid blocking
        "annotate_nearest_site": """
            WITH mv AS (SELECT (max(p_partkey)+1)*10//9 AS m FROM part),
            p1 AS (
                SELECT event_id,
                       (user_id * 131 + event_id * 7919) % (SELECT m FROM mv) AS k,
                       event_id % 256 AS z
                FROM events
            ),
            p2 AS (
                SELECT event_id, 167772160 + k*256 + z AS v
                FROM p1
            ),
            ranges AS (
                SELECT 167772160 + p_partkey*256 AS low,
                       167772160 + p_partkey*256 + 255 AS high,
                       p_brand
                FROM part
            ),
            ann AS (
                SELECT p2.event_id, r.p_brand AS brand
                FROM p2 JOIN ranges r ON p2.v BETWEEN r.low AND r.high
            ),
            clients AS (
                SELECT event_id, brand,
                       (CAST('0x'||substr(md5('clat'||CAST(event_id AS VARCHAR)),1,8) AS BIGINT)
                            % 120000)/1000.0 - 60.0 AS lat,
                       (CAST('0x'||substr(md5('clon'||CAST(event_id AS VARCHAR)),1,8) AS BIGINT)
                            % 360000)/1000.0 - 180.0 AS lon
                FROM ann
            ),
            sites AS (
                SELECT n_nationkey AS site_id,
                       (CAST('0x'||substr(md5('slat'||CAST(n_nationkey AS VARCHAR)),1,8) AS BIGINT)
                            % 120000)/1000.0 - 60.0 AS lat,
                       (CAST('0x'||substr(md5('slon'||CAST(n_nationkey AS VARCHAR)),1,8) AS BIGINT)
                            % 360000)/1000.0 - 180.0 AS lon
                FROM nation
            ),
            scored AS (
                SELECT c.event_id, c.brand, s.site_id,
                       round(2*6371.0*asin(sqrt(
                           sin(radians(s.lat-c.lat)/2)*sin(radians(s.lat-c.lat)/2)
                           + cos(radians(c.lat))*cos(radians(s.lat))
                             *sin(radians(s.lon-c.lon)/2)*sin(radians(s.lon-c.lon)/2)
                       )), 6) AS dist_km
                FROM clients c CROSS JOIN sites s
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY event_id
                              ORDER BY dist_km, site_id) AS rn
                FROM scored WHERE dist_km <= 5000.0
            )
            SELECT event_id, brand, site_id, dist_km FROM ranked WHERE rn = 1
        """,
        # span-decontamination replay: same tokenization, mask windows
        # via gaps-and-islands (running-max window), coverage via a
        # BETWEEN left join, cleaned text via ordered string_agg
        # (NULLs skipped = the covered tokens; coalesce '' for
        # fully-masked docs, matching Spark's concat_ws over empty)
        "decontaminate_spans": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            ctok AS (
                SELECT doc_id AS id,
                       unnest(range(1, len(ws)+1)) - 1 AS pos,
                       unnest(ws) AS tok
                FROM w WHERE doc_id % 100 <> 0
            ),
            bsh AS (
                SELECT DISTINCT
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM w WHERE doc_id % 100 = 0 AND len(ws) >= 3
            ),
            g AS (
                SELECT doc_id AS id,
                       unnest(range(1, len(ws)-1)) - 1 AS pos,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM w WHERE doc_id % 100 <> 0 AND len(ws) >= 3
            ),
            hits AS (SELECT g.id, g.pos FROM g JOIN bsh USING (s)),
            spans AS (
                SELECT id, greatest(pos - 2, 0) AS lo, pos + 4 AS hi
                FROM hits
            ),
            m1 AS (
                SELECT id, lo, hi,
                       CASE WHEN lo > coalesce(max(hi) OVER (
                                PARTITION BY id ORDER BY lo, hi
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                                -1)
                            THEN 1 ELSE 0 END AS brk
                FROM spans
            ),
            m2 AS (
                SELECT id, lo, hi,
                       sum(brk) OVER (PARTITION BY id ORDER BY lo, hi
                                      ROWS UNBOUNDED PRECEDING) AS grp
                FROM m1
            ),
            merged AS (
                SELECT id, grp, min(lo) AS lo, max(hi) AS hi
                FROM m2 GROUP BY 1, 2
            ),
            nsp AS (SELECT id, count(*) AS n_spans FROM merged GROUP BY 1),
            cov AS (
                SELECT t.id, t.pos, t.tok, (m.lo IS NOT NULL) AS covered
                FROM ctok t LEFT JOIN merged m
                  ON m.id = t.id AND t.pos BETWEEN m.lo AND m.hi
            ),
            agg AS (
                SELECT id, count(*) AS n_tokens,
                       CAST(sum(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
                       md5(coalesce(string_agg(CASE WHEN NOT covered THEN tok END,
                                               ' ' ORDER BY pos), '')) AS clean_md5
                FROM cov GROUP BY 1
            )
            SELECT agg.id AS doc_id, n_tokens, n_removed,
                   CAST(coalesce(nsp.n_spans, 0) AS BIGINT) AS n_spans,
                   clean_md5
            FROM agg LEFT JOIN nsp ON nsp.id = agg.id
        """,
        # method-eval report: both methods' oracle SQL replayed as
        # subqueries; the prefix row asserts losslessness (== exact) —
        # a Spark-side divergence would hash-mismatch here too
        # dedup_eval_weighted: exact CAPPED weighted jaccard (least(tf,8))
        # as ground truth, the tf-expansion minhash replay as the method.
        "dedup_eval_weighted": f"""
            WITH ex AS (
                SELECT id_a, id_b FROM (
                    WITH {_shingle_tf_cte(3)},
                    c AS (SELECT id, s, least(tf, 8) AS tf FROM tf),
                    wts AS (SELECT id, sum(tf) AS wt FROM c GROUP BY 1),
                    inter AS (
                        SELECT a.id AS id_a, b.id AS id_b,
                               sum(least(a.tf, b.tf)) AS i
                        FROM c a JOIN c b ON a.s = b.s AND a.id < b.id
                        GROUP BY 1, 2
                    )
                    SELECT id_a, id_b
                    FROM inter
                    JOIN wts wa ON wa.id = id_a
                    JOIN wts wb ON wb.id = id_b
                    WHERE CAST(i AS DOUBLE)/(wa.wt + wb.wt - i) >= 0.5
                )
            ),
            mh AS (
                SELECT id_a, id_b
                FROM ({_weighted_minhash_oracle(16, 8, 0.5, 8)})
            ),
            exn AS (SELECT count(*) AS ne FROM ex),
            mhn AS (SELECT count(*) AS nm FROM mh),
            mhc AS (
                SELECT count(*) AS nc FROM mh JOIN ex USING (id_a, id_b)
            )
            SELECT 'weighted_minhash' AS method,
                   CAST(ne AS BIGINT) AS n_exact,
                   CAST(nm AS BIGINT) AS n_method,
                   CAST(nc AS BIGINT) AS n_common,
                   CASE WHEN nm = 0 THEN 1.0
                        ELSE CAST(nc AS DOUBLE)/nm END AS prec,
                   CASE WHEN ne = 0 THEN 1.0
                        ELSE CAST(nc AS DOUBLE)/ne END AS recall
            FROM exn, mhn, mhc
        """,
        "dedup_eval_report": f"""
            WITH ex AS (
                SELECT id_a, id_b FROM (
                    WITH {_shingle_cte(3)},
                    sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
                    pairs AS (
                        SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                        GROUP BY 1, 2
                    )
                    SELECT id_a, id_b
                    FROM pairs
                    JOIN sizes sa ON sa.id = id_a
                    JOIN sizes sb ON sb.id = id_b
                    WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
                )
            ),
            mh AS (SELECT id_a, id_b FROM ({_minhash_oracle(16, 8, 0.5)})),
            exn AS (SELECT count(*) AS ne FROM ex),
            mhn AS (SELECT count(*) AS nm FROM mh),
            mhc AS (
                SELECT count(*) AS nc
                FROM mh JOIN ex USING (id_a, id_b)
            )
            SELECT 'minhash' AS method,
                   CAST(ne AS BIGINT) AS n_exact,
                   CAST(nm AS BIGINT) AS n_method,
                   CAST(nc AS BIGINT) AS n_common,
                   CASE WHEN nm = 0 THEN 1.0
                        ELSE CAST(nc AS DOUBLE)/nm END AS prec,
                   CASE WHEN ne = 0 THEN 1.0
                        ELSE CAST(nc AS DOUBLE)/ne END AS recall
            FROM exn, mhn, mhc
            UNION ALL
            SELECT 'prefix', CAST(ne AS BIGINT), CAST(ne AS BIGINT),
                   CAST(ne AS BIGINT), 1.0, 1.0
            FROM exn
        """,
        # winnowing replay: parallel unnest keeps (pos, gram) aligned;
        # the packed key h*2^20 + (2^20-1-pos) makes rightmost-min a
        # plain BIGINT window min in both engines; // is exact BIGINT
        # division (the Spark side uses shiftright)
        "dedup_winnow": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            g AS (
                SELECT doc_id AS id,
                       unnest(range(1, len(ws)-3)) - 1 AS pos,
                       unnest(list_transform(range(1, len(ws)-3),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4])) AS s
                FROM w WHERE len(ws) >= 5
            ),
            keyed AS (
                SELECT id, pos,
                       CAST('0x' || substr(md5(s), 1, 10) AS BIGINT) * 1048576
                           + (1048575 - pos) AS key
                FROM g
            ),
            sel AS (
                SELECT DISTINCT id,
                       min(key) OVER (PARTITION BY id ORDER BY pos
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mk
                FROM keyed
            ),
            fp AS (SELECT DISTINCT id, mk // 1048576 AS h FROM sel),
            hot AS (SELECT h FROM fp GROUP BY h HAVING count(*) > 1000),
            fpc AS (SELECT * FROM fp ANTI JOIN hot USING (h)),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
                FROM fpc a JOIN fpc b ON a.h = b.h AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, n_shared FROM prs WHERE n_shared >= 2
        """,
        # the prefix-filter gate's oracle is the PLAIN exact-jaccard SQL
        # (threshold 0.8): the prefix filter is lossless, so hash-equality
        # against the unfiltered form IS the losslessness proof
        "dedup_jaccard_prefix": f"""
            WITH {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            pairs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) AS jaccard
            FROM pairs
            JOIN sizes sa ON sa.id = id_a
            JOIN sizes sb ON sb.id = id_b
            WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.8
        """,
        "triangle_count": f"""
            WITH {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            pairs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            e AS (
                SELECT id_a AS lo, id_b AS hi
                FROM pairs
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.3
            ),
            tri AS (
                SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
                FROM e ab
                JOIN e bc ON bc.lo = ab.hi
                JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi
            ),
            corner AS (
                SELECT id, count(*) AS n FROM (
                    SELECT unnest([a, b, c]) AS id FROM tri
                ) GROUP BY id
            ),
            nodes AS (
                SELECT lo AS id FROM e UNION SELECT hi FROM e
            )
            SELECT nodes.id,
                   CAST(coalesce(corner.n, 0) AS BIGINT) AS n_triangles
            FROM nodes LEFT JOIN corner ON corner.id = nodes.id
        """,
        "dedup_containment": f"""
            WITH {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            pairs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id <> b.id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b, CAST(cnt AS DOUBLE)/sa.n AS containment
            FROM pairs
            JOIN sizes sa ON sa.id = id_a
            WHERE CAST(cnt AS DOUBLE)/sa.n >= 0.8
        """,
        "pmi_collocations": """
            WITH w AS (
                SELECT list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS ws
                FROM documents
            ),
            big AS (
                SELECT unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS bg
                FROM w WHERE len(ws) >= 2
            ),
            cab AS (SELECT bg, count(*) AS n_pair FROM big GROUP BY bg),
            uni AS (
                SELECT unnest(ws) AS t FROM w
            ),
            uc AS (SELECT t, count(*) AS c FROM uni GROUP BY t),
            tot AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS n FROM cab)
            SELECT split_part(bg, ' ', 1) AS w1,
                   split_part(bg, ' ', 2) AS w2,
                   CAST(n_pair AS BIGINT) AS n_pair,
                   floor(log2(n_pair * tot.n / (c1.c * c2.c)) * 1000000
                         + 0.5)/1000000 AS pmi
            FROM cab
            CROSS JOIN tot
            JOIN uc c1 ON c1.t = split_part(bg, ' ', 1)
            JOIN uc c2 ON c2.t = split_part(bg, ' ', 2)
            WHERE n_pair >= 5
            ORDER BY pmi DESC, w1 ASC, w2 ASC
            LIMIT 50
        """,
        "source_kl": """
            WITH tok AS (
                SELECT source AS src,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS t
                FROM documents
            ),
            st AS (SELECT src, t, count(*) AS c_st FROM tok GROUP BY 1, 2),
            marg AS (SELECT t, sum(c_st) AS c_t FROM st GROUP BY t),
            top AS (SELECT t, c_t FROM marg ORDER BY c_t DESC, t ASC LIMIT 500),
            vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM top),
            ns AS (
                SELECT src, CAST(sum(c_st) AS DOUBLE) AS n_s
                FROM st JOIN top USING (t) GROUP BY src
            ),
            nq AS (SELECT CAST(sum(c_t) AS DOUBLE) AS n_q FROM top),
            dense AS (
                SELECT ns.src, ns.n_s,
                       (COALESCE(st.c_st, 0) + 1.0) / (ns.n_s + vv.v) AS p,
                       (top.c_t + 1.0) / (nq.n_q + vv.v) AS q
                FROM ns CROSS JOIN top
                CROSS JOIN nq CROSS JOIN vv
                LEFT JOIN st ON st.src = ns.src AND st.t = top.t
            )
            SELECT src AS source,
                   CAST(n_s AS BIGINT) AS n_tokens,
                   floor(sum(p * log2(p / q)) * 1000000 + 0.5)/1000000
                       AS kl_bits
            FROM dense
            GROUP BY src, n_s
        """,
        "event_transitions": """
            WITH seq AS (
                SELECT event_type AS cur,
                       lead(event_type) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS nxt
                FROM events
            ),
            pairs AS (
                SELECT cur, nxt, count(*) AS n
                FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
            ),
            marg AS (SELECT cur, sum(n) AS row_n FROM pairs GROUP BY cur)
            SELECT p.cur, p.nxt, CAST(p.n AS BIGINT) AS n,
                   floor(CAST(p.n AS DOUBLE)/CAST(m.row_n AS DOUBLE)
                         * 1000000 + 0.5)/1000000 AS p
            FROM pairs p JOIN marg m ON m.cur = p.cur
        """,
        "robust_outliers": """
            WITH med AS (
                SELECT event_type, median(value) AS med
                FROM events GROUP BY event_type
            ),
            dev AS (
                SELECT e.event_id, e.event_type, e.value, m.med
                FROM events e JOIN med m USING (event_type)
            ),
            mad AS (
                SELECT event_type, median(abs(value - med)) AS mad
                FROM dev GROUP BY event_type
            )
            SELECT event_id, d.event_type, value,
                   floor(0.6745*(value - d.med)/x.mad * 1000000
                         + 0.5)/1000000 AS z
            FROM dev d JOIN mad x USING (event_type)
            WHERE abs(floor(0.6745*(value - d.med)/x.mad * 1000000
                            + 0.5)/1000000) > 3.5
        """,
        "interval_overlap_join": """
            WITH e AS (
                SELECT user_id, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS sec
                FROM events
            ),
            x AS (
                SELECT user_id, event_id, sec,
                       CASE WHEN lag(sec) OVER uw IS NULL
                                 OR sec - lag(sec) OVER uw > 1800
                            THEN 1 ELSE 0 END AS brk
                FROM e
                WINDOW uw AS (PARTITION BY user_id ORDER BY sec, event_id)
            ),
            g AS (
                SELECT user_id, sec,
                       sum(brk) OVER (PARTITION BY user_id
                                      ORDER BY sec, event_id
                                      ROWS UNBOUNDED PRECEDING) AS grp
                FROM x
            ),
            s AS (
                SELECT user_id, min(sec) AS s_start, max(sec) AS s_end,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM g GROUP BY user_id, grp
            ),
            h AS (
                SELECT CAST(floor(sec/3600.0) AS BIGINT) AS hr,
                       count(*) AS n
                FROM e GROUP BY 1
            ),
            thr AS (
                SELECT CAST(5*sum(n) AS DOUBLE)/CAST(4*count(*) AS DOUBLE)
                       AS t
                FROM h
            ),
            b AS (
                SELECT hr*3600 AS h_start, hr*3600 + 3599 AS h_end,
                       CAST(n AS BIGINT) AS h_n
                FROM h, thr WHERE n >= t
            )
            SELECT user_id, s_start, s_end, n_events, h_start, h_end, h_n
            FROM s JOIN b
              ON s.s_start <= b.h_end AND b.h_start <= s.s_end
        """,
        # full-pipeline composite: every stage's SQL is the SAME text
        # as its standalone oracle, restricted to the corpus split —
        # the gate proves the Spark composition agrees end-to-end.
        "pipeline_full": """
            WITH RECURSIVE w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents WHERE doc_id % 100 <> 0
            ),
            sh AS (
                SELECT DISTINCT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM w WHERE len(ws) >= 3
            ),
            g2 AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS g
                FROM w WHERE len(ws) >= 2
            ),
            g3 AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS g
                FROM w WHERE len(ws) >= 3
            ),
            c2 AS (SELECT id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
            c3 AS (SELECT id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
            a2 AS (
                SELECT id, sum(c) AS t2, count(*) AS d2, max(c) AS m2
                FROM c2 GROUP BY id
            ),
            a3 AS (
                SELECT id, sum(c) AS t3, count(*) AS d3 FROM c3 GROUP BY id
            ),
            rep_keep AS (
                SELECT a2.id FROM a2 JOIN a3 ON a2.id = a3.id
                WHERE (t2-d2)/CAST(t2 AS DOUBLE) <= 0.20
                  AND (t3-d3)/CAST(t3 AS DOUBLE) <= 0.18
                  AND m2/CAST(t2 AS DOUBLE) <= 0.20
            ),
            bw AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents WHERE doc_id % 100 = 0
            ),
            bsh AS (
                SELECT DISTINCT
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM bw WHERE len(ws) >= 3
            ),
            clean AS (
                SELECT c.id FROM sh c LEFT JOIN bsh b ON c.s = b.s
                GROUP BY c.id
                HAVING CAST(count(b.s) AS DOUBLE)/count(*) < 0.1
            ),
            shc AS (
                SELECT id, s FROM sh
                WHERE s NOT IN (
                    SELECT s FROM sh GROUP BY s HAVING count(*) > 1000
                )
            ),
            sizes AS (SELECT id, count(*) AS n FROM shc GROUP BY id),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM shc a JOIN shc b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT id_a, id_b FROM prs
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            verts AS (SELECT DISTINCT src AS id FROM edges),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id),
            dupes AS (SELECT id FROM comp WHERE id <> cluster_id)
            SELECT d.lang, d.source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(d.n_chars) AS BIGINT) AS total_chars
            FROM documents d
            JOIN rep_keep k ON k.id = d.doc_id
            JOIN clean c ON c.id = d.doc_id
            LEFT JOIN dupes x ON x.id = d.doc_id
            WHERE d.doc_id % 100 <> 0 AND x.id IS NULL
            GROUP BY d.lang, d.source
        """,
        "group_quantiles": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   floor(quantile_cont(n_chars, 0.5)*1000000 + 0.5)/1000000 AS p50,
                   floor(quantile_cont(n_chars, 0.95)*1000000 + 0.5)/1000000 AS p95,
                   floor(quantile_cont(n_chars, 0.99)*1000000 + 0.5)/1000000 AS p99
            FROM documents GROUP BY lang
        """,
        "kcore": _kcore_oracle(2, 12, 0.3),
        "lpa_communities": _lpa_oracle(3, 0.3),
        "ann_pq_topk": _pq_oracle(3, 8, 16, 2, 16),
        "ann_ivfpq_topk": _pq_oracle(3, 8, 16, 2, 16, n_centroids=8, n_probe=2),
        # DSIR replay: same md5 bucket hashing, add-one smoothed
        # ln-ratios over target(en)/raw hashed unigram+bigram counts,
        # md5-uniform Gumbel perturbation, exact 0.8-percentile
        # threshold (both engines round the interpolated threshold
        # onto the scores' 1e-6 grid before comparing).
        "dsir_resample": """
            WITH base AS (
                SELECT doc_id AS id, (lang = 'en') AS is_target,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT id, is_target, unnest(ws) AS g FROM base
                UNION ALL
                SELECT id, is_target,
                       unnest(list_transform(range(1, len(ws)),
                                             i -> ws[i]||' '||ws[i+1])) AS g
                FROM base WHERE len(ws) >= 2
            ),
            feats AS (
                SELECT id, is_target,
                       CAST('0x' || substr(md5('ds|' || g), 1, 10) AS BIGINT)
                           % 4096 AS b
                FROM grams
            ),
            df AS (
                SELECT id, b, count(*) AS c, bool_and(is_target) AS is_target
                FROM feats GROUP BY 1, 2
            ),
            raw AS (SELECT b, sum(c) AS rc FROM df GROUP BY 1),
            tgt AS (SELECT b, sum(c) AS tc FROM df WHERE is_target GROUP BY 1),
            tot AS (
                SELECT (SELECT CAST(sum(rc) AS DOUBLE) FROM raw) AS R,
                       (SELECT CAST(sum(tc) AS DOUBLE) FROM tgt) AS T
            ),
            ratio AS (
                SELECT raw.b,
                       ln((coalesce(tc, 0) + 1.0)/(T + 1.0*4096))
                     - ln((rc + 1.0)/(R + 1.0*4096)) AS lr
                FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot
            ),
            w AS (
                SELECT id, CAST(sum(c) AS BIGINT) AS n_feats,
                       floor(sum(c*lr)*1000000 + 0.5)/1000000 AS logw
                FROM df JOIN ratio USING (b) GROUP BY id
            ),
            sc AS (
                SELECT id, n_feats, logw,
                       floor((logw - ln(-ln(
                           (CAST('0x' || substr(md5('g|' || id), 1, 10) AS BIGINT)
                            + 1.0) / (power(2, 40) + 1.0)
                       )))*1000000 + 0.5)/1000000 AS gscore
                FROM w
            ),
            th AS (
                SELECT floor(quantile_cont(gscore, 0.8)*1000000 + 0.5)/1000000
                           AS thr
                FROM sc
            )
            SELECT id AS doc_id, n_feats, logw, gscore,
                   (gscore >= thr) AS selected
            FROM sc CROSS JOIN th
        """,
        # transitive closure over the EXACT jaccard pair list: comp =
        # min id reachable (graph made symmetric, so min-reachable ==
        # min-of-component). Gate graphs are small; the Spark side is
        # the scalable label-propagation implementation.
        "dedup_clusters": f"""
            WITH RECURSIVE {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT id_a, id_b FROM prs
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            verts AS (SELECT DISTINCT src AS id FROM edges),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT CAST(id AS BIGINT) AS id,
                   CAST(MIN(r) AS BIGINT) AS cluster_id
            FROM reach GROUP BY id
        """,
        "upsert_merge": """
            WITH all_v AS (
                SELECT c_custkey, c_mktsegment, 0 AS seq FROM customer
                UNION ALL
                SELECT c_custkey, 'B1_' || c_mktsegment, 1 FROM customer
                WHERE c_custkey % 3 = 0
                UNION ALL
                SELECT c_custkey, 'B2_' || c_mktsegment, 2 FROM customer
                WHERE c_custkey % 9 = 0
            )
            SELECT c_custkey, c_mktsegment, CAST(seq AS BIGINT) AS seq
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY c_custkey ORDER BY seq DESC) AS rn
                FROM all_v
            )
            WHERE rn = 1
        """,
        "funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ),
            c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v ON e.user_id = v.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t1
                GROUP BY e.user_id
            ),
            p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c ON e.user_id = c.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY e.user_id
            )
            SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS step1_users,
                   CAST((SELECT count(*) FROM c) AS BIGINT) AS step2_users,
                   CAST((SELECT count(*) FROM p) AS BIGINT) AS step3_users
        """,
        "cohort_retention": """
            WITH f AS (
                SELECT user_id AS u,
                       date_trunc('week', min(ts)) AS cohort_week
                FROM events GROUP BY user_id
            ),
            a AS (
                SELECT DISTINCT e.user_id AS u, f.cohort_week,
                       CAST((epoch(date_trunc('week', e.ts))
                             - epoch(f.cohort_week)) / 604800 AS BIGINT)
                           AS week_offset
                FROM events e JOIN f ON e.user_id = f.u
            )
            SELECT cohort_week, week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM a GROUP BY 1, 2
        """,
        "event_cube": """
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS hod,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli,
                   CAST(GROUPING(event_type) * 2 + GROUPING(hour(ts))
                        AS BIGINT) AS gid
            FROM events
            GROUP BY ROLLUP (event_type, hour(ts))
        """,
        "doc_percentiles": """
            SELECT doc_id, lang, n_chars,
                   floor(percent_rank() OVER (
                             PARTITION BY lang ORDER BY n_chars)
                         * 1000000 + 0.5) / 1000000 AS pr
            FROM documents
        """,
        "rolling_avg": """
            SELECT event_id, user_id,
                   floor(avg(value) OVER (
                             PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                         * 1000000 + 0.5) / 1000000 AS roll_avg
            FROM events
        """,
        "quality_quantile_mix": """
            WITH t AS (
                SELECT lang,
                       floor(quantile_cont(n_chars, 0.25) * 1000000 + 0.5)
                           / 1000000 AS thr
                FROM documents GROUP BY lang
            )
            SELECT doc_id, lang
            FROM documents JOIN t USING (lang)
            WHERE n_chars >= thr
               OR CAST('0x' || substr(md5('qmix' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 10000 < 2000
        """,
        "dedup_keep_best": f"""
            WITH RECURSIVE {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT id_a, id_b FROM prs
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            verts AS (SELECT DISTINCT src AS id FROM edges),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT CAST(id AS BIGINT) AS id,
                       CAST(MIN(r) AS BIGINT) AS cluster_id
                FROM reach GROUP BY id
            )
            SELECT c.id, c.cluster_id,
                   row_number() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY d.n_chars DESC, c.id ASC) = 1 AS keep
            FROM comp c JOIN documents d ON c.id = d.doc_id
        """,
        "decontaminate": """
            WITH cw AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents WHERE doc_id % 100 <> 0
            ),
            csh AS (
                SELECT DISTINCT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM cw WHERE len(ws) >= 3
            ),
            bw AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents WHERE doc_id % 100 = 0
            ),
            bsh AS (
                SELECT DISTINCT
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM bw WHERE len(ws) >= 3
            )
            SELECT c.id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(count(b.s) AS BIGINT) AS n_hits,
                   CAST(count(b.s) AS DOUBLE)/count(*) AS hit_frac,
                   CAST(count(b.s) AS DOUBLE)/count(*) >= 0.1 AS contaminated
            FROM csh c LEFT JOIN bsh b ON c.s = b.s
            GROUP BY c.id
        """,
        "repetition_filter": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            g2 AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS g
                FROM w WHERE len(ws) >= 2
            ),
            g3 AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS g
                FROM w WHERE len(ws) >= 3
            ),
            c2 AS (SELECT id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
            c3 AS (SELECT id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
            a2 AS (
                SELECT id, CAST(sum(c) AS BIGINT) AS t2,
                       CAST(count(*) AS BIGINT) AS d2,
                       CAST(max(c) AS BIGINT) AS m2
                FROM c2 GROUP BY id
            ),
            a3 AS (
                SELECT id, CAST(sum(c) AS BIGINT) AS t3,
                       CAST(count(*) AS BIGINT) AS d3
                FROM c3 GROUP BY id
            )
            SELECT a2.id AS id,
                   t2 AS total_2grams, d2 AS distinct_2grams,
                   floor((t2-d2)/CAST(t2 AS DOUBLE)*1000000 + 0.5)/1000000
                       AS dup_2gram_frac,
                   floor(m2/CAST(t2 AS DOUBLE)*1000000 + 0.5)/1000000
                       AS top_2gram_frac,
                   t3 AS total_3grams, d3 AS distinct_3grams,
                   floor((t3-d3)/CAST(t3 AS DOUBLE)*1000000 + 0.5)/1000000
                       AS dup_3gram_frac,
                   ((t2-d2)/CAST(t2 AS DOUBLE) <= 0.20
                    AND (t3-d3)/CAST(t3 AS DOUBLE) <= 0.18
                    AND m2/CAST(t2 AS DOUBLE) <= 0.20) AS keep
            FROM a2 JOIN a3 ON a2.id = a3.id
        """,
        "dedup_embedding_cosine": """
            WITH v AS (
                SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(
                     list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]))
                     / (sqrt(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i])))
                        * sqrt(list_sum(list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])))),
                     6) AS cos
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(
                     list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*b.e[i]))
                     / (sqrt(list_sum(list_transform(range(1, len(a.e)+1), i -> a.e[i]*a.e[i])))
                        * sqrt(list_sum(list_transform(range(1, len(b.e)+1), i -> b.e[i]*b.e[i])))),
                     6) >= 0.45
        """,
        "ann_cosine_topk": _ann_cosine_oracle(3),
        # gemm path re-scores survivors with the identical expression →
        # same result set and values as the brute-force form
        "ann_gemm_topk": _ann_cosine_oracle(3),
        "ann_lsh_topk": _lsh_oracle(60, 4, 3, probe_bits=1),
        "ann_quantized_topk": _quantized_ann_oracle(60, 4, 3, probe_bits=1),
        "dedup_incremental_minhash": _incremental_minhash_oracle(),
        "embedding_decontam": _embedding_decontam_oracle(0.45),
        "semantic_dedup": _semdedup_oracle(8, 2, 17, 20),
        "ann_ivf_topk": _ivf_oracle(8, 3, 3),
        "text_metrics": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS toks
                FROM documents
            ),
            m AS (
                SELECT doc_id, text, toks,
                       len(toks) AS n_tokens,
                       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_ws_tokens,
                       CASE WHEN len(toks) > 0 THEN
                         CAST(len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE) / len(toks)
                       ELSE 0.0 END AS stop_ratio,
                       CASE WHEN length(text) > 0 THEN
                         CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)
                       ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(toks) > 0 THEN
                         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
                       ELSE 0.0 END AS wl
                FROM t
            )
            SELECT doc_id,
                   CAST(n_tokens AS INTEGER) AS n_tokens,
                   CAST(n_ws_tokens AS INTEGER) AS n_ws_tokens,
                   floor(stop_ratio*1e6 + 0.5)/1e6 AS stop_ratio,
                   floor(punct_ratio*1e6 + 0.5)/1e6 AS punct_ratio,
                   floor((0.3*least(stop_ratio*5, 1.0)
                         + 0.25*(1.0 - least(punct_ratio*4, 1.0))
                         + 0.25*least(n_tokens/100.0, 1.0)
                         + 0.2*(1.0 - least(abs(wl - 5.0)/5.0, 1.0)))*1e4 + 0.5)/1e4 AS quality,
                   coalesce(
                     list_min(list_transform(
                       list_transform(range(1, len(toks)-3),
                                      i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||toks[i+4]),
                       s -> md5(s))),
                     md5(list_aggregate(toks, 'string_agg', ' '))) AS fingerprint
            FROM m
        """,
        "lang_id": """
            WITH t AS (
                SELECT doc_id, lang,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS toks
                FROM documents
            ),
            s AS (
                SELECT doc_id, lang,
                       len(list_filter(toks, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS s_en,
                       len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS s_de,
                       len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un'], x))) AS s_fr,
                       len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un'], x))) AS s_es,
                       len(list_filter(toks, x -> list_contains(['de','shi','le','zai','he'], x))) AS s_zh
                FROM t
            )
            SELECT doc_id, lang,
                   CASE
                     WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
                     WHEN s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
                     WHEN s_fr > s_en AND s_fr > s_de THEN 'fr'
                     WHEN s_de > s_en THEN 'de'
                     ELSE 'en'
                   END AS pred_lang
            FROM s
        """,
        "tpch_q3": """
            SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o.o_orderkey
            LIMIT 10
        """,
        "tpch_q5": """
            SELECT r.r_name, n.n_name,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM region r
            JOIN nation n ON r.r_regionkey = n.n_regionkey
            JOIN customer c ON n.n_nationkey = c.c_nationkey
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND s.s_nationkey = n.n_nationkey
            GROUP BY 1, 2
        """,
        "tpch_q6": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                            * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND CAST(l_discount AS DECIMAL(12,2)) >= CAST(0.02 AS DECIMAL(12,2))
              AND CAST(l_discount AS DECIMAL(12,2)) <= CAST(0.06 AS DECIMAL(12,2))
              AND l_quantity < 24
        """,
        "tpch_q8": """
            WITH j AS (
                SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                       CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                       (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS rev,
                       sn.n_name AS supp_nation
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation cn ON c.c_nationkey = cn.n_nationkey
                JOIN region r ON cn.n_regionkey = r.r_regionkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
                  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            )
            SELECT o_year,
                   COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                          THEN rev END) AS DOUBLE), 0.0)
                   / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
                   CAST(SUM(rev) AS DOUBLE) AS total_rev
            FROM j GROUP BY o_year
        """,
        "tpch_q9": """
            WITH j AS (
                SELECT n.n_name AS nation,
                       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                       CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                       (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(12,2))) AS rev,
                       CAST(p.p_retailprice AS DECIMAL(12,2)) *
                       CAST(l.l_quantity AS DECIMAL(12,2)) AS cost
                FROM lineitem l
                JOIN part p ON l.l_partkey = p.p_partkey
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation n ON s.s_nationkey = n.n_nationkey
                WHERE p.p_name LIKE '%gear%'
            )
            SELECT nation, o_year,
                   CAST(SUM(rev) AS DOUBLE)
                   - CAST(SUM(cost) AS DOUBLE) / 10.0 AS sum_profit
            FROM j GROUP BY nation, o_year
        """,
        "tpch_q13": """
            WITH pc AS (
                SELECT c.c_custkey, count(o.o_orderkey) AS c_count
                FROM customer c LEFT JOIN orders o
                  ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '4-NOT SPECIFIED'
                GROUP BY c.c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(count(*) AS BIGINT) AS custdist
            FROM pc GROUP BY c_count
        """,
        "tpch_q21": """
            WITH lf AS (
                SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_orderstatus = 'F'
            ),
            po AS (
                SELECT l_orderkey,
                       count(DISTINCT l_suppkey) AS n_supp,
                       count(DISTINCT CASE WHEN l_returnflag = 'R'
                                           THEN l_suppkey END) AS n_r
                FROM lf GROUP BY l_orderkey
            ),
            rl AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM lf WHERE l_returnflag = 'R'
            ),
            w AS (
                SELECT rl.l_suppkey, count(*) AS numwait
                FROM rl JOIN po ON po.l_orderkey = rl.l_orderkey
                WHERE po.n_supp > 1 AND po.n_r = 1
                GROUP BY rl.l_suppkey
            )
            SELECT s.s_name, CAST(w.numwait AS BIGINT) AS numwait
            FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
        """,
        # Q4 adapted: late = some lineitem shipped >30 days after the
        # order date (schema has no commit/receipt dates)
        # Q2/Q11/Q16/Q20 need partsupp, absent from the synthetic
        # schema: both engines derive the identical view from the
        # distinct (l_partkey, l_suppkey) pairs with pure-integer
        # availqty/supplycost (see _partsupp / _PARTSUPP_SQL).
        "tpch_q2": f"""
            WITH partsupp AS ({_PARTSUPP_SQL}),
            eu_ps AS (
                SELECT ps_partkey, ps_suppkey, ps_supplycost,
                       s_acctbal, s_name, n_name
                FROM partsupp
                JOIN supplier ON ps_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
                WHERE r_name = 'EUROPE'
            )
            SELECT s_acctbal, s_name, n_name,
                   CAST(p_partkey AS BIGINT) AS p_partkey, p_type,
                   ps_supplycost AS supplycost,
                   CAST(ps_suppkey AS BIGINT) AS s_suppkey
            FROM eu_ps
            JOIN part ON ps_partkey = p_partkey
            WHERE p_size BETWEEN 10 AND 15 AND p_type = 'LARGE'
              AND ps_supplycost = (
                  SELECT min(ps_supplycost) FROM eu_ps i
                  WHERE i.ps_partkey = part.p_partkey
              )
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
            LIMIT 100
        """,
        # Batch perceptron, 2 epochs unrolled. Epoch 0 starts at w=0
        # (every row misclassified), so w1 = sum_d y_d*x_d; epoch 1
        # re-scores and adds only the still-misclassified rows. All
        # integer arithmetic - the hash gate pins the trained model.
        "perceptron_filter": f"""
            WITH {_PERCEPTRON_CTES}
            SELECT doc_id, CAST(y AS BIGINT) AS label,
                   CAST(s AS BIGINT) AS score,
                   CAST(CASE WHEN s > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
            FROM s2 JOIN lab USING (doc_id)
        """,
        # ntile over the (score, doc_id) total order — engine-identical
        # deciles; counts/positives are integer-exact
        "filter_calibration": f"""
            WITH {_PERCEPTRON_CTES},
            scored AS (
                SELECT doc_id, y, s,
                       ntile(10) OVER (ORDER BY s, doc_id) AS decile
                FROM s2 JOIN lab USING (doc_id)
            )
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pos,
                   CAST(min(s) AS BIGINT) AS min_score,
                   CAST(max(s) AS BIGINT) AS max_score
            FROM scored
            GROUP BY 1
        """,
        "stream_dedup_exact": """
            SELECT DISTINCT md5(text) AS h FROM documents
        """,
        # token_budget_sample: seeded-md5 priority order, per-source
        # running total BEFORE each doc < budget keeps it (boundary doc
        # kept); sources absent from the spec get budget 0.
        "token_budget_sample": """
            WITH t AS (
                SELECT doc_id AS id, source,
                       CAST(n_chars AS BIGINT) AS w,
                       md5('tb7|' || CAST(doc_id AS VARCHAR)) AS coin
                FROM documents
            ),
            b AS (
                SELECT 'src' || CAST(i AS VARCHAR) AS source,
                       CAST(2000 + 500 * (i % 3) AS BIGINT) AS budget
                FROM unnest(range(15)) AS u(i)
            ),
            c AS (
                SELECT t.id, t.source, t.w,
                       coalesce(b.budget, 0) AS budget,
                       sum(t.w) OVER (PARTITION BY t.source ORDER BY t.coin
                                      ROWS UNBOUNDED PRECEDING) - t.w
                           AS cum_before
                FROM t LEFT JOIN b USING (source)
            )
            SELECT id, source, w, CAST(cum_before AS BIGINT) AS cum_before
            FROM c WHERE cum_before < budget
        """,
        # token_budget_sample_tokens: same replay, but the weight is
        # the regex token count (the engine-portable tokenizer both
        # sides share) and budgets are in tokens.
        "token_budget_sample_tokens": """
            WITH t AS (
                SELECT doc_id AS id, source,
                       CAST(len(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS BIGINT) AS w,
                       md5('tb11|' || CAST(doc_id AS VARCHAR)) AS coin
                FROM documents
            ),
            b AS (
                SELECT 'src' || CAST(i AS VARCHAR) AS source,
                       CAST(400 + 100 * (i % 3) AS BIGINT) AS budget
                FROM unnest(range(15)) AS u(i)
            ),
            c AS (
                SELECT t.id, t.source, t.w,
                       coalesce(b.budget, 0) AS budget,
                       sum(t.w) OVER (PARTITION BY t.source ORDER BY t.coin
                                      ROWS UNBOUNDED PRECEDING) - t.w
                           AS cum_before
                FROM t LEFT JOIN b USING (source)
            )
            SELECT id, source, w, CAST(cum_before AS BIGINT) AS cum_before
            FROM c WHERE cum_before < budget
        """,
        # gopher_quality: the published rules with integer-exact pass
        # arithmetic (total_len vs n_words bounds, 10*symbols <= n,
        # 5*alpha >= 4*n, stop hits). round_fixed = floor(x*1e4+0.5).
        "gopher_quality": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '') AS ws,
                       string_split(text, chr(10)) AS lines,
                       list_filter(regexp_split_to_array(lower(text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS toks
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                       len(ws) AS n_words,
                       coalesce(list_sum(list_transform(ws, x -> len(x))), 0)
                           AS total_len,
                       len(list_filter(ws,
                           x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
                       (len(text) - len(replace(text, '#', '')))
                       + (len(text) - len(replace(text, '...', ''))) // 3
                           AS n_symbols,
                       len(lines) AS n_lines,
                       len(list_filter(lines,
                           l -> substr(ltrim(l), 1, 1) IN ('-','*','•')))
                           AS bullets,
                       len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
                           AS ells,
                       CAST(list_contains(toks, 'the') AS INT)
                       + CAST(list_contains(toks, 'be') AS INT)
                       + CAST(list_contains(toks, 'to') AS INT)
                       + CAST(list_contains(toks, 'of') AS INT)
                       + CAST(list_contains(toks, 'and') AS INT)
                       + CAST(list_contains(toks, 'that') AS INT)
                       + CAST(list_contains(toks, 'have') AS INT)
                       + CAST(list_contains(toks, 'with') AS INT) AS stop_hits
                FROM t
            )
            SELECT doc_id AS id,
                   CAST(n_words AS BIGINT) AS n_words,
                   CASE WHEN n_words > 0
                        THEN floor(total_len * 1.0 / n_words * 10000 + 0.5)
                             / 10000
                        ELSE 0.0 END AS mean_word_len,
                   CAST(n_symbols AS BIGINT) AS n_symbols,
                   CASE WHEN n_words > 0
                        THEN floor(alpha_words * 1.0 / n_words * 10000 + 0.5)
                             / 10000
                        ELSE 0.0 END AS alpha_word_ratio,
                   CAST(stop_hits AS BIGINT) AS stop_hits,
                   (n_words >= 50 AND n_words <= 100000
                    AND total_len >= n_words * 3
                    AND total_len <= n_words * 10
                    AND n_symbols * 10 <= n_words
                    AND bullets * 10 <= n_lines * 9
                    AND ells * 10 <= n_lines * 3
                    AND alpha_words * 5 >= n_words * 4
                    AND stop_hits >= 1) AS passes
            FROM m
        """,
        # c4_filter: the same 2-token line synthesis, a '.' planted
        # when md5(line) starts 0-7, ' {' on every 97th doc's LAST
        # line — then the C4 line/page rules. Patterns can't span the
        # synthesized newline separators, so per-line containment ==
        # whole-text containment.
        "c4_filter": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            dotted AS (
                SELECT doc_id, line_no,
                       CASE WHEN substr(md5(line), 1, 1) < '8'
                            THEN line || '.' ELSE line END AS line
                FROM lined
            ),
            braced AS (
                SELECT doc_id, line_no,
                       CASE WHEN doc_id % 97 = 0
                             AND line_no = max(line_no)
                                 OVER (PARTITION BY doc_id)
                            THEN line || ' {' ELSE line END AS line
                FROM dotted
            ),
            judged AS (
                SELECT doc_id, line_no, line,
                       (substr(rtrim(line), -1, 1) IN ('.', '!', '?', '"')
                        AND len(list_filter(
                                regexp_split_to_array(line, '\\s+'),
                                x -> x <> '')) >= 2
                        AND NOT regexp_matches(lower(line), 'javascript'))
                           AS keep_line,
                       contains(line, '{') AS has_brace,
                       contains(lower(line), 'lorem ipsum') AS has_lorem
                FROM braced
            ),
            agg AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_lines,
                       CAST(sum(CASE WHEN keep_line THEN 1 ELSE 0 END)
                            AS BIGINT) AS kept,
                       bool_or(has_brace) AS brace,
                       bool_or(has_lorem) AS lorem,
                       coalesce(string_agg(CASE WHEN keep_line THEN line END,
                                           chr(10) ORDER BY line_no), '')
                           AS kept_text
                FROM judged GROUP BY doc_id
            )
            SELECT doc_id AS id, n_lines,
                   CASE WHEN NOT brace AND NOT lorem AND kept >= 3
                        THEN kept ELSE 0 END AS n_kept,
                   (NOT brace AND NOT lorem AND kept >= 3) AS kept_page,
                   CASE WHEN NOT brace AND NOT lorem AND kept >= 3
                        THEN kept_text ELSE '' END AS clean_text
            FROM agg
        """,
        # length_buckets: exact (length, id) rank -> fixed batches ->
        # per-batch max and padding waste.
        "length_buckets": """
            WITH r AS (
                SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS length,
                       CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
                            AS BIGINT) AS rank
                FROM documents
            ),
            b AS (SELECT *, CAST(rank // 64 AS BIGINT) AS batch_idx FROM r)
            SELECT id, length, rank, batch_idx,
                   CAST(max(length) OVER (PARTITION BY batch_idx)
                        AS BIGINT) AS batch_max_len,
                   CAST(max(length) OVER (PARTITION BY batch_idx) - length
                        AS BIGINT) AS pad_waste
            FROM b
        """,
        # web_pipeline: the composed chain — url keep-first -> C4 ->
        # gopher -> boilerplate lines, each stage the verbatim CTE of
        # its standalone oracle, filtered stepwise. Line-df counts in
        # the final stage run over the FILTERED corpus by design.
        "web_pipeline": _web_pipeline_oracle(False),
        "web_pipeline_full": _web_pipeline_oracle(True),
        # url_dedup: the same deterministic URL synthesis, then RFC
        # 3986 §6 normalization (percent-encoding normalization,
        # scheme/host lowercase, default-port and userinfo and
        # fragment drop, tracker-param strip, query sort, empty path
        # -> '/'), then keep-first per canonical.
        "url_dedup": f"""
            WITH u AS (
                SELECT doc_id, {_URL_SYNTH_CASE} AS url
                FROM documents
            ),
            {_url_canon_ctes("u")}
            SELECT {_URL_CANON_KEY} AS canonical_url,
                   CAST(min(doc_id) AS BIGINT) AS first_id,
                   CAST(count(*) - 1 AS BIGINT) AS n_dups
            FROM p4
            GROUP BY 1
        """,
        # url_host_filter: same host extraction as url_host, suffix
        # expansion via list slicing, longest-match via max_by.
        "url_host_filter": """
            WITH u AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN 'oops no scheme'
                            WHEN doc_id % 3 = 0 THEN
                                'https://www.site' || (doc_id % 7)
                                || '.com/p/' || (doc_id % 11)
                            WHEN doc_id % 3 = 1 THEN
                                'HTTP://CDN.Ads' || (doc_id % 5)
                                || '.NET:8080/x'
                            ELSE 'https://host' || (doc_id % 7) || '.org'
                       END AS url
                FROM documents
            ),
            h AS (
                SELECT doc_id,
                       CASE WHEN regexp_matches(url,
                                '^[A-Za-z][A-Za-z0-9+.-]*://')
                            THEN regexp_replace(
                                lower(CASE WHEN contains(auth, '@')
                                           THEN regexp_extract(auth,
                                                '@(.*)$', 1)
                                           ELSE auth END),
                                ':[0-9]+$', '')
                            ELSE '' END AS host
                FROM (
                    SELECT doc_id, url,
                           regexp_extract(regexp_replace(trim(url),
                               '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                               '^([^/?#]*)', 1) AS auth
                    FROM u
                )
            ),
            sfx AS (
                SELECT doc_id, host,
                       unnest(list_transform(
                           range(1, len(string_split(host, '.')) + 1),
                           i -> array_to_string(
                               string_split(host, '.')[i:], '.'))) AS suffix
                FROM h WHERE host <> ''
            ),
            bl AS (
                SELECT * FROM (VALUES ('ads0.net'), ('ads1.net'),
                    ('site3.com'), ('www.site3.com'), ('host5.org'))
                    AS t(suffix)
            ),
            hit AS (
                SELECT doc_id, max_by(s.suffix, len(s.suffix)) AS matched
                FROM sfx s JOIN bl USING (suffix) GROUP BY doc_id
            )
            SELECT h.doc_id AS id, h.host,
                   hit.matched IS NOT NULL AS blocked, hit.matched
            FROM h LEFT JOIN hit USING (doc_id)
        """,
        # html_extract: identical synthesis + the identical 6-step
        # extraction chain in RE2 (regexes chosen to mean the same
        # thing under Java regex and RE2; entity decode is literal
        # replace in the same order, &amp; last).
        "html_extract": f"""
            WITH {_HTML_EXTRACT_CTES}
            SELECT doc_id, title, clean_text,
                   CAST(length(clean_text) AS BIGINT) AS n_chars
            FROM fin
        """,
        # html_pipeline: extraction feeds the cleaning chain — the
        # blocklist replay, the Gopher quality replay, and the
        # boilerplate line family ALL run over the EXTRACTED text.
        "html_pipeline": f"""
            WITH {_HTML_EXTRACT_CTES},
            ext AS (
                SELECT doc_id, clean_text AS text FROM fin
            ),
            bwhit AS (
                SELECT DISTINCT doc_id FROM (
                    SELECT doc_id,
                           unnest(list_filter(
                               regexp_split_to_array(lower(text),
                                                     '[^a-z0-9]+'),
                               x -> x <> '')) AS t
                    FROM ext
                ) WHERE t IN ('dup')
            ),
            bwkeep AS (
                SELECT doc_id FROM ext
                WHERE doc_id NOT IN (SELECT doc_id FROM bwhit)
            ),
            gt AS (
                SELECT e.doc_id,
                       list_filter(regexp_split_to_array(e.text, '\\s+'),
                                   x -> x <> '') AS gws,
                       string_split(e.text, chr(10)) AS glines,
                       list_filter(regexp_split_to_array(lower(e.text),
                                                         '[^a-z0-9]+'),
                                   x -> x <> '') AS gtoks,
                       e.text AS gtext
                FROM ext e
            ),
            gm AS (
                SELECT doc_id,
                       len(gws) AS n_words,
                       coalesce(list_sum(list_transform(gws, x -> len(x))), 0)
                           AS total_len,
                       len(list_filter(gws,
                           x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha_words,
                       (len(gtext) - len(replace(gtext, '#', '')))
                       + (len(gtext) - len(replace(gtext, '...', ''))) // 3
                           AS n_symbols,
                       len(glines) AS n_lines,
                       len(list_filter(glines,
                           l -> substr(ltrim(l), 1, 1) IN ('-','*','•')))
                           AS bullets,
                       len(list_filter(glines, l -> rtrim(l) LIKE '%...'))
                           AS ells,
                       CAST(list_contains(gtoks, 'the') AS INT)
                       + CAST(list_contains(gtoks, 'be') AS INT)
                       + CAST(list_contains(gtoks, 'to') AS INT)
                       + CAST(list_contains(gtoks, 'of') AS INT)
                       + CAST(list_contains(gtoks, 'and') AS INT)
                       + CAST(list_contains(gtoks, 'that') AS INT)
                       + CAST(list_contains(gtoks, 'have') AS INT)
                       + CAST(list_contains(gtoks, 'with') AS INT) AS stop_hits
                FROM gt
            ),
            gpass AS (
                SELECT doc_id FROM gm
                WHERE n_words >= 50 AND n_words <= 100000
                  AND total_len >= n_words * 3 AND total_len <= n_words * 10
                  AND n_symbols * 10 <= n_words
                  AND bullets * 10 <= n_lines * 9
                  AND ells * 10 <= n_lines * 3
                  AND alpha_words * 5 >= n_words * 4
                  AND stop_hits >= 1
            ),
            stext AS (
                SELECT e.doc_id, e.text
                FROM ext e
                JOIN bwkeep USING (doc_id)
                JOIN gpass USING (doc_id)
            ),
            sw AS (
                SELECT doc_id, string_split(text, chr(10)) AS ls FROM stext
            ),
            sl AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       ls[CAST(i + 1 AS INT)] AS line
                FROM sw, unnest(range(len(ls))) AS u(i)
            ),
            nrm AS (
                SELECT doc_id, line_no, line,
                       trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))
                           AS norm
                FROM sl
            ),
            hot AS (
                SELECT norm FROM nrm WHERE norm <> '' GROUP BY norm
                HAVING count(DISTINCT doc_id) > 15
            ),
            kept2 AS (
                SELECT doc_id, line_no, line FROM nrm
                WHERE norm NOT IN (SELECT norm FROM hot)
            ),
            rebuilt AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY line_no)
                           AS clean_text
                FROM kept2 GROUP BY doc_id
            ),
            base AS (
                SELECT doc_id,
                       CAST(len(string_split(text, chr(10))) AS BIGINT)
                           AS n_lines
                FROM stext
            )
            SELECT base.doc_id AS id, base.n_lines,
                   coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.clean_text, '') AS clean_text
            FROM base LEFT JOIN rebuilt r USING (doc_id)
        """,
        # html_links: same page synthesis; quoted-href extraction via
        # regexp_extract_all group 1; host extraction is the
        # url_host replica; relative hrefs resolve to src_host.
        "html_links": f"""
            WITH pg AS (
                SELECT doc_id, {_HTML_SYNTH_CASE} AS html,
                       {_HTML_SRC_URL_CASE} AS url
                FROM documents
            ),
            src AS (
                SELECT doc_id, html,
                    CASE WHEN regexp_matches(trim(url),
                            '^[A-Za-z][A-Za-z0-9+.-]*://')
                         THEN regexp_replace(lower(
                              CASE WHEN contains(auth, '@')
                                   THEN regexp_extract(auth, '@(.*)$', 1)
                                   ELSE auth END), ':[0-9]+$', '')
                         ELSE '' END AS src_host
                FROM (
                    SELECT doc_id, html, url,
                        regexp_extract(regexp_replace(trim(url),
                            '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                            '^([^/?#]*)', 1) AS auth
                    FROM pg
                )
            ),
            lk AS (
                SELECT doc_id, src_host,
                    unnest(regexp_extract_all(html,
                        '(?is)<a\\b[^>]*\\bhref\\s*=\\s*"([^"]*)"',
                        1)) AS href
                FROM src
            ),
            dst AS (
                SELECT src_host,
                    CASE WHEN h <> '' THEN h ELSE src_host END AS dst_host
                FROM (
                    SELECT src_host,
                        CASE WHEN regexp_matches(trim(href),
                                '^[A-Za-z][A-Za-z0-9+.-]*://')
                             THEN regexp_replace(lower(
                                  CASE WHEN contains(a2, '@')
                                       THEN regexp_extract(a2, '@(.*)$', 1)
                                       ELSE a2 END), ':[0-9]+$', '')
                             ELSE '' END AS h
                    FROM (
                        SELECT src_host, href,
                            regexp_extract(regexp_replace(trim(href),
                                '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                                '^([^/?#]*)', 1) AS a2
                        FROM lk
                    )
                )
            )
            SELECT src_host, dst_host,
                   CAST(count(*) AS BIGINT) AS n_links
            FROM dst GROUP BY 1, 2
        """,
        # kn_nll: the bigram_nll oracle's count pipeline extended with
        # the three KN type counts; probability arithmetic replayed
        # with the exact parenthesization of the Spark expression.
        "kn_nll": """
            WITH w0 AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            big AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS bg
                FROM w0 WHERE len(ws) >= 2
            ),
            cab AS (SELECT bg, count(*) AS c_ab FROM big GROUP BY 1),
            ca AS (SELECT string_split(bg, ' ')[1] AS a,
                          sum(c_ab) AS c_a, count(*) AS n1_fwd
                   FROM cab GROUP BY 1),
            cb AS (SELECT string_split(bg, ' ')[2] AS b,
                          count(*) AS n1_back
                   FROM cab GROUP BY 1),
            nt AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM cab),
            p AS (
                SELECT bg,
                       (greatest(c_ab - 0.75, 0.0) / c_a)
                       + (((0.75 * n1_fwd) / c_a) * (n1_back / nt.nt)) AS p
                FROM cab
                JOIN ca ON string_split(cab.bg, ' ')[1] = ca.a
                JOIN cb ON string_split(cab.bg, ' ')[2] = cb.b, nt
            )
            SELECT id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   floor(-avg(log2(p.p)) * 1000000 + 0.5)/1000000 AS nll_bits
            FROM big JOIN p USING (bg)
            GROUP BY id
        """,
        # robots_filter: host/path extraction replica + the rules as
        # VALUES + RFC 9309 longest-match/allow-wins via the same
        # packed ordering key (printf('%04d') == lpad-4).
        "robots_filter": """
            WITH u AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN 'not a url'
                            WHEN doc_id % 3 = 0 THEN
                                'https://site' || (doc_id % 7)
                                || '.com/private/' || (doc_id % 11)
                            WHEN doc_id % 3 = 1 THEN
                                'https://site' || (doc_id % 7)
                                || '.com/public/' || (doc_id % 11)
                            ELSE 'https://open' || (doc_id % 7) || '.org'
                       END AS url
                FROM documents
            ),
            hp AS (
                SELECT doc_id,
                       CASE WHEN ok THEN host ELSE '' END AS host,
                       CASE WHEN ok THEN
                                CASE WHEN p = '' THEN '/' ELSE p END
                            ELSE '' END AS path
                FROM (
                    SELECT doc_id,
                        regexp_matches(trim(url),
                            '^[A-Za-z][A-Za-z0-9+.-]*://') AS ok,
                        regexp_replace(lower(
                            CASE WHEN contains(auth, '@')
                                 THEN regexp_extract(auth, '@(.*)$', 1)
                                 ELSE auth END), ':[0-9]+$', '') AS host,
                        regexp_extract(regexp_replace(rest,
                            '^[^/?#]*', ''), '^([^?#]*)', 1) AS p
                    FROM (
                        SELECT doc_id, url,
                            regexp_replace(trim(url),
                                '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
                            regexp_extract(regexp_replace(trim(url),
                                '^[A-Za-z][A-Za-z0-9+.-]*://', ''),
                                '^([^/?#]*)', 1) AS auth
                        FROM u
                    )
                )
            ),
            r AS (
                SELECT * FROM (VALUES
                    ('site0.com', false, '/'),
                    ('site0.com', true, '/public/'),
                    ('site1.com', false, '/private/'),
                    ('site1.com', true, '/private/7'),
                    ('site2.com', false, '/private'),
                    ('site2.com', true, '/private'),
                    ('open3.org', false, '/x'))
                    AS t(host, allow, prefix)
                WHERE prefix <> ''
            ),
            cand AS (
                SELECT hp.doc_id AS id, hp.host, hp.path,
                       CASE WHEN r.prefix IS NOT NULL
                             AND starts_with(hp.path, r.prefix)
                            THEN printf('%04d', len(r.prefix))
                                 || CAST(CAST(r.allow AS INT) AS VARCHAR)
                                 || r.prefix
                       END AS k
                FROM hp LEFT JOIN r USING (host)
            ),
            agg AS (
                SELECT id, host, path, max(k) AS k
                FROM cand GROUP BY 1, 2, 3
            )
            SELECT id, host, path,
                   coalesce(substr(k, 5, 1) = '1', true) AS allowed,
                   coalesce(substr(k, 6), '') AS matched_rule
            FROM agg
        """,
        # sentence_dedup: dotting synthesis (the web_pipeline rule,
        # space-joined), regexp sentence segmentation, keep-first via
        # a row_number window — an independent formulation of the
        # operator's min-struct decision.
        "sentence_dedup": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            dotted AS (
                SELECT doc_id, line_no,
                       CASE WHEN substr(md5(line), 1, 1) < '8'
                            THEN line || '.' ELSE line END AS line
                FROM lined
            ),
            txt AS (
                SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
                FROM dotted GROUP BY doc_id
            ),
            sa AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               s -> trim(s, ' ' || chr(9) || chr(10)
                                          || chr(13) || chr(12))),
                           s -> s <> '') AS ss
                FROM txt
            ),
            sx AS (
                SELECT doc_id, CAST(i AS INT) AS sent_no,
                       ss[CAST(i + 1 AS INT)] AS s
                FROM sa, unnest(range(len(ss))) AS u(i)
            ),
            nr AS (
                SELECT doc_id, sent_no, s,
                       trim(regexp_replace(lower(s), '\\s+', ' ', 'g'))
                           AS norm
                FROM sx
            ),
            rn AS (
                SELECT doc_id, sent_no, s, norm,
                       row_number() OVER (PARTITION BY norm
                           ORDER BY doc_id, sent_no) AS rk,
                       count(*) OVER (PARTITION BY norm) AS cnt
                FROM nr
            ),
            kept AS (
                SELECT doc_id, sent_no, s FROM rn
                WHERE norm = '' OR cnt = 1 OR rk = 1
            ),
            rebuilt AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(s, ' ' ORDER BY sent_no) AS clean_text
                FROM kept GROUP BY doc_id
            ),
            base AS (
                SELECT doc_id, CAST(len(ss) AS BIGINT) AS n_sents FROM sa
            )
            SELECT base.doc_id, base.n_sents,
                   coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.clean_text, '') AS clean_text
            FROM base LEFT JOIN rebuilt r USING (doc_id)
        """,
        # stream_sentence_dedup: the emitted set == distinct sentence
        # norms of the closed input (same synthesis + segmentation).
        "stream_sentence_dedup": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            dotted AS (
                SELECT doc_id, line_no,
                       CASE WHEN substr(md5(line), 1, 1) < '8'
                            THEN line || '.' ELSE line END AS line
                FROM lined
            ),
            txt AS (
                SELECT doc_id, string_agg(line, ' ' ORDER BY line_no) AS text
                FROM dotted GROUP BY doc_id
            ),
            sa AS (
                SELECT doc_id,
                       list_filter(
                           list_transform(
                               regexp_extract_all(text, '[^.!?]+[.!?]*'),
                               s -> trim(s, ' ' || chr(9) || chr(10)
                                          || chr(13) || chr(12))),
                           s -> s <> '') AS ss
                FROM txt
            ),
            sx AS (
                SELECT doc_id, ss[CAST(i + 1 AS INT)] AS s
                FROM sa, unnest(range(len(ss))) AS u(i)
            )
            SELECT DISTINCT
                   trim(regexp_replace(lower(s), '\\s+', ' ', 'g')) AS norm
            FROM sx
        """,
        # badword_filter: whole-token blocklist hits over the shared
        # tokenizer; hit set sorted + comma-joined on both engines.
        "badword_filter": """
            WITH w0 AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            tok AS (
                SELECT DISTINCT doc_id, unnest(ws) AS t FROM w0
            ),
            hit AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                       string_agg(t, ',' ORDER BY t) AS hit_words
                FROM tok
                WHERE t IN ('crash', 'dup', 'skew', 'slow', 'spill')
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   (h.doc_id IS NOT NULL) AS blocked,
                   COALESCE(h.n_hits, 0) AS n_hits,
                   COALESCE(h.hit_words, '') AS hit_words
            FROM documents d LEFT JOIN hit h USING (doc_id)
        """,
        # stream_url_dedup: the emitted set == distinct canonical
        # URLs of the closed input (same synthesis + normalization).
        "stream_url_dedup": f"""
            WITH u AS (
                SELECT doc_id, {_URL_SYNTH_CASE} AS url
                FROM documents
            ),
            {_url_canon_ctes("u")}
            SELECT DISTINCT {_URL_CANON_KEY} AS canonical_url
            FROM p4
        """,
        # boilerplate_lines / line_dedup_keep_first: documents re-cut
        # into deterministic 2-token lines (line i = words[2i:2i+2]),
        # then the line-hash family over the normalized line.
        "boilerplate_lines": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            nrm AS (
                SELECT *, trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))
                           AS norm
                FROM lined
            ),
            hot AS (
                SELECT norm FROM nrm WHERE norm <> '' GROUP BY norm
                HAVING count(DISTINCT doc_id) > 15
            ),
            kept AS (
                SELECT doc_id, line_no, line FROM nrm
                WHERE norm NOT IN (SELECT norm FROM hot)
            ),
            rebuilt AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY line_no)
                           AS clean_text
                FROM kept GROUP BY doc_id
            )
            SELECT w.doc_id AS id,
                   CAST(ceil(len(w.ws)/2.0) AS BIGINT) AS n_lines,
                   coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.clean_text, '') AS clean_text
            FROM w LEFT JOIN rebuilt r USING (doc_id)
        """,
        "line_dedup_keep_first": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT doc_id, CAST(i AS INT) AS line_no,
                       array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            nrm AS (
                SELECT *, trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))
                           AS norm
                FROM lined
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                           PARTITION BY norm ORDER BY doc_id, line_no
                       ) AS rn
                FROM nrm
            ),
            rebuilt AS (
                SELECT doc_id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(line, chr(10) ORDER BY line_no)
                           AS clean_text
                FROM ranked WHERE rn = 1 OR norm = '' GROUP BY doc_id
            )
            SELECT w.doc_id AS id,
                   CAST(ceil(len(w.ws)/2.0) AS BIGINT) AS n_lines,
                   coalesce(r.n_kept, 0) AS n_kept,
                   coalesce(r.clean_text, '') AS clean_text
            FROM w LEFT JOIN rebuilt r USING (doc_id)
        """,
        # stream_hot_lines: the emitted set == lines whose closed-input
        # occurrence count exceeds the threshold (crossing emission is
        # batch-placement independent as a SET).
        "stream_hot_lines": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            lined AS (
                SELECT array_to_string(ws[2*i+1 : 2*i+2], ' ') AS line
                FROM w, unnest(range(CAST(ceil(len(ws)/2.0) AS BIGINT))) AS u(i)
            ),
            nrm AS (
                SELECT trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))
                           AS norm
                FROM lined
            )
            SELECT norm FROM nrm GROUP BY norm HAVING count(*) > 20
        """,
        "epoch_shuffle": """
            WITH r AS (
                SELECT doc_id,
                       CAST(row_number() OVER (
                           ORDER BY md5('ep1|' || CAST(doc_id AS VARCHAR)),
                                    doc_id) - 1 AS BIGINT) AS rank
                FROM documents
            )
            SELECT doc_id, rank,
                   CAST(rank // 256 AS BIGINT) AS batch_idx,
                   CAST(rank % 256 AS BIGINT) AS pos_in_batch
            FROM r
        """,
        "heavy_hitters": """
            WITH w AS (
                SELECT unnest(string_split(text, ' ')) AS word
                FROM documents
            ), nn AS (SELECT word FROM w WHERE word <> '')
            SELECT word, CAST(count(*) AS BIGINT) AS cnt
            FROM nn
            GROUP BY 1
            HAVING count(*) * 100 >= (SELECT count(*) FROM nn)
        """,
        "tpch_q12": """
            SELECT l_returnflag AS ship_mode,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE l_returnflag IN ('A', 'R')
              AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate > o_orderdate
            GROUP BY 1
        """,
        "tpch_q11": f"""
            WITH partsupp AS ({_PARTSUPP_SQL}),
            nps AS (
                SELECT ps_partkey, ps_supplycost * ps_availqty AS val
                FROM partsupp
                JOIN supplier ON ps_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_7'
            )
            SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey,
                   CAST(SUM(val) AS BIGINT) AS part_value
            FROM nps
            GROUP BY 1
            HAVING SUM(val) * 10000 > (SELECT SUM(val) FROM nps)
        """,
        "tpch_q16": f"""
            WITH partsupp AS ({_PARTSUPP_SQL})
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
            FROM partsupp
            JOIN part ON ps_partkey = p_partkey
            WHERE p_brand <> 'Brand#23' AND p_type <> 'PROMO'
              AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
              AND ps_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
              )
            GROUP BY 1, 2, 3
        """,
        "tpch_q20": f"""
            WITH partsupp AS ({_PARTSUPP_SQL}),
            shipped AS (
                SELECT l_partkey AS qk, l_suppkey AS qs,
                       SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                GROUP BY 1, 2
            )
            SELECT s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
              AND s_suppkey IN (
                  SELECT ps_suppkey
                  FROM partsupp
                  JOIN part ON ps_partkey = p_partkey
                  JOIN shipped ON ps_partkey = qk AND ps_suppkey = qs
                  WHERE p_name LIKE 'red %'
                    AND CAST(2 * ps_availqty AS DECIMAL(12,2)) > sum_qty
              )
        """,
        "tpch_q4": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
              AND EXISTS (
                  SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
              )
            GROUP BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS revenue
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                 AND TIMESTAMP '1997-12-31 00:00:00'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        # Q17 with the correlated AVG decorrelated and made exact:
        # l_q < 0.2*(sum/cnt)  <=>  5*l_q*cnt < sum (decimal-exact)
        "tpch_q17": """
            WITH pp AS (
                SELECT l_partkey AS pk,
                       SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_q,
                       count(*) AS cnt_q
                FROM lineitem GROUP BY 1
            )
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       / 7.0 AS avg_yearly
            FROM lineitem
            JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
            JOIN pp ON l_partkey = pp.pk
            WHERE CAST(5 AS DECIMAL(4,0)) * CAST(l_quantity AS DECIMAL(12,2))
                      * cnt_q
                  < sum_q
        """,
        # Q22 adapted: cntrycode := c_nationkey; threshold rewrite
        # bal*cnt > sum keeps the global average exact-decimal
        "tpch_q22": """
            WITH pos AS (
                SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_b,
                       count(*) AS cnt_b
                FROM customer WHERE c_acctbal > 0
            )
            SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
                   CAST(count(*) AS BIGINT) AS numcust,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       AS totacctbal
            FROM customer CROSS JOIN pos
            WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt_b > sum_b
              AND NOT EXISTS (
                  SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
              )
            GROUP BY 1
        """,
        "tpch_q14": """
            SELECT 100.0 * COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2)))
                       END) AS DOUBLE), 0.0)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))))
                          AS DOUBLE) AS promo_pct,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS total_rev,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        """,
        "tpch_q18": """
            WITH big AS (
                SELECT l_orderkey,
                       SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
                FROM lineitem GROUP BY 1
                HAVING SUM(CAST(l_quantity AS DECIMAL(12,2)))
                       > CAST(300 AS DECIMAL(12,2))
            )
            SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
                   CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                       AS o_totalprice,
                   CAST(b.qty AS DOUBLE) AS sum_qty
            FROM big b
            JOIN orders o ON b.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "tpch_q15": """
            WITH rev AS (
                SELECT l_suppkey,
                       SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                           (CAST(1 AS DECIMAL(4,2))
                            - CAST(l_discount AS DECIMAL(12,2)))) AS total_rev
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
                GROUP BY 1
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(r.total_rev AS DOUBLE) AS total_rev
            FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
            WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
        """,
        "tpch_q19": """
            SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 20 AND 30)
        """,
        "topk_per_group": """
            SELECT p_brand, p_partkey, p_retailprice, CAST(rk AS INTEGER) AS rk
            FROM (
                SELECT p_brand, p_partkey, p_retailprice,
                       row_number() OVER (PARTITION BY p_brand
                                          ORDER BY p_retailprice DESC, p_partkey) AS rk
                FROM part
            ) WHERE rk <= 3
        """,
        "annotate_multisnapshot": """
            WITH mv AS (SELECT (max(p_partkey)+1)*10//9 AS m FROM part),
            probes AS (
                SELECT event_id,
                       167772160
                       + ((user_id*131 + event_id*7919) % (SELECT m FROM mv))*256
                       + event_id % 256 AS v,
                       CASE WHEN event_id % 3 = 0 THEN DATE '2019-06-01'
                            WHEN event_id % 3 = 1 THEN DATE '2020-03-01'
                            ELSE DATE '2021-01-01' END AS req_date
                FROM events
            ),
            sel AS (
                SELECT *,
                       CASE WHEN req_date > DATE '2020-07-01' THEN DATE '2020-07-01'
                            ELSE DATE '2020-01-01' END AS dataset_date
                FROM probes
            ),
            ranges AS (
                SELECT 167772160 + p_partkey*256 AS low,
                       167772160 + p_partkey*256 + 255 AS high,
                       p_brand AS brand, DATE '2020-01-01' AS dataset_date
                FROM part
                UNION ALL
                SELECT 167772160 + p_partkey*256,
                       167772160 + p_partkey*256 + 255,
                       p_brand || '-v2', DATE '2020-07-01'
                FROM part
            )
            SELECT s.event_id, s.req_date, s.dataset_date,
                   COALESCE(r.brand, 'MISSING') AS brand
            FROM sel s
            LEFT JOIN ranges r ON r.dataset_date = s.dataset_date
                              AND s.v BETWEEN r.low AND r.high
        """,
        "corpus_curation": """
            WITH toks AS (
                SELECT doc_id, text, source,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS tk
                FROM documents
            ),
            m AS (
                SELECT doc_id, source,
                       len(tk) AS n_tokens,
                       CASE WHEN len(tk) > 0 THEN
                         CAST(len(list_filter(tk, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS DOUBLE)/len(tk)
                       ELSE 0.0 END AS stop_ratio,
                       CASE WHEN length(text) > 0 THEN
                         CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)/length(text)
                       ELSE 0.0 END AS punct_ratio,
                       CASE WHEN len(tk) > 0 THEN
                         CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)/len(tk)
                       ELSE 0.0 END AS wl,
                       len(list_filter(tk, x -> list_contains(['the','a','of','and','is','to','in'], x))) AS s_en,
                       len(list_filter(tk, x -> list_contains(['der','die','das','und','ist','ein'], x))) AS s_de,
                       len(list_filter(tk, x -> list_contains(['le','la','les','et','est','un'], x))) AS s_fr,
                       len(list_filter(tk, x -> list_contains(['el','la','los','y','es','un'], x))) AS s_es,
                       len(list_filter(tk, x -> list_contains(['de','shi','le','zai','he'], x))) AS s_zh
                FROM toks
            ),
            q AS (
                SELECT doc_id, source, n_tokens,
                       floor((0.3*least(stop_ratio*5, 1.0)
                             + 0.25*(1.0 - least(punct_ratio*4, 1.0))
                             + 0.25*least(n_tokens/100.0, 1.0)
                             + 0.2*(1.0 - least(abs(wl - 5.0)/5.0, 1.0)))*1e4 + 0.5)/1e4 AS quality,
                       CASE
                         WHEN s_zh > s_en AND s_zh > s_de AND s_zh > s_fr AND s_zh > s_es THEN 'zh'
                         WHEN s_es > s_en AND s_es > s_de AND s_es > s_fr THEN 'es'
                         WHEN s_fr > s_en AND s_fr > s_de THEN 'fr'
                         WHEN s_de > s_en THEN 'de'
                         ELSE 'en'
                       END AS pred_lang
                FROM m
            ),
            keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
            SELECT pred_lang, source,
                   COUNT(*) AS n_docs,
                   SUM(CAST(floor(quality*10000 + 0.5) AS BIGINT))/COUNT(*)/10000.0 AS avg_quality,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM q JOIN keep USING (doc_id)
            WHERE quality >= 0.55
            GROUP BY 1, 2
        """,
        "multimodal_pipeline": """
            WITH geom AS (
                SELECT doc_id,
                       CAST(n_chars % 64 + 1 AS DOUBLE) AS w,
                       CAST(n_chars % 48 + 1 AS DOUBLE) AS h,
                       n_chars % 7 + 1 AS n_frames,
                       text
                FROM documents
            )
            SELECT doc_id AS media_id,
                   CAST(octet_length(unhex(md5(text) || md5('2|' || text))) AS BIGINT) AS n_bytes,
                   CAST(16 AS BIGINT) AS feat_dim,
                   CAST((n_frames - 1) // 2 + 1 AS BIGINT) AS n_sampled_frames,
                   CAST(ceil(w * least(1.0, 32.0/greatest(w, h))) AS BIGINT) AS resize_w,
                   CAST(ceil(h * least(1.0, 32.0/greatest(w, h))) AS BIGINT) AS resize_h
            FROM geom
        """,
        # span_dedup: k=8 token spans; a gram occurrence is duplicated
        # if its 8-gram occurs >= twice corpus-wide (incl. same doc);
        # covered tokens = union of equal-length intervals = sum of
        # min(k, next_pos - pos) over sorted marked positions per doc.
        "span_dedup": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-6),
                              i -> {'pos': i,
                                    'g': array_to_string(ws[i:i+7], ' ')}),
                              recursive := true)
                FROM w WHERE len(ws) >= 8
            ),
            dup AS (
                SELECT g FROM grams GROUP BY g HAVING count(*) > 1
            ),
            marked AS (
                SELECT id, pos FROM grams JOIN dup USING (g)
            ),
            cov AS (
                SELECT id,
                       CAST(sum(least(8, coalesce(nxt - pos, 8))) AS BIGINT)
                           AS dup_tokens
                FROM (
                    SELECT id, pos,
                           lead(pos) OVER (PARTITION BY id ORDER BY pos) AS nxt
                    FROM marked
                )
                GROUP BY id
            )
            SELECT w.doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   CASE WHEN len(ws) > 0
                        THEN CAST(coalesce(cov.dup_tokens, 0) AS DOUBLE)
                             / len(ws)
                        ELSE 0.0 END AS dup_frac
            FROM w LEFT JOIN cov ON w.doc_id = cov.id
        """,
        # span_dedup_apply: same marked-span derivation as span_dedup,
        # then covered positions expand via range(), kept tokens
        # reassemble with string_agg ORDER BY pos.
        "span_dedup_apply": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-6),
                              i -> {'pos': i,
                                    'g': array_to_string(ws[i:i+7], ' ')}),
                              recursive := true)
                FROM w WHERE len(ws) >= 8
            ),
            dup AS (
                SELECT g FROM grams GROUP BY g HAVING count(*) > 1
            ),
            covered AS (
                SELECT DISTINCT id,
                       unnest(range(pos, pos + 8)) AS pos
                FROM grams JOIN dup USING (g)
            ),
            tok AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)+1),
                              i -> {'pos': i, 'tok': ws[i]}),
                              recursive := true)
                FROM w
            ),
            kept AS (
                SELECT t.id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
                FROM tok t ANTI JOIN covered c
                     ON t.id = c.id AND t.pos = c.pos
                GROUP BY t.id
            )
            SELECT w.doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
                   coalesce(kept.clean_text, '') AS clean_text
            FROM w LEFT JOIN kept ON w.doc_id = kept.id
        """,
        # shared_passages: k=8 anchor grams (0-based positions to
        # match posexplode), df<=1000 stop-gram cap, diagonal
        # gaps-and-islands (pa - row_number), maximal runs >= 15
        # tokens. Gram identity is the joined token string — Spark
        # md5s it, but equal strings <=> equal md5s, so the pair set
        # is identical.
        "shared_passages": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-6),
                              i -> {'pos': i - 1,
                                    'g': array_to_string(ws[i:i+7], ' ')}),
                              recursive := true)
                FROM w WHERE len(ws) >= 8
            ),
            capped AS (
                SELECT * FROM grams
                WHERE g IN (SELECT g FROM grams GROUP BY g
                            HAVING count(*) <= 1000)
            ),
            anchors AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       a.pos AS pa, b.pos AS pb,
                       a.pos - b.pos AS diag
                FROM capped a JOIN capped b ON a.g = b.g AND a.id < b.id
            ),
            runs AS (
                SELECT id_a, id_b, diag, pa, pb,
                       pa - row_number() OVER (
                           PARTITION BY id_a, id_b, diag ORDER BY pa
                       ) AS grp
                FROM anchors
            )
            SELECT id_a, id_b,
                   CAST(min(pa) AS BIGINT) AS start_a,
                   CAST(min(pb) AS BIGINT) AS start_b,
                   CAST(max(pa) - min(pa) + 8 AS BIGINT) AS length
            FROM runs
            GROUP BY id_a, id_b, diag, grp
            HAVING max(pa) - min(pa) + 8 >= 15
        """,
        # span_dedup_keep_first: the canonical survivor of each
        # duplicated gram is its first (id, pos) occurrence; only
        # non-canonical occurrences mark spans.
        "span_dedup_keep_first": """
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            grams AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-6),
                              i -> {'pos': i,
                                    'g': array_to_string(ws[i:i+7], ' ')}),
                              recursive := true)
                FROM w WHERE len(ws) >= 8
            ),
            ranked AS (
                SELECT id, pos, g,
                       row_number() OVER (PARTITION BY g ORDER BY id, pos)
                           AS rn,
                       count(*) OVER (PARTITION BY g) AS cnt
                FROM grams
            ),
            covered AS (
                SELECT DISTINCT id,
                       unnest(range(pos, pos + 8)) AS pos
                FROM ranked WHERE cnt > 1 AND rn > 1
            ),
            tok AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)+1),
                              i -> {'pos': i, 'tok': ws[i]}),
                              recursive := true)
                FROM w
            ),
            kept AS (
                SELECT t.id,
                       CAST(count(*) AS BIGINT) AS n_kept,
                       string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
                FROM tok t ANTI JOIN covered c
                     ON t.id = c.id AND t.pos = c.pos
                GROUP BY t.id
            )
            SELECT w.doc_id,
                   CAST(len(ws) AS BIGINT) AS n_tokens,
                   CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
                   coalesce(kept.clean_text, '') AS clean_text
            FROM w LEFT JOIN kept ON w.doc_id = kept.id
        """,
        "dedup_incremental": """
            WITH seen AS (
                SELECT DISTINCT md5(text) AS content_hash
                FROM documents WHERE doc_id % 3 = 0
            ),
            incoming AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
                UNION ALL
                SELECT doc_id + 1000000, text FROM documents
                WHERE doc_id % 10 = 1
                UNION ALL
                SELECT doc_id + 2000000, text FROM documents
                WHERE doc_id % 3 = 0
            ),
            fresh AS (
                SELECT i.doc_id, md5(i.text) AS content_hash
                FROM incoming i ANTI JOIN seen s
                     ON md5(i.text) = s.content_hash
            )
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, content_hash
            FROM fresh GROUP BY content_hash
        """,
        # temperature_mix: alpha=0.5 -> keep rate sqrt(n_min/n_s);
        # division and sqrt are IEEE correctly-rounded, so the floored
        # threshold matches Spark bit-for-bit (pow would not).
        "temperature_mix": """
            WITH s AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 10 < 6 THEN 'big'
                            WHEN doc_id % 10 < 9 THEN 'mid'
                            ELSE 'small' END AS stratum
                FROM documents
            ),
            c AS (
                SELECT stratum, count(*) AS n FROM s GROUP BY stratum
            ),
            r AS (
                SELECT stratum,
                       CAST(floor(sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE)
                                       / n) * 10000) AS BIGINT) AS thr
                FROM c
            )
            SELECT d.doc_id, d.stratum
            FROM s d JOIN r USING (stratum)
            WHERE CAST('0x' || substr(md5('temp1' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 10000 < thr
        """,
        "tpch_q10": """
            SELECT c_custkey, c_name, n_name,
                   CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(4,2))
                           - CAST(l_discount AS DECIMAL(12,2))))
                        AS DOUBLE) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1996-04-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, c_custkey
            LIMIT 20
        """,
        # scd_asof: DuckDB's native ASOF JOIN (greatest vts <= ts per
        # user) against the same daily version derivation.
        "scd_asof": """
            WITH v AS (
                SELECT user_id,
                       min(ts) AS vts,
                       CAST((user_id + CAST(floor(epoch(date_trunc('day', ts))
                                                  / 86400) AS BIGINT)) % 4
                            AS BIGINT) AS tier
                FROM events
                GROUP BY user_id, date_trunc('day', ts)
            )
            SELECT e.event_id, e.user_id, v.tier
            FROM events e
            ASOF LEFT JOIN v
              ON e.user_id = v.user_id AND e.ts >= v.vts
        """,
        "event_topk_windowed": """
            WITH c AS (
                SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                       event_type,
                       CAST(count(*) AS BIGINT) AS n_events,
                       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                           AS sum_v_milli
                FROM events GROUP BY 1, 2
            )
            SELECT window_start, event_type, n_events,
                   CAST(rk AS INTEGER) AS rk
            FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY window_start
                           ORDER BY n_events DESC, event_type ASC) AS rk
                FROM c
            )
            WHERE rk <= 3
        """,
        "cms_counts": """
            WITH tok AS (
                SELECT unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS token
                FROM documents
            ),
            cells AS (
                SELECT i.i AS row,
                       CAST('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                            || '|' || token), 1, 8) AS BIGINT) % 1024 AS bucket,
                       count(*) AS c
                FROM tok, range(0, 4) i(i)
                GROUP BY 1, 2
            ),
            probes AS (SELECT DISTINCT token FROM tok),
            pc AS (
                SELECT token, i.i AS row,
                       CAST('0x' || substr(md5('cms' || CAST(i.i AS VARCHAR)
                            || '|' || token), 1, 8) AS BIGINT) % 1024 AS bucket
                FROM probes, range(0, 4) i(i)
            ),
            est AS (
                SELECT token, CAST(min(coalesce(c, 0)) AS BIGINT) AS est
                FROM pc LEFT JOIN cells USING (row, bucket)
                GROUP BY token
            ),
            exact AS (
                SELECT token, CAST(count(*) AS BIGINT) AS cnt
                FROM tok GROUP BY token
            )
            SELECT exact.token, cnt, est FROM exact JOIN est USING (token)
        """,
        "unigram_nll": """
            WITH tok AS (
                SELECT doc_id AS id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS token
                FROM documents
            ),
            v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
            p AS (
                SELECT token,
                       cnt / (SELECT CAST(sum(cnt) AS DOUBLE) FROM v) AS p
                FROM v
            )
            SELECT id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   floor(-avg(log2(p.p)) * 1000000 + 0.5)/1000000 AS nll_bits
            FROM tok JOIN p USING (token)
            GROUP BY id
        """,
        "vocab_topk": """
            WITH tok AS (
                SELECT doc_id AS id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS token
                FROM documents
            ),
            per_doc AS (
                SELECT token, id, count(*) AS c FROM tok GROUP BY 1, 2
            )
            SELECT token,
                   CAST(sum(c) AS BIGINT) AS cnt,
                   CAST(count(*) AS BIGINT) AS df_docs
            FROM per_doc
            GROUP BY token
            ORDER BY cnt DESC, token ASC
            LIMIT 100
        """,
        # hopping windows: an event at t belongs to the 30-min-aligned
        # bucket containing t and the one 30 min earlier (width 1h,
        # slide 30m, epoch-aligned — Spark's window() convention).
        "event_rollup_hopping": """
            WITH x AS (
                SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                               time_bucket(INTERVAL '30 minutes', ts)
                                   - INTERVAL '30 minutes']) AS window_start,
                       event_type,
                       value
                FROM events
            )
            SELECT window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli
            FROM x GROUP BY 1, 2
        """,
        # embedding_gram: the float32→double cast then floor(x·1e6)
        # quantization is bit-identical in both engines; int64 sums
        # are order-independent, so equality is exact.
        "embedding_gram": """
            WITH q AS (
                SELECT list_transform(embedding,
                           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000)
                                     AS BIGINT)) AS qv
                FROM embeddings
            )
            SELECT CAST(i.i AS INTEGER) AS i,
                   CAST(j.j AS INTEGER) AS j,
                   CAST(sum(qv[i.i] * qv[j.j]) AS BIGINT) AS g
            FROM q, range(1, 65) i(i), range(1, 65) j(j)
            WHERE j.j >= i.i
            GROUP BY 1, 2
        """,
        "distinct_users": """
            SELECT event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY event_type
        """,
        # streaming twin: identical batch SQL (bounded input =>
        # streaming result == batch result, hash-checked)
        "stream_rollup": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli
            FROM events
            GROUP BY 1, 2
        """,
        "event_rollup": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli
            FROM events
            GROUP BY 1, 2
        """,
        "kmeans_fixed": _kmeans_oracle(8, 2),
        "posting_lists": """
            WITH tok AS (
                SELECT DISTINCT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '')) AS token
                FROM documents
            )
            SELECT token,
                   array_to_string(list_transform(list_sort(list(doc_id)),
                                                  x -> CAST(x AS VARCHAR)),
                                   ',') AS postings,
                   CAST(count(*) AS BIGINT) AS df
            FROM tok
            GROUP BY token
            HAVING count(*) >= 5
        """,
        "tfidf_pairs": """
            WITH w0 AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            sh AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)-1),
                              i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS s
                FROM w0 WHERE len(ws) >= 3
            ),
            tf AS (SELECT id, s, CAST(count(*) AS DOUBLE) AS tf
                   FROM sh GROUP BY 1, 2),
            nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
            dfq AS (
                SELECT s, count(*) AS df,
                       ln((n_docs + 1.0)/(count(*) + 1.0)) + 1.0 AS idf
                FROM tf, nd GROUP BY s, n_docs HAVING count(*) <= 1000
            ),
            w AS (SELECT id, s, df, tf * idf AS w FROM tf JOIN dfq USING (s)),
            norms AS (SELECT id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
            dots AS (
                SELECT a.id AS doc_a, b.id AS doc_b, sum(a.w * b.w) AS dot
                FROM w a JOIN w b ON a.s = b.s AND a.id < b.id
                WHERE a.df >= 2 AND b.df >= 2
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   floor(dot/(na.nrm*nb.nrm) * 1000000.0 + 0.5)/1000000.0 AS sim
            FROM dots
            JOIN norms na ON na.id = doc_a
            JOIN norms nb ON nb.id = doc_b
            WHERE floor(dot/(na.nrm*nb.nrm) * 1000000.0 + 0.5)/1000000.0 >= 0.5
        """,
        # window-formulation replica of the linear interpolation (the
        # same IEEE double op sequence, so values are bit-identical)
        "linear_interp": """
            WITH obs AS (
                SELECT user_id, date_trunc('day', ts) AS bucket, ts,
                       event_id, floor(value*1000)/1000.0 AS v
                FROM events
            ),
            latest AS (
                SELECT user_id, bucket, v, true AS hit FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, bucket
                        ORDER BY ts DESC, event_id DESC) AS rk
                    FROM obs
                ) WHERE rk = 1
            ),
            span AS (SELECT date_trunc('day', min(ts)) AS lo,
                            date_trunc('day', max(ts)) AS hi FROM events),
            grid AS (
                SELECT user_id,
                       unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
                FROM (SELECT DISTINCT user_id FROM events), span
            ),
            j AS (
                SELECT g.user_id, g.bucket, l.v,
                       coalesce(l.hit, false) AS observed
                FROM grid g LEFT JOIN latest l
                  ON g.user_id = l.user_id AND g.bucket = l.bucket
            ),
            e AS (
                SELECT *,
                    last_value(v IGNORE NULLS) OVER
                        (PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                    last_value(CASE WHEN observed THEN bucket END IGNORE NULLS) OVER
                        (PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
                    first_value(v IGNORE NULLS) OVER
                        (PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                    first_value(CASE WHEN observed THEN bucket END IGNORE NULLS) OVER
                        (PARTITION BY user_id ORDER BY bucket
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
                FROM j
            )
            SELECT user_id, CAST(bucket AS DATE) AS grid_date,
                   floor((CASE WHEN observed THEN v
                               WHEN pv IS NULL THEN NULL
                               WHEN nv IS NULL THEN pv
                               ELSE pv + (nv - pv) *
                                    (CAST(date_diff('day', pd, bucket) AS DOUBLE)
                                     / CAST(date_diff('day', pd, nd) AS DOUBLE))
                          END) * 1000000 + 0.5) / 1000000 AS v_interp,
                   observed
            FROM e
        """,
        "first_touch": """
            SELECT user_id,
                   arg_min(event_type, epoch_us(ts)) AS first_touch,
                   arg_max(event_type, epoch_us(ts)) AS last_touch,
                   CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
                   CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        """,
        "stats_agg": """
            SELECT event_type,
                   floor(stddev_samp(value) * 1000000 + 0.5)/1000000 AS sd_v,
                   floor(covar_samp(value, CAST(hour(ts) AS DOUBLE))
                         * 1000000 + 0.5)/1000000 AS cov_vh,
                   floor(corr(value, CAST(hour(ts) AS DOUBLE))
                         * 1000000 + 0.5)/1000000 AS corr_vh,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        """,
        # gaps-and-islands replay of Spark's native session_window
        # semantics (session end = last event + gap)
        "session_rollup": """
            WITH s AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            g AS (
                SELECT *, sum(brk) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
                FROM s
            )
            SELECT user_id,
                   min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli
            FROM g GROUP BY user_id, grp
        """,
        "mom_revenue": """
            WITH m AS (
                SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                       SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev,
                       CAST(count(*) AS BIGINT) AS n_orders
                FROM orders GROUP BY 1
            )
            SELECT month,
                   CAST(rev AS DOUBLE) AS revenue,
                   n_orders,
                   CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
                       AS mom_delta,
                   floor(CAST(rev - lag(rev) OVER (ORDER BY month) AS DOUBLE)
                         / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE)
                         * 1000000 + 0.5) / 1000000 AS mom_pct
            FROM m
        """,
        "price_ranks": """
            SELECT p_partkey, p_brand, p_retailprice,
                   CAST(price_rank AS BIGINT) AS price_rank,
                   CAST(price_dense_rank AS BIGINT) AS price_dense_rank
            FROM (
                SELECT p_partkey, p_brand, p_retailprice,
                       rank() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC) AS price_rank,
                       dense_rank() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC) AS price_dense_rank
                FROM part
            ) WHERE price_rank <= 5
        """,
        # NULL-for-absent-cell parity: Spark pivot leaves missing
        # (group, value) cells NULL, so the oracle uses sum(CASE ...)
        # (NULL over the empty set), not count FILTER (which gives 0)
        "zorder_layout": """
            WITH s AS (
                SELECT CAST(min(l_orderkey) AS BIGINT) AS xmin,
                       CAST(max(l_orderkey) AS BIGINT) AS xmax,
                       CAST(min(l_partkey) AS BIGINT) AS ymin,
                       CAST(max(l_partkey) AS BIGINT) AS ymax
                FROM lineitem
            ),
            n AS (
                SELECT l_orderkey, l_partkey, l_linenumber,
                       CAST(floor((l_orderkey - xmin) * 65535
                            / greatest(1, xmax - xmin)) AS BIGINT) AS nx,
                       CAST(floor((l_partkey - ymin) * 65535
                            / greatest(1, ymax - ymin)) AS BIGINT) AS ny
                FROM lineitem, s
            )
            SELECT l_orderkey, l_partkey, l_linenumber,
                   CAST((((nx >> 0) & 1) << 0) + (((ny >> 0) & 1) << 1) + (((nx >> 1) & 1) << 2) + (((ny >> 1) & 1) << 3) + (((nx >> 2) & 1) << 4) + (((ny >> 2) & 1) << 5) + (((nx >> 3) & 1) << 6) + (((ny >> 3) & 1) << 7) + (((nx >> 4) & 1) << 8) + (((ny >> 4) & 1) << 9) + (((nx >> 5) & 1) << 10) + (((ny >> 5) & 1) << 11) + (((nx >> 6) & 1) << 12) + (((ny >> 6) & 1) << 13) + (((nx >> 7) & 1) << 14) + (((ny >> 7) & 1) << 15) + (((nx >> 8) & 1) << 16) + (((ny >> 8) & 1) << 17) + (((nx >> 9) & 1) << 18) + (((ny >> 9) & 1) << 19) + (((nx >> 10) & 1) << 20) + (((ny >> 10) & 1) << 21) + (((nx >> 11) & 1) << 22) + (((ny >> 11) & 1) << 23) + (((nx >> 12) & 1) << 24) + (((ny >> 12) & 1) << 25) + (((nx >> 13) & 1) << 26) + (((ny >> 13) & 1) << 27) + (((nx >> 14) & 1) << 28) + (((ny >> 14) & 1) << 29) + (((nx >> 15) & 1) << 30) + (((ny >> 15) & 1) << 31) AS BIGINT) AS z_key
            FROM n
        """,
        # the oracle is the PLAIN join: green iff the bloom prefilter
        # is result-preserving (no false negatives by construction)
        "bloom_join": """
            SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate,
                   CAST(l.l_quantity AS BIGINT) AS quantity
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
        """,
        "native_pivot": """
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type='click' THEN 1 END) AS BIGINT) AS click_n,
                   CAST(SUM(CASE WHEN event_type='click'
                            THEN CAST(floor(value*1000) AS BIGINT) END) AS BIGINT) AS click_v,
                   CAST(SUM(CASE WHEN event_type='view' THEN 1 END) AS BIGINT) AS view_n,
                   CAST(SUM(CASE WHEN event_type='view'
                            THEN CAST(floor(value*1000) AS BIGINT) END) AS BIGINT) AS view_v,
                   CAST(SUM(CASE WHEN event_type='purchase' THEN 1 END) AS BIGINT) AS purchase_n,
                   CAST(SUM(CASE WHEN event_type='purchase'
                            THEN CAST(floor(value*1000) AS BIGINT) END) AS BIGINT) AS purchase_v
            FROM events
            GROUP BY 1, 2
        """,
        "cume_dist": """
            SELECT doc_id, lang, n_chars,
                   floor(cume_dist() OVER (PARTITION BY lang
                         ORDER BY n_chars, doc_id) * 1000000 + 0.5)/1000000
                       AS cd,
                   CAST(coalesce(lag(n_chars, 2) OVER (PARTITION BY lang
                         ORDER BY n_chars, doc_id), -1) AS BIGINT) AS lag2
            FROM documents
        """,
        "ntile_deciles": """
            SELECT doc_id, lang, n_chars,
                   CAST(ntile(10) OVER (PARTITION BY lang
                        ORDER BY n_chars, doc_id) AS BIGINT) AS decile
            FROM documents
        """,
        "first_last_ignore_nulls": """
            WITH ev AS (
                SELECT event_id, user_id, ts,
                       CASE WHEN event_type <> 'error' THEN value END AS v
                FROM events
            )
            SELECT event_id, user_id,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS ffill,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING
                   ) AS first_v
            FROM ev
        """,
        "fuzzy_match": """
            WITH h AS (
                SELECT doc_id, source, substr(text, 1, 40) AS head,
                       lead(substr(text, 1, 40)) OVER (
                           PARTITION BY source ORDER BY doc_id) AS next_head
                FROM documents
            )
            SELECT doc_id, source,
                   CAST(levenshtein(head, next_head) AS BIGINT) AS edit_dist,
                   levenshtein(head, next_head)
                       <= greatest(length(head), length(next_head)) * 0.3
                       AS is_fuzzy_match
            FROM h WHERE next_head IS NOT NULL
        """,
        "doc_chunks": """
            WITH n AS (
                SELECT doc_id, n_chars,
                       greatest(1, (n_chars - 50 + 149) // 150) AS nc
                FROM documents
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   CAST(i * 150 AS BIGINT) AS chunk_start,
                   CAST(least(i * 150 + 200, n_chars) AS BIGINT) AS chunk_end
            FROM (SELECT doc_id, n_chars, unnest(range(0, nc)) AS i FROM n)
        """,
        "bigram_nll": """
            WITH w0 AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                                   x -> x <> '') AS ws
                FROM documents
            ),
            big AS (
                SELECT doc_id AS id,
                       unnest(list_transform(range(1, len(ws)),
                              i -> ws[i]||' '||ws[i+1])) AS bg
                FROM w0 WHERE len(ws) >= 2
            ),
            cab AS (SELECT bg, count(*) AS c_ab FROM big GROUP BY 1),
            ca AS (SELECT string_split(bg, ' ')[1] AS a, sum(c_ab) AS c_a
                   FROM cab GROUP BY 1),
            v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v FROM
                  (SELECT unnest(ws) AS t FROM w0)),
            p AS (
                SELECT bg, (c_ab + 1.0) / (c_a + v.v) AS p
                FROM cab JOIN ca ON string_split(cab.bg, ' ')[1] = ca.a, v
            )
            SELECT id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   floor(-avg(log2(p.p)) * 1000000 + 0.5)/1000000 AS nll_bits
            FROM big JOIN p USING (bg)
            GROUP BY id
        """,
        "grouping_sets": """
            SELECT event_type,
                   CAST(isodow(ts) AS BIGINT) AS dow,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli,
                   CAST(GROUPING(event_type, isodow(ts)) AS BIGINT) AS gid
            FROM events
            GROUP BY GROUPING SETS ((event_type, isodow(ts)),
                                    (event_type), (isodow(ts)))
        """,
        # independent formulation: ASOF JOIN instead of window ffill
        "gap_fill": """
            WITH obs AS (
                SELECT user_id,
                       date_trunc('day', ts) AS bucket,
                       ts, event_id,
                       CAST(floor(value * 1000) AS BIGINT) AS v_milli
                FROM events
            ),
            latest AS (
                SELECT user_id, bucket, v_milli FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, bucket
                        ORDER BY ts DESC, event_id DESC) AS rk
                    FROM obs
                ) WHERE rk = 1
            ),
            span AS (
                SELECT date_trunc('day', min(ts)) AS lo,
                       date_trunc('day', max(ts)) AS hi
                FROM events
            ),
            grid AS (
                SELECT k.user_id, g.g AS bucket
                FROM (SELECT DISTINCT user_id FROM events) k,
                     span,
                     LATERAL (SELECT unnest(generate_series(
                         span.lo, span.hi, INTERVAL 1 DAY)) AS g) g
            )
            SELECT g.user_id,
                   CAST(g.bucket AS DATE) AS grid_date,
                   l.v_milli,
                   (lo.user_id IS NOT NULL) AS observed
            FROM grid g
            ASOF LEFT JOIN latest l
                 ON g.user_id = l.user_id AND g.bucket >= l.bucket
            LEFT JOIN latest lo
                 ON g.user_id = lo.user_id AND g.bucket = lo.bucket
        """,
        "json_extract": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(max(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
                   CAST(sum(CASE WHEN props->>'$.k' IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
            FROM events
            GROUP BY 1
        """,
        "attribution_join": """
            SELECT i.user_id,
                   i.event_id AS imp_id,
                   c.event_id AS click_id,
                   CAST(epoch_us(c.ts) - epoch_us(i.ts) AS BIGINT) AS delay_us
            FROM events i
            JOIN events c
              ON c.user_id = i.user_id
             AND c.ts >= i.ts
             AND c.ts <= i.ts + INTERVAL 30 MINUTE
            WHERE i.event_type = 'view' AND c.event_type = 'click'
        """,
        "profile_table": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(MIN({c}) AS VARCHAR) AS min_value,
                   CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM orders
            """
            for c in (
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        ),
        # approx twins: the estimators themselves aren't replayable in
        # DuckDB, so the gate hashes exact stats + tolerance booleans
        # (true on the oracle side; Spark's side is true iff the
        # estimate honors its published error bound on this data)
        "profile_approx": " UNION ALL ".join(
            f"""
            SELECT '{c}' AS column_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_nulls,
                   CAST(MIN({c}) AS VARCHAR) AS min_value,
                   CAST(MAX({c}) AS VARCHAR) AS max_value,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS nd_exact,
                   true AS distinct_ok
            FROM orders
            """
            for c in (
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            )
        ),
        "percentile_approx": """
            SELECT e.event_type,
                   CAST(t.p AS DOUBLE) AS p,
                   CAST(COUNT(e.value) AS BIGINT) AS n,
                   true AS rank_ok
            FROM events e CROSS JOIN (VALUES (0.5), (0.95)) t(p)
            GROUP BY 1, 2
        """,
        "text_normalize": r"""
            SELECT doc_id,
                   CAST(length(trim(regexp_replace(
                        nfc_normalize(text), '\s+', ' ', 'g'))) AS BIGINT)
                       AS norm_len,
                   md5(trim(regexp_replace(
                        nfc_normalize(text), '\s+', ' ', 'g'))) AS norm_md5
            FROM documents
        """,
        "semi_join": """
            SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
            GROUP BY 1
        """,
        # cross-multiplied average (acctbal*n > sum) keeps the scalar
        # comparison in exact decimal arithmetic in both engines
        "anti_join": """
            WITH t AS (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS s,
                              COUNT(*) AS n
                       FROM customer)
            SELECT c.c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_custs,
                   CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                       AS sum_acctbal
            FROM customer c, t
            WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * t.n > t.s
              AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
            GROUP BY 1
        """,
        # qty*5*n < sum  ⟺  qty < 0.2*avg, in exact integers
        "scalar_subquery": """
            WITH s AS (SELECT l_partkey,
                              SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                              COUNT(*) AS n_li
                       FROM lineitem GROUP BY 1)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                       AS total_price
            FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
            WHERE CAST(l.l_quantity AS BIGINT) * 5 * s.n_li < s.sum_qty
        """,
        "case_pivot": """
            WITH a AS (
                SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
                       SUM(CASE WHEN p.p_type = 'PROMO'
                                THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                                     (CAST(1 AS DECIMAL(4,2)) -
                                      CAST(l.l_discount AS DECIMAL(12,2)))
                                ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo_d,
                       SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                           (CAST(1 AS DECIMAL(4,2)) -
                            CAST(l.l_discount AS DECIMAL(12,2)))) AS total_d
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
                GROUP BY 1
            )
            SELECT ship_year,
                   CAST(promo_d AS DOUBLE) AS promo_revenue,
                   CAST(total_d AS DOUBLE) AS total_revenue,
                   CAST(promo_d AS DOUBLE) / CAST(total_d AS DOUBLE)
                       AS promo_share
            FROM a
        """,
        "nation_volume": """
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                            (CAST(1 AS DECIMAL(4,2)) -
                             CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
                       AS volume
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01'
              AND n1.n_name < n2.n_name
            GROUP BY 1, 2, 3
        """,
        "having_subquery": """
            WITH big AS (
                SELECT l_orderkey,
                       SUM(CAST(l_quantity AS BIGINT)) AS total_qty
                FROM lineitem GROUP BY 1
                HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
            )
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS o_orderdate,
                   o.o_totalprice,
                   CAST(b.total_qty AS BIGINT) AS total_qty
            FROM orders o
            JOIN big b ON o.o_orderkey = b.l_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey
            LIMIT 100
        """,
        "bm25_rank": _bm25_oracle(),
        "knn_pagerank": _pagerank_oracle(3, 3),
        "knn_pagerank_lsh": _pagerank_lsh_oracle(60, 4, 3, 3, probe_bits=1),
        "weighted_sample_stratified": """
            SELECT doc_id, source, weight FROM (
                SELECT doc_id, source,
                       CAST(length(text) + 1 AS DOUBLE) AS weight,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY ln((CAST('0x' || substr(md5('wss1' ||
                                     CAST(doc_id AS VARCHAR)), 1, 15)
                                     AS BIGINT) + 1)
                                     / 1152921504606846976.0)
                                    / CAST(length(text) + 1 AS DOUBLE) DESC,
                                    doc_id) AS rn
                FROM documents
            ) WHERE rn <= 10
        """,
        "unpivot_measures": """
            WITH m AS (
                SELECT l_orderkey, l_linenumber,
                       CAST(floor(CAST(l_quantity AS DOUBLE) * 1000)
                            AS BIGINT) AS l_quantity,
                       CAST(floor(CAST(l_extendedprice AS DOUBLE) * 1000)
                            AS BIGINT) AS l_extendedprice,
                       CAST(floor(CAST(l_discount AS DOUBLE) * 1000)
                            AS BIGINT) AS l_discount,
                       CAST(floor(CAST(l_tax AS DOUBLE) * 1000)
                            AS BIGINT) AS l_tax
                FROM lineitem
            )
            UNPIVOT m ON l_quantity, l_extendedprice, l_discount, l_tax
            INTO NAME measure VALUE v_milli
        """,
        "set_ops": """
            WITH c95 AS (SELECT o_custkey FROM orders
                         WHERE year(o_orderdate) = 1995),
            c96 AS (SELECT o_custkey FROM orders
                    WHERE year(o_orderdate) = 1996),
            urgent AS (SELECT o_custkey FROM orders
                       WHERE o_orderpriority = '1-URGENT'),
            retained AS (SELECT o_custkey FROM c95
                         INTERSECT SELECT o_custkey FROM c96),
            calm AS (SELECT o_custkey FROM retained
                     EXCEPT SELECT o_custkey FROM urgent)
            SELECT o_custkey, 'retained' AS cohort FROM retained
            UNION ALL
            SELECT o_custkey, 'retained_calm' AS cohort FROM calm
        """,
        "table_digest": """
            SELECT source,
                   CAST(bit_xor(CAST('0x' || substr(
                       md5(CAST(doc_id AS VARCHAR) || chr(31) || text),
                       1, 15) AS BIGINT)) AS BIGINT) AS digest,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM documents GROUP BY source
        """,
        "corpus_diff": """
            WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
            b AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 11 = 0 THEN text || 'X'
                                ELSE text END) AS h
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 1000000, md5('new' || text)
                FROM documents WHERE doc_id % 13 = 0
            )
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM a FULL JOIN b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h
        """,
        "trailing_window": """
            SELECT event_id, user_id,
                   CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
                   CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w
                        AS BIGINT) AS trail_v_milli
            FROM (SELECT event_id, user_id, value, epoch_us(ts) AS us
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY us
                         RANGE BETWEEN 3600000000 PRECEDING
                               AND CURRENT ROW)
        """,
        "incremental_rollup": """
            SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
                       AS sum_v_milli
            FROM events
            GROUP BY 1, 2
        """,
        "weighted_sample": """
            SELECT doc_id, weight FROM (
                SELECT doc_id,
                       CAST(length(text) + 1 AS DOUBLE) AS weight,
                       ln((CAST('0x' || substr(md5('ws1' ||
                               CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                           + 1) / 1152921504606846976.0)
                           / CAST(length(text) + 1 AS DOUBLE) AS k
                FROM documents
            ) ORDER BY k DESC, doc_id LIMIT 50
        """,
        "group_split": """
            SELECT doc_id, md5(text) AS split_group,
                   CASE WHEN CAST('0x' || substr(md5('sp1' || md5(text)),
                                 1, 8) AS BIGINT) % 10000 < 9000
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
        """,
        # near-dup-cluster-keyed split: the dedup_clusters transitive
        # closure (recursive CTE), coalesced to self for singletons,
        # then the same md5 coin as group_split on the rep id
        "leakage_safe_split": f"""
            WITH RECURSIVE {_shingle_cte(3)},
            sizes AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS cnt
                FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
                GROUP BY 1, 2
            ),
            p AS (
                SELECT id_a, id_b FROM prs
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE CAST(cnt AS DOUBLE)/(sa.n + sb.n - cnt) >= 0.5
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM p
                UNION
                SELECT id_b, id_a FROM p
            ),
            verts AS (SELECT DISTINCT src AS id FROM edges),
            reach(id, r) AS (
                SELECT id, id FROM verts
                UNION
                SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id
            ),
            clus AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)
            SELECT d.doc_id,
                   CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT)
                       AS split_group,
                   CASE WHEN CAST('0x' || substr(md5('lk1' ||
                             CAST(coalesce(c.cluster_id, d.doc_id)
                                  AS VARCHAR)), 1, 8) AS BIGINT)
                             % 10000 < 9000
                        THEN 'train' ELSE 'val' END AS split
            FROM documents d LEFT JOIN clus c ON c.id = d.doc_id
        """,
    }
    # streaming ≡ batch on a closed input (Spark's unification claim,
    # driver-checked): the stream_annotate gate replays the annotate
    # SQL verbatim — same probe projection, same range join, same
    # backfill, just executed by the streaming engine on the Spark
    # side.
    oracles["stream_annotate"] = oracles["annotate"]
    # LSH pair dedup: probed band candidates (plane literals) +
    # exact round-6 cosine ≥ threshold over qid < nid orientations.
    oracles["dedup_embedding_lsh"] = f"""
        WITH {_lsh_cand_ctes(60, 4, 7, None, probe_bits=1)},
        pr AS (
            SELECT DISTINCT qid AS id_a, nid AS id_b
            FROM cand WHERE qid < nid
        ),
        s AS (
            SELECT id_a, id_b, {_cos6('va.e', 'vb.e')} AS cos
            FROM pr
            JOIN v va ON va.vec_id = pr.id_a
            JOIN v vb ON vb.vec_id = pr.id_b
        )
        SELECT id_a, id_b, cos FROM s WHERE cos >= 0.45
    """
    return oracles
