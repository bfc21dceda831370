"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full plan executes,
nothing collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from annotation_service_spark.session import get_session

BENCH_QUERIES = [
    "annotate",
    "range_lookup",
    "asof_select",
    "interval_flatten",
    "interval_merge",
    "tpch_q1",
    "sessionize",
    "histogram",
    "merge_annotators",
    "response_keys",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "ann_gemm_topk",
    "text_metrics",
    "lang_id",
    "tpch_q3",
    "tpch_q5",
    "topk_per_group",
    "annotate_multisnapshot",
    "legacy_annotate",
    "pack_chunks",
    "stratified_sample",
    "skew_join",
    "pii_redact",
    "skew_agg",
    "corpus_curation",
    "multimodal_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    qs = entrymod.queries()
    # warm the JVM/session so the first measured query doesn't pay init
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = float("inf")
        for _ in range(3):  # best-of-3: first runs pay codegen/JIT compile
            # clearCache BEFORE each iteration so every timing is a
            # cold-cache execution (operators that .cache() internally
            # would otherwise measure a warm rerun — ADVICE r1); JVM
            # JIT/codegen warmth still accrues, which is intended.
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.catalog.clearCache()

    # probe-scale sweep: the broadcast-range-join design promises a
    # flat per-probe cost; demonstrate it by replaying annotate at
    # 10x / 100x probe volume (JVM-side replication, single run each).
    # The x100 per-probe microseconds is the closest local proxy for
    # the 100x-scale claim.
    import __spark_entry__ as em

    sweep: dict[str, float] = {"x1": timings["annotate"]}
    for mult in (10, 100):
        t0 = time.perf_counter()
        em.q_annotate(spark, sf_dir, multiplier=mult).write.format("noop").mode(
            "overwrite"
        ).save()
        sweep[f"x{mult}"] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "annotate_probe_sweep": sweep,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
