"""Targeted per-query timing for optimization A/B runs (guide §1.4):
times each named query end-to-end with the noop sink, cold (cache
cleared before every iteration) and one warm run, plus a warm
tpch_q1 canary so ambient-load inflation is visible. Prints one JSON
line. Run from the repo root to be measured.

Usage: python scripts/time_queries.py <iters> <query> [...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import __spark_entry__ as em
from annotation_service_spark.caching import release_caches
from annotation_service_spark.session import get_session


def main() -> None:
    iters = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("time_queries")
    qs = em.queries()

    def run(name: str) -> float:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    run("tpch_q1")  # JVM warmup
    canary = sorted(run("tpch_q1") for _ in range(3))[1]
    out: dict[str, object] = {"canary_q1": canary}
    for name in names:
        cold = []
        for _ in range(iters):
            spark.catalog.clearCache()
            release_caches()
            cold.append(run(name))
            gc.collect()
        warm = run(name)
        out[name] = {"cold": cold, "warm": warm}
    out["canary_q1_end"] = sorted(run("tpch_q1") for _ in range(3))[1]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
