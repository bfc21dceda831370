"""Scan-parallelism repair for unsplittable inputs (guide §2.5).

A parquet row group is the minimum read split, so a table written as
one row group (or one gzip member, or any layout with fewer splits
than the cluster has cores) plans as a handful of scan tasks — and
every NARROW transform above the scan (regex tokenize + explode,
per-pair vector arithmetic, hash/vote expressions) is pinned to those
few cores until the first exchange. ``spread_underparallel`` applies
the guide's remedy — "fix at the source if you can; otherwise
repartition immediately after the read" — with a trigger DERIVED from
the input layout and core count, never a constant: inputs that
already plan at least ``target/factor`` splits are returned
untouched, so at production scale (thousands of splits) this is a
no-op and only genuinely under-parallel reads pay the one bounded
exchange.

Call sites are deliberately the COMPUTE-BOUND operators, not the
generic reader: interleaved A/B (r14) measured blanket spreading as a
net zero — tokenize/explode and expression-scoring pipelines win
0.42-0.77x, while scan+filter+partial-agg shapes (dedup_exact,
event_rollup, tpch_q6) and mapInPandas-under-big-broadcast paths
(annotate's fused range join: +1 worker per partition, each
deserializing the broadcast ranges; the GEMM top-k: per-partition
candidate fan-out grows with partition count) LOSE more than the
exchange costs. The operator knows whether its per-row work is heavy;
the reader does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_underparallel(df: DataFrame, factor: int = 4) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism iff its planned partition count is more than
    ``factor`` below it. Content-neutral (sort-before-repartition
    keeps the assignment deterministic under task retry); cost when
    it fires is one exchange of at most (splits x maxPartitionBytes),
    bounded by the trigger to under target/factor splits."""
    try:
        n = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # planning failure — never block the data path
        return df
    if n * factor <= target:
        return df.repartition(target)
    return df
