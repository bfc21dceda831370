"""Skew mitigation: salted equi-join / two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime by splitting oversized SortMergeJoin partitions. Salting
is the explicit, planner-independent tool for the cases AQE can't
touch: a broadcast-ineligible dimension joined on a key where a
handful of values dominate (the classic hot-key shuffle straggler),
or engines/paths where AQE is off.

``salted_join`` spreads each hot key over ``n_salts`` reducers: the
big side derives a DETERMINISTIC salt from its row content
(xxhash64 — no rand(), so retries/speculative tasks and oracle
replays see identical output), the small side replicates ``n_salts``
times (explode of a literal sequence, JVM-side), and the join runs on
(key, salt). Shuffle cost: big side unchanged, small side × n_salts —
the standard trade.

``two_phase_agg`` is the aggregation twin: pre-aggregate on
(key, salt), then finish on key. Spark's hash aggregate already does
map-side partial aggregation, so this matters only for aggregates
with large per-key state (e.g. collect_set on a hot key) — provided
the combine is algebraic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join of a big (skewed) side with a
    non-broadcastable small side on columns ``on``.

    Output columns = big's columns + small's non-key columns (the
    usual equi-join projection)."""
    on = list(on)
    salt_src: list[Column] = [F.col(c) for c in big.columns]
    b = big.withColumn("__salt", F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = b.join(s, on + ["__salt"], how)
    small_payload = [c for c in small.columns if c not in on]
    return joined.select(*big.columns, *small_payload)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase (salted) aggregation for algebraic aggregates with
    heavy per-key state. ``aggs`` maps output name → (partial_fn,
    final_fn, col), e.g. {"n": (F.count, F.sum, "x")} or
    {"mx": (F.max, F.max, "x")}; partial runs on (keys, salt), final
    on keys."""
    keys = list(keys)
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[pf(c).alias(f"__p_{name}") for name, (pf, _ff, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[ff(f"__p_{name}").alias(name) for name, (_pf, ff, _c) in aggs.items()]
    )
