"""Table profiling — the data-quality sweep a 100 TB ingest runs
before anything else: per-column null counts, cardinalities, and
value ranges in ONE pass over the data.

The reference has no profiling surface (its closest analog is the
loader error budgets, loader/csv-reader.go:17-19, which count bad
FIELDS — S2's error-budget semantics live in sources/geolite2.py);
this generalizes that idea to whole-table column statistics.

Scale design:
- a single ``df.agg`` pass: every statistic is an associative
  aggregate, so map-side partial aggregation reduces each partition
  to ONE row before the 1-row shuffle.
- exact COUNT(DISTINCT) over many columns makes Catalyst plan an
  Expand (one duplicated stream per distinct agg) — fine for the
  profile cadence, but for very wide tables pass ``approx=True`` to
  use HLL sketches (approx_count_distinct), which fold into the same
  single pass with no Expand.
- the result is k rows for k columns — driver-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, approx: bool = False) -> DataFrame:
    """One row per column: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value). min/max are computed on the native type
    and cast to string for a uniform schema.

    r13 (guide §1.1/§2): exact mode runs TWO aggregation passes
    cross-joined on their single rows rather than one combined pass.
    The multi-column countDistinct plans through Expand, and string
    min/max buffers are not HashAggregate-mutable — combined, the
    whole aggregation fell back to SortAggregate over the
    Expand-multiplied rows (measured: 2 Sorts of |rows|×(n_cols+1)
    in the plan, 3.5 s on a 2.6 MB table). Split, the distinct pass
    is a pure-long hash aggregation and the min/max pass is a global
    (grouping-free, so sort-free) SortAggregate over the raw rows;
    the cross join glues two 1-row relations. Approx mode keeps the
    single pass (HLL plans Expand-free through ObjectHashAggregate)."""
    distinct = F.approx_count_distinct if approx else F.countDistinct
    dist_aggs = [F.count(F.lit(1)).alias("__n")]
    other_aggs = []
    for f in df.schema.fields:
        c = F.col(f.name)
        dist_aggs.append(distinct(c).alias(f"{f.name}__distinct"))
        other_aggs += [
            F.sum(c.isNull().cast("long")).alias(f"{f.name}__nulls"),
            F.min(c).cast("string").alias(f"{f.name}__min"),
            F.max(c).cast("string").alias(f"{f.name}__max"),
        ]
    if approx:
        row = df.agg(*dist_aggs, *other_aggs)
    else:
        row = df.agg(*dist_aggs).crossJoin(df.agg(*other_aggs))
    stacks = []
    for f in df.schema.fields:
        stacks.append(
            f"'{f.name}', `{f.name}__nulls`, `{f.name}__distinct`, "
            f"`{f.name}__min`, `{f.name}__max`"
        )
    n_cols = len(df.schema.fields)
    return row.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({n_cols}, {', '.join(stacks)}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name",
        "n_rows",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Dataset diffing — (key, status) for every row that was added,
    removed, or changed between two versions of a table (the corpus
    release audit: what did this ingest/filter pass actually do?).

    Rows are compared by md5 of the concatenated compare columns, so
    only (key, hash) pairs flow into the FULL OUTER join — the
    payload never shuffles. The join is keyed by the table key
    (uniform); with both versions bucketed on it (sources/storage.py)
    the Exchange disappears entirely. Output is differences only —
    at 100 TB the diff is expected to be orders smaller than either
    version.
    """
    hcol = F.md5(F.concat_ws("\x1f", *[F.col(c) for c in compare_cols]))
    ah = a.select(F.col(key_col).alias("_k"), hcol.alias("_ha"))
    bh = b.select(F.col(key_col).alias("_k"), hcol.alias("_hb"))
    j = ah.join(bh, "_k", "full_outer")
    status = (
        F.when(F.col("_ha").isNull(), F.lit("added"))
        .when(F.col("_hb").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.where(
            F.col("_ha").isNull()
            | F.col("_hb").isNull()
            | (F.col("_ha") != F.col("_hb"))
        )
        .select(F.col("_k").alias(key_col), status.alias("status"))
    )


def table_digest(
    df: DataFrame,
    compare_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Order-independent content digest per group (or one global
    row) — the anti-entropy primitive: two replicas/engines hold the
    same rows iff their digests match, computed without moving any
    payload or sorting anything.

    digest = BIT_XOR over rows of a 60-bit integer derived from
    md5 of the concatenated columns. XOR is commutative/associative
    and cannot overflow, so the aggregation is map-side combinable,
    merge-able across partitions/engines, and indifferent to row
    order — unlike a SUM (overflow at scale) or any ordered hash.
    (Caveat inherent to XOR digests: a row appearing an EVEN number
    of times cancels out; pair with n_rows, which this emits.)
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", *[F.col(c) for c in compare_cols])),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    aggs = [
        F.expr("bit_xor(_h)").alias("digest"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    base = df.select(*(group_cols or []), h.alias("_h"))
    if group_cols:
        return base.groupBy(*group_cols).agg(*aggs)
    return base.agg(*aggs)
