"""As-of (dataset-selection) join and multi-source snapshot alignment.

The reference keeps a sorted directory of dataset snapshots and, per
request date, binary-searches for the last snapshot STRICTLY earlier
than the date, falling back to the FIRST snapshot when none is
earlier (directory/directory.go:221-240). Multi-source composites are
built by aligning k sorted snapshot lists on their union of dates
(MergeAnnotators, directory/directory.go:170-202).

Spark design: snapshots are a tiny dimension (hundreds of rows) —
convert to VALIDITY WINDOWS ``[valid_from, valid_to)`` once with a
window function, then the as-of join is a broadcast range join the
probe stream flows through without shuffling. At 100 TB of probes
this stays a map-side operation; the alternative join-then-rank
formulation would shuffle the probe table and is deliberately
avoided.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def validity_windows(
    snapshots: DataFrame,
    date_col: str = "dataset_date",
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Snapshot registry → validity windows implementing the
    reference's selection rule (directory/directory.go:230-240):

    - a snapshot serves requests with ``date > dataset_date`` until
      the next snapshot's date (strictly-earlier rule);
    - the FIRST snapshot additionally serves all earlier dates
      (fallback, ``valid_from`` = NULL = unbounded past);
    - the last snapshot serves everything later (``valid_to`` = NULL).

    Window semantics: request matches iff
    ``(valid_from IS NULL OR date > valid_from) AND
      (valid_to IS NULL OR date <= valid_to)``
    with valid_from = dataset_date of this snapshot and valid_to =
    dataset_date of the next — i.e. interval (this, next].
    """
    part = list(partition_by)
    w = Window.partitionBy(*part or [F.lit(1)]).orderBy(date_col)
    return (
        snapshots.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "valid_from",
            F.when(F.col("__rn") == 1, F.lit(None)).otherwise(F.col(date_col)),
        )
        .withColumn("valid_to", F.lead(date_col).over(w))
        .drop("__rn")
    )


def asof_join(
    probes: DataFrame,
    snapshots: DataFrame,
    probe_date: str,
    snapshot_date: str = "dataset_date",
    payload: Sequence[str] = (),
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """J2: attach to each probe row the snapshot serving its date
    (last strictly-earlier; first as fallback — exact reference
    semantics incl. directory_test.go:44-79 cases).

    The snapshot side is broadcast; the probe side is never shuffled.
    """
    part = list(partition_by)
    v = validity_windows(snapshots, snapshot_date, part).select(
        *part,
        F.col(snapshot_date).alias("__snap_date"),
        "valid_from",
        "valid_to",
        *payload,
    )
    cond = (
        F.col("valid_from").isNull() | (F.col(probe_date) > F.col("valid_from"))
    ) & (F.col("valid_to").isNull() | (F.col(probe_date) <= F.col("valid_to")))
    on = cond
    for c in part:
        on = on & (probes[c] == v[c])
    out = probes.join(F.broadcast(v), on, "left")
    return out.select(
        *[probes[f.name] for f in probes.schema.fields],
        F.col("__snap_date").alias(snapshot_date),
        *[v[c] for c in payload],
    )


def merge_sources(
    registries: dict[str, DataFrame],
    date_col: str = "dataset_date",
    payload: Sequence[str] = (),
) -> DataFrame:
    """J8 (MergeAnnotators, directory/directory.go:170-202): align k
    per-source snapshot lists into one composite registry — one row
    per distinct date carrying, per source, the newest snapshot ≤
    that date. Sources missing any snapshot ≤ d contribute NULL
    (the reference only emits composites once every list has an
    element ≤ d; filter NULLs downstream to match).

    Pure window code: union all (source, date, payload) rows, then
    per source ``last_value(ignoreNulls)`` over the global date
    order. Output column per source: ``{source}_{payload_col}`` plus
    ``{source}_date``.

    SIZE CONTRACT: inputs are snapshot REGISTRIES — file listings in
    the hundreds of rows (the reference's whole directory is ~200
    entries). The global-order window below deliberately runs in one
    partition (constant partition key, so WindowExec doesn't warn and
    the plan states the intent); do NOT reuse this operator for
    fact-scale inputs.
    """
    payload = list(payload)
    parts = []
    for name, df in registries.items():
        parts.append(
            df.select(
                F.lit(name).alias("__src"),
                F.col(date_col).alias("__d"),
                F.struct(F.col(date_col).alias("date"), *payload).alias("__pl"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)

    dates = u.select("__d").distinct()
    pivoted = dates
    for name in registries:
        src_rows = u.where(F.col("__src") == name).select(
            "__d", F.col("__pl").alias(f"__pl_{name}")
        )
        pivoted = pivoted.join(src_rows, "__d", "left")
    w = Window.partitionBy(F.lit(1)).orderBy("__d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = pivoted
    for name in registries:
        out = out.withColumn(
            f"__pl_{name}", F.last(f"__pl_{name}", ignorenulls=True).over(w)
        )
    sel = [F.col("__d").alias(date_col)]
    for name in registries:
        sel.append(F.col(f"__pl_{name}.date").alias(f"{name}_date"))
        sel.extend(
            F.col(f"__pl_{name}.{c}").alias(f"{name}_{c}") for c in payload
        )
    return out.select(*sel)


def asof_join_union(
    probes: DataFrame,
    versions: DataFrame,
    probe_ts: str,
    version_ts: str,
    payload: Sequence[str],
    partition_by: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """Big-dimension as-of join (SCD2 attachment) via union + window:
    each probe row picks up the payload of the latest version with
    ``version_ts <= probe_ts`` (or ``<`` when ``inclusive=False``)
    within its partition keys. Probes with no earlier version keep
    NULL payload.

    This is the scale path complementing ``asof_join``: that form
    broadcasts the (small) snapshot registry; here the dimension can
    be arbitrarily large (e.g. one version per user per day). Union
    both sides, ONE shuffle keyed by the partition columns, sort by
    time within, and ``last(payload, ignorenulls)`` carries the
    current version forward — the classic merge-join formulation of
    as-of, no broadcast, no range join, skew bounded by the busiest
    partition key.
    """
    part = list(partition_by)
    pay = list(payload)
    # tag order at equal timestamps decides inclusivity: versions
    # first (0) -> a probe AT the version's ts sees it; probes first
    # -> strictly-earlier semantics
    v_tag, p_tag = (0, 1) if inclusive else (1, 0)
    probe_cols = [f.name for f in probes.schema.fields]
    p_side = probes.select(
        *part,
        F.col(probe_ts).alias("__ts"),
        F.lit(p_tag).alias("__tag"),
        F.lit(True).alias("__is_probe"),
        *[c for c in probe_cols if c not in part and c != probe_ts],
        *[
            F.lit(None).cast(versions.schema[c].dataType).alias(f"__v_{c}")
            for c in pay
        ],
    )
    v_side = versions.select(
        *part,
        F.col(version_ts).alias("__ts"),
        F.lit(v_tag).alias("__tag"),
        F.lit(False).alias("__is_probe"),
        *[
            F.lit(None).cast(probes.schema[c].dataType).alias(c)
            for c in probe_cols
            if c not in part and c != probe_ts
        ],
        *[F.col(c).alias(f"__v_{c}") for c in pay],
    )
    u = p_side.unionByName(v_side)
    w = (
        Window.partitionBy(*part)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in pay
        ],
    )
    return filled.where(F.col("__is_probe")).select(
        *part,
        F.col("__ts").alias(probe_ts),
        *[c for c in probe_cols if c not in part and c != probe_ts],
        *[F.col(f"__f_{c}").alias(c) for c in pay],
    )
