"""Count-min sketch: sublinear-memory frequency estimation.

The scale twin of exact term counting (functions/text.py::vocab_topk):
at 100 TB the n-gram vocabulary itself can be billions of keys, but a
d×w count-min sketch (Cormode & Muthukrishnan 2005) bounds state at
d·w cells regardless of key cardinality, with one-sided error
est ∈ [true, true + εN] where ε ≈ e/w, failing with prob ≤ e^-d.

Spark shape:
- building the sketch is a d-way explode (each occurrence lands in d
  cells) followed by ONE map-side-combinable groupBy — every
  partition contributes at most d·w partial cells to the shuffle, so
  shuffle volume is independent of corpus size;
- estimation is an equi-join of the query keys' d cells against the
  sketch and a min() per key.

All hashing is seeded md5 (engine-portable, deterministic) — the
sketch is therefore EXACTLY reproducible and oracle-checkable, unlike
RNG-seeded sketch libraries: same corpus, same cells, same estimates
in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cell(key, i: int, width: int):
    """Row-i bucket of a key: first 8 md5 hex chars of 'cms{i}|key'
    mod width (matches the DuckDB oracle expression verbatim)."""
    h = F.md5(F.concat(F.lit(f"cms{i}|"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def count_min_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) cells, at most depth·width
    rows total."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cell(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    ex = df.select(F.explode(cells).alias("rb")).select("rb.row", "rb.bucket")
    return ex.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimate the frequency of each distinct query key:
    min over its depth cells. Returns (key_col, est)."""
    probes = queries.select(key_col).distinct()
    cells = probes.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell(F.col(key_col), i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, "rb.row", "rb.bucket")
    return (
        cells.join(sketch, ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )
