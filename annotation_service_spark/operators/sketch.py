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

import numpy as np
import pandas as pd
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
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) cells, at most depth·width
    rows total.

    ``weight_col`` (r13, guide §2.3 "aggregate before you shuffle"):
    build from a PRE-AGGREGATED (key, weight) relation instead of raw
    occurrence rows — cell value Σ_{keys hashing to cell} weight is
    identical by definition to counting the occurrences, but the
    explode fans out |vocabulary| rows instead of |corpus tokens|."""
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cell(F.col(key_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    w = F.lit(1) if weight_col is None else F.col(weight_col)
    ex = df.select(F.explode(cells).alias("rb"), w.alias("_w")).select(
        "rb.row", "rb.bucket", "_w"
    )
    return ex.groupBy("row", "bucket").agg(
        F.sum("_w").cast("long").alias("c")
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


def bloom_build(
    build: DataFrame,
    key_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 11,
) -> bytes:
    """Distributed Bloom-filter build: each Arrow batch folds its keys
    into a local ``n_bits`` bitmap (k = ``n_hashes`` positions per key
    via seeded xxhash64 — computed JVM-side, numpy sets the bits);
    one bitmap row per batch comes back and the driver ORs them. The
    driver never sees keys — only ≤ n_batches bitmaps of n_bits/8
    bytes (128 KiB at the 1M-bit default).

    This is the semijoin-reduction sketch for joins whose build side
    is too big to broadcast AS A HASH TABLE but whose bit-set is tiny:
    ship the bloom to the probe scan and drop non-joining rows before
    the shuffle. No false negatives (join-result-preserving); false
    positives only cost wasted shuffle rows (rate ≈ (1-e^{-kn/m})^k).
    """
    # pmod, not abs()%: abs(Long.MIN_VALUE) stays negative in two's
    # complement, so abs(h) % n can yield a negative bit position
    # (out-of-range numpy index); pmod is total on the full int64 range
    hashed = build.select(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits))
            .cast("long")
            .alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )

    def fold(batches):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            pos = pdf.to_numpy(dtype=np.int64).ravel()
            np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = hashed.mapInPandas(fold, "bm binary").collect()
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for r in parts:
        out |= np.frombuffer(r.bm, dtype=np.uint8)
    return out.tobytes()


def bloom_might_contain(
    probe: DataFrame,
    key_col: str,
    bloom: bytes,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    seed: int = 11,
):
    """Filter ``probe`` to rows whose key might be in the bloom —
    the probe-side prefilter of the semijoin reduction. The bitmap
    travels once per executor (task-closure broadcast); membership is
    a vectorized numpy gather over the same JVM-computed hash columns,
    so build and probe agree bit-for-bit."""
    bm = np.frombuffer(bloom, dtype=np.uint8)

    harr = F.array(
        *[
            F.pmod(
                F.xxhash64(F.col(key_col), F.lit(seed + i)), F.lit(n_bits)
            ).cast("long")
            for i in range(n_hashes)
        ]
    )

    @F.pandas_udf("boolean")
    def member(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=bool)
        pos = np.vstack(hs.to_numpy()).astype(np.int64)  # (n, k)
        hit = (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    return probe.withColumn("__hs", harr).where(member(F.col("__hs"))).drop(
        "__hs"
    )


def heavy_hitter_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries candidate pass: each partition folds
    its stream into at most ``capacity`` counters and emits only the
    surviving KEYS (≤ capacity rows per partition, whatever the
    partition's cardinality — this is the bounded-state property that
    makes the operator viable at 100 TB where a raw groupBy over the
    key column would shuffle billions of groups).

    Guarantee (Misra & Gries 1982; mergeable-summaries form, Agarwal
    et al. 2012): within a partition holding n_p rows, every key with
    count_p > n_p/(capacity+1) survives. By pigeonhole, any key with
    GLOBAL count > n/(capacity+1) exceeds the per-partition bound in
    at least one partition, so the union of per-partition candidates
    is a superset of the true heavy hitters — no merge of counter
    weights is needed, only the key union.
    """

    def fold(batches):
        counts: dict = {}
        for pdf in batches:
            for item, c in pdf[key_col].value_counts().items():
                if item in counts:
                    counts[item] += int(c)
                    continue
                counts[item] = int(c)
                if len(counts) > capacity:
                    delta = min(counts.values())
                    counts = {
                        k: v - delta for k, v in counts.items() if v > delta
                    }
        yield pd.DataFrame({key_col: list(counts.keys())})

    # the output schema mirrors the source key's dtype — a hardcoded
    # string schema would coerce (or fail Arrow conversion on) long /
    # binary keys and the follow-up semi-join would compare mismatched
    # types
    key_type = df.schema[key_col].dataType.simpleString()
    return df.select(key_col).mapInPandas(
        fold, f"`{key_col}` {key_type}"
    ).distinct()


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_denom: int,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters — every key occurring ≥ n/threshold_denom
    times, with its exact count — via the classic two-pass scheme:

    1. candidate pass: per-partition Misra–Gries with
       capacity ≥ threshold_denom (see heavy_hitter_candidates; a key
       with count ≥ n/denom > n/(capacity+1) cannot be missed);
    2. exact pass: broadcast the ≤ capacity·partitions candidate keys,
       semi-join the corpus down to them, ONE map-side-combinable
       groupBy (group count now bounded by the candidate set, not the
       key cardinality), and keep count·denom ≥ n against the 1-row
       total — a pure-integer comparison, no float fraction.

    Output is therefore bit-identical to the naive full groupBy +
    HAVING (the DuckDB oracle runs exactly that), while shuffle state
    stays bounded: ≤ capacity keys per partition in pass 1, ≤ |cands|
    groups in pass 2. Columns: (key_col, cnt).
    """
    capacity = capacity or threshold_denom
    cands = heavy_hitter_candidates(df, key_col, capacity)
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    return (
        df.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * threshold_denom >= F.col("__n"))
        .drop("__n")
    )
