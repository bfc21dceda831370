"""Embedding similarity search (approximate nearest neighbor).

Two paths over an ``array<float>`` embedding column:

- ``ann_bruteforce_topk``: exact cosine top-k. The query set is
  broadcast; the corpus streams through a JVM-side zip_with/aggregate
  dot product — no shuffle of the corpus, no Python. Cost O(|corpus|
  × |queries| × dim): right whenever queries ≪ corpus (the usual
  retrieval shape), and the baseline every approximate method is
  verified against.
- ``ann_lsh_topk``: random-hyperplane (SimHash-for-vectors) LSH.
  Deterministic hyperplanes are derived from a seeded RNG, shipped as
  literal arrays (built into the plan, broadcast with it); corpus
  rows hash to signature buckets, candidates surface via a band
  equi-join and are re-ranked by exact cosine. At 100 TB this trades
  the |corpus|×|queries| product for a bucket join keyed on uniform
  hashes — skew-free, and the only full-corpus pass is the signature
  projection.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right sum — bit-identical to the DuckDB
    oracle's list_sum over the zipped product."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def ann_bruteforce_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
    k: int = 3,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors for the filtered query subset against the
    whole corpus. Returns (qid, nid, cos), rank by (cos desc, nid) —
    rounding before ranking keeps the ordering engine-portable."""
    base = embeddings.select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("ce")
    )
    qf = query_filter if query_filter is not None else (F.col(id_col) % 50 == 0)
    q = embeddings.where(qf).select(
        F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qe")
    )
    scored = base.crossJoin(F.broadcast(q)).where(F.col("qid") != F.col("nid"))
    scored = scored.select(
        "qid",
        "nid",
        F.round(cosine(F.col("qe"), F.col("ce")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-of-projection signature as a LONG (≤ 63 planes). The
    planes become literal arrays in the plan — JVM-side dot products,
    no Python, no shuffle."""
    sig = F.lit(0).cast("long")
    n_planes = planes.shape[0]
    for i in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        proj = dot(vec, lit_plane)
        sig = sig + F.when(proj > 0, F.lit(1 << (n_planes - 1 - i))).otherwise(0)
    return sig


def ann_lsh_topk(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_filter: Column | None = None,
    k: int = 3,
    n_planes: int = 16,
    bands: int = 8,
    seed: int = 7,
    round_digits: int = 6,
) -> DataFrame:
    """Banded random-hyperplane ANN: candidates share ≥1 signature
    band with the query; exact cosine re-ranks. Recall rises with
    bands (pigeonhole: hamming < bands ⇒ some band matches)."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    base = embeddings.select(
        F.col(id_col).alias("id"),
        as_double(F.col(vec_col)).alias("ve"),
        lsh_signature(as_double(F.col(vec_col)), planes).alias("sig"),
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("sig"), (bands - 1 - b) * bits_per_band)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = base.select("id", "ve", F.explode(band_arr).alias("bb")).select(
        "id", "ve", "bb.band", "bb.key"
    )
    qf = query_filter if query_filter is not None else (F.col("id") % 50 == 0)
    qb = banded.where(qf).select(
        F.col("id").alias("qid"), F.col("ve").alias("qe"), "band", "key"
    )
    cand = (
        banded.join(qb, ["band", "key"])
        .where(F.col("id") != F.col("qid"))
        .select("qid", "qe", F.col("id").alias("nid"), F.col("ve").alias("ce"))
        .distinct()
    )
    scored = cand.select(
        "qid",
        "nid",
        F.round(cosine(F.col("qe"), F.col("ce")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("qid", "nid", "cos")
    )
