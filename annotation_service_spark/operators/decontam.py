"""Benchmark decontamination: flag corpus documents that share n-gram
shingles with an evaluation/benchmark set.

Training-data hygiene requires removing (or at least flagging) corpus
documents that overlap the benchmarks the model will be scored on —
the standard approach (GPT-3 appendix C, PaLM §7, Llama) is n-gram
collision against the benchmark text.

Spark shape, designed for the 100 TB asymmetry:
- the CORPUS is huge; the BENCHMARK set is tiny (MBs). Benchmark
  shingles are therefore broadcast — the corpus never shuffles for
  the membership probe.
- ONE aggregation computes both the per-doc shingle total and the
  hit count (the broadcast join is a left join carrying a hit
  marker), so the whole operator is: corpus scan -> shingle explode
  -> broadcast probe -> one map-side-combinable groupBy on doc id.
- at extreme benchmark sizes (beyond broadcast), the same code
  degrades gracefully: drop the broadcast hint and Spark plans a
  shuffle join keyed on the shingle hash — uniform, skew-free.

The reference has no decontamination surface; this is a
beyond-reference training-pipeline operator, oracle-checked against
DuckDB (same md5-free pure-string shingles, exact counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    threshold: float = 0.1,
    broadcast_benchmark: bool = True,
    corpus_shingles: DataFrame | None = None,
) -> DataFrame:
    """Per corpus document: distinct-shingle total, how many of those
    shingles appear anywhere in the benchmark set, the contaminated
    fraction, and a flag at ``hit_frac >= threshold``.

    Returns (doc_id, n_shingles, n_hits, hit_frac, contaminated),
    one row per corpus doc with at least one shingle.
    ``corpus_shingles`` accepts a shared (id, s) table so composite
    pipelines tokenize the corpus once.
    """
    bsh = (
        shingle_table(benchmark, id_col, text_col, ngram)
        .select("s")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bsh = F.broadcast(bsh)
    csh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle_table(corpus, id_col, text_col, ngram)
    )
    return (
        csh.join(bsh, "s", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hits"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_shingles")).alias(
                "hit_frac"
            ),
            (
                F.col("n_hits").cast("double") / F.col("n_shingles")
                >= F.lit(threshold)
            ).alias("contaminated"),
        )
    )


def embedding_contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic twin
    of ``contamination_check``: a corpus vector is contaminated when
    its cosine to ANY benchmark vector reaches ``threshold`` (catches
    paraphrases and translations the n-gram probe misses). Returns
    (id, n_hits, max_cos, contaminated) per corpus vector.

    Scale: the benchmark set is small by construction (eval suites
    are thousands of rows), so it BROADCASTS and the corpus streams
    through one scan — no shuffle, no self-join; the cosine is the
    ANN family's dim-unrolled codegen expression rounded to 1e-6
    (oracle-portable). For benchmark sets too big to broadcast, fall
    back to lsh_candidates between the two sides (same probed band
    machinery) + this verify on the candidate pairs.
    """
    from .similarity import _vec_dim, as_double, dot

    dim = _vec_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("ce")
    ).withColumn("cn", F.sqrt(dot("ce", "ce", dim)))
    b = benchmark.select(
        F.col(id_col).alias("bid"), as_double(F.col(vec_col)).alias("be")
    ).withColumn("bn", F.sqrt(dot("be", "be", dim)))
    scored = c.crossJoin(F.broadcast(b)).select(
        "id",
        F.round(
            dot("ce", "be", dim) / (F.col("cn") * F.col("bn")), round_digits
        ).alias("cos"),
    )
    return scored.groupBy("id").agg(
        F.sum(F.when(F.col("cos") >= threshold, 1).otherwise(0))
        .cast("long")
        .alias("n_hits"),
        F.max("cos").alias("max_cos"),
        (F.max("cos") >= F.lit(threshold)).alias("contaminated"),
    )
