"""Connected-component resolution for near-duplicate pairs.

A dedup pipeline's pair list (from ``minhash_lsh_pairs`` /
``simhash_pairs`` / ``ngram_jaccard_pairs`` /
``embedding_dup_pairs``) is an edge list; the unit of removal is the
connected COMPONENT (A~B, B~C means A,B,C are one duplicate group even
when A~C was never emitted). This module turns pairs into
``(id, cluster_id)`` with ``cluster_id = min(component)``, the
canonical keep-one-per-cluster contract.

Algorithm: iterative min-label propagation with pointer jumping.
Each round does

  1. label(u) <- min(label(u), min over neighbors v of label(v))
  2. label(u) <- label(label(u))        (pointer jumping / path halving)

Step 1 alone needs O(diameter) rounds; step 2 halves label-chain depth
each round, giving O(log d) convergence — near-dup graphs are dense
little blobs (d is 2-4), so 2-3 rounds is typical. Per round: two
shuffles for the neighbor-min (join + groupBy on uniformly-distributed
ids) and one self-join for the jump — all keyed by doc id, skew-free.

Scale notes (100 TB):
- labels are ONE row per vertex appearing in a pair — orders of
  magnitude smaller than the corpus; the edge list is the big input
  and it is never mutated, only re-joined.
- every iteration's result is localCheckpoint()ed: iterative plans
  otherwise stack lineage until planning dominates. localCheckpoint
  trades fault-tolerance within the job for plan truncation — the
  standard Spark iterative-algorithm pattern (GraphX does the same);
  a lost executor means rerunning the clustering job, not wrong
  output.
- convergence is detected with a LIMIT 1 count per round (a
  constant-size driver action), not a full collect.

Reference parity: the reference has no clustering operator (its
dedup surface ends at pair emission); this is a beyond-reference
training-data-pipeline operator, differentially tested against a
DuckDB recursive-CTE transitive closure (see __spark_entry__
``dedup_clusters`` oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Resolve an undirected edge list to (id, cluster_id) where
    cluster_id is the smallest id in the connected component.

    Vertices are the ids appearing in at least one pair (singletons
    carry no dedup decision and would bloat the result corpus-wide;
    left-join the output onto the corpus to tag them).
    """
    edges = pairs.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)

    # initial labels fold the first propagation round into the vertex
    # derivation: label0(u) = min(u, min neighbor) in ONE groupBy
    # (instead of distinct-vertices + a full propagate round)
    labels = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.least(F.first("src"), F.min("dst")).alias("comp"))
        .localCheckpoint(eager=False)
    )

    for _ in range(max_iters):
        # neighbor minimum: what is the smallest label any neighbor holds?
        nb_min = (
            sym.join(
                labels.select(
                    F.col("id").alias("src"), F.col("comp").alias("c")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("c").alias("nc"))
        )
        prop = labels.join(nb_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nc", "comp")).alias("comp"),
            F.col("comp").alias("prev"),
        )
        # pointer jumping: follow the label one hop (label(label(u)))
        jumped = (
            prop.join(
                prop.select(
                    F.col("id").alias("comp"), F.col("comp").alias("cc")
                ),
                "comp",
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("cc", "comp")
                ).alias("comp"),
                "prev",
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            jumped.where(F.col("comp") < F.col("prev")).limit(1).count()
        )
        labels = jumped.select("id", "comp")
        if changed == 0:
            break
    return labels.select("id", F.col("comp").alias("cluster_id"))


def dedup_keep_decision(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """(id, cluster_id, keep) — keep is true only for the canonical
    (smallest-id) member of each near-dup cluster. Left-join this
    onto the corpus and filter ``keep IS NULL OR keep`` to apply."""
    comp = connected_components(pairs, src_col, dst_col)
    return comp.select(
        "id", "cluster_id", (F.col("id") == F.col("cluster_id")).alias("keep")
    )
