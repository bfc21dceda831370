"""Embedding near-dup + IVF ANN tests."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from annotation_service_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = random.Random(7)
    rows = []
    for i in range(150):
        rows.append((i, [rng.gauss(0, 1) for _ in range(12)]))
    # plant near-dups: 200+i = tiny perturbation of i for i in 0..4
    for i in range(5):
        base = rows[i][1]
        rows.append((200 + i, [x + rng.gauss(0, 0.01) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_dup_pairs_exact(spark, vec_df):
    pairs = sim.embedding_dup_pairs(vec_df, threshold=0.99).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    for i in range(5):
        assert (i, 200 + i) in got, f"planted dup {i} missing"
    # random gaussian pairs at d=12 essentially never reach 0.99
    assert len(got) == 5


def test_embedding_dup_pairs_lsh_recall(spark, vec_df):
    exact = {(r.id_a, r.id_b) for r in sim.embedding_dup_pairs(vec_df, threshold=0.99).collect()}
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.embedding_dup_pairs(vec_df, threshold=0.99, use_lsh=True).collect()
    }
    assert lsh <= exact
    assert len(lsh & exact) / len(exact) >= 0.8


def test_ivf_topk_recall(spark, vec_df):
    bf = {(r.qid, r.nid) for r in sim.ann_bruteforce_topk(vec_df, k=3).collect()}
    ivf = {
        (r.qid, r.nid)
        for r in sim.ann_ivf_topk(vec_df, k=3, n_centroids=6, n_probe=3).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # full-probe IVF == brute force (n_probe = n_centroids ⇒ exhaustive)
    full = {
        (r.qid, r.nid)
        for r in sim.ann_ivf_topk(vec_df, k=3, n_centroids=4, n_probe=4).collect()
    }
    assert full == bf


def test_gemm_topk_matches_expression_form(spark, vec_df):
    """The per-partition GEMM formulation returns the same neighbor
    set as the crossJoin expression form (exact method, different
    physical strategy)."""
    bf = {(r.qid, r.nid) for r in sim.ann_bruteforce_topk(vec_df, k=3).collect()}
    gemm = {
        (r.qid, r.nid)
        for r in sim.ann_bruteforce_topk_gemm(vec_df, k=3).collect()
    }
    assert gemm == bf
