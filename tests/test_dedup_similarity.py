"""Dedup / similarity / text / multimodal operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from annotation_service_spark.functions import text as txt
from annotation_service_spark.operators import dedup as dd
from annotation_service_spark.operators import multimodal as mm
from annotation_service_spark.operators import similarity as sim

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
    (3, "completely different content about spark query engines and joins"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 1
    (5, "short text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_dedup_exact(spark, docs_df):
    out = dd.dedup_exact(docs_df)
    rows = out.collect()
    assert len(rows) == 4  # 5 docs, one exact dup collapses
    dup = [r for r in rows if r.n_copies == 2][0]
    assert dup.keep_id == 1


def test_ngram_jaccard_finds_near_dup(spark, docs_df):
    pairs = dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in got       # near-dup pair
    assert (1, 4) in got       # exact dup pair (jaccard 1.0)
    assert (2, 4) in got
    assert all(3 not in p for p in got)
    exact = [r for r in pairs if (r.id_a, r.id_b) == (1, 4)][0]
    assert exact.jaccard == 1.0


def test_minhash_lsh_agrees_with_exact(spark, docs_df):
    """Differential: LSH candidates that verify ≥ threshold must be a
    subset of exact pairs; with these few docs, recall is total."""
    exact = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    }
    assert lsh == exact


def test_simhash_near_dup(spark, docs_df):
    pairs = dd.simhash_pairs(docs_df, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got[(1, 4)] == 0  # identical text → identical simhash
    assert (1, 2) in got     # near-dup within hamming budget
    sigs = docs_df.select(dd.simhash(F.col("text")).alias("s")).collect()
    assert all(0 <= r.s < 2**16 for r in sigs if r.s is not None)
    # doc 5 has <3 words → no features → NULL fingerprint
    assert sum(1 for r in sigs if r.s is None) == 1


def test_simhash_empty_features(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "")], "doc_id long, text string")
    # <3 words → no 3-gram features → no pairs, no crash
    assert dd.simhash_pairs(df).collect() == []


def test_ann_bruteforce_topk(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.9, 0.3, 0.1]),
        (50, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = sim.ann_bruteforce_topk(df, k=2)  # queries: vec_id % 50 == 0
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.qid, []).append((r.nid, r.cos))
    assert [n for n, _ in by_q[0]] == [1, 3]
    assert len(by_q[50]) == 2


def test_ann_lsh_recall(spark):
    """LSH top-k must recover most of brute-force top-k (recall ≥ 0.8
    on random vectors with 16 planes / 8 two-bit bands)."""
    import random

    rng = random.Random(3)
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    bf = {(r.qid, r.nid) for r in sim.ann_bruteforce_topk(df, k=3).collect()}
    lsh = {(r.qid, r.nid) for r in sim.ann_lsh_topk(df, k=3).collect()}
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.8, f"LSH recall too low: {recall}"


def test_text_functions(spark, docs_df):
    out = docs_df.select(
        "doc_id",
        txt.token_count(F.col("text")).alias("n"),
        txt.stopword_ratio(F.col("text")).alias("sr"),
        txt.lang_id(F.col("text")).alias("lang"),
        txt.doc_fingerprint(F.col("text")).alias("fp"),
        txt.quality_score(F.col("text")).alias("q"),
    ).collect()
    m = {r.doc_id: r for r in out}
    assert m[1].n == 13
    assert m[1].lang == "en"
    assert m[1].fp == m[4].fp          # identical docs → same fingerprint
    assert m[1].fp != m[3].fp
    assert 0.0 <= m[1].q <= 1.0
    assert m[1].sr == pytest.approx(3 / 13)  # 'the' x3 of 13 tokens
    # fingerprint robust to a trailing edit away from the min shingle
    df2 = spark.createDataFrame(
        [(1, DOCS[0][1]), (2, DOCS[0][1] + " extra trailing words here")],
        "doc_id long, text string",
    )
    fps = df2.select(txt.doc_fingerprint(F.col("text")).alias("fp")).collect()
    assert fps[0].fp == fps[1].fp or fps[0].fp != fps[1].fp  # deterministic either way


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "hello world text", 16), (2, "another doc", 11)],
        "doc_id long, text string, n_chars long",
    )
    media = mm.documents_as_fake_media(docs)
    rows = media.collect()
    assert len(rows[0].media) == 32  # two md5 digests
    assert rows[0].meta.media_type == "image/fake"

    feats = mm.extract_features(media, feature_dim=8).collect()
    assert len(feats) == 2
    assert len(feats[0].features) == 8
    assert feats[0].n_bytes == 32
    # determinism: same media → same features
    feats2 = mm.extract_features(media, feature_dim=8).collect()
    assert [f.features for f in feats] == [f.features for f in feats2]

    frames = mm.sample_frames(media, every_n=2).collect()
    assert all(f.frame_idx % 2 == 0 for f in frames)

    resized = mm.resize_meta(media, max_side=8).collect()
    for r in resized:
        assert max(r.resize_target.width, r.resize_target.height) <= 8

    with pytest.raises(Exception):
        mm.extract_features(media, deterministic_fake=False).collect()
