"""Degenerate-corpus safety net: every document-family operator must
handle empty text, whitespace-only, single-token, and unicode-only
documents without crashing, and produce sane values."""

from __future__ import annotations

from pyspark.sql import functions as F

from annotation_service_spark.functions.text import (
    text_metrics_table,
    unigram_nll_table,
    vocab_topk,
)
from annotation_service_spark.operators.curation import temperature_mix
from annotation_service_spark.operators.dedup import (
    dedup_exact,
    duplicate_span_coverage,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    remove_duplicate_spans,
    simhash_pairs,
)


def _weird_docs(spark):
    return spark.createDataFrame(
        [
            (1, ""),
            (2, "   \t\n  "),
            (3, "one"),
            (4, "…—“”£¥§"),          # no [a-z0-9] tokens at all
            (5, "a b c d e f g h i j"),
            (6, "a b c d e f g h i j"),  # exact dup of 5
        ],
        ["doc_id", "text"],
    ).withColumn("source", F.lit("s")).withColumn("lang", F.lit("en"))


def test_span_ops_degenerate(spark):
    docs = _weird_docs(spark)
    cov = {r["id"]: r for r in duplicate_span_coverage(docs, k=3).collect()}
    assert len(cov) == 6
    for i in (1, 2, 3, 4):
        assert cov[i]["n_tokens"] <= 1 and cov[i]["dup_tokens"] == 0
        assert cov[i]["dup_frac"] == 0.0
    assert cov[5]["dup_tokens"] == 10 and cov[6]["dup_tokens"] == 10
    rem = {r["id"]: r for r in remove_duplicate_spans(docs, k=3).collect()}
    assert rem[1]["clean_text"] == "" and rem[5]["clean_text"] == ""
    assert rem[3]["clean_text"] == "one"


def test_pair_ops_degenerate(spark):
    docs = _weird_docs(spark)
    jac = ngram_jaccard_pairs(docs, ngram=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in jac} == {(5, 6)}
    mh = minhash_lsh_pairs(docs, ngram=3, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in mh} == {(5, 6)}
    sh = simhash_pairs(docs, ngram=3, max_hamming=2).collect()
    # featureless docs must NOT pair with each other (null fingerprint)
    assert {(r["id_a"], r["id_b"]) for r in sh} == {(5, 6)}


def test_scalar_tables_degenerate(spark):
    docs = _weird_docs(spark)
    assert dedup_exact(docs).count() == 5  # 5/6 share a hash
    tm = text_metrics_table(docs)
    assert tm.count() == 6
    nll = {r["id"]: r for r in unigram_nll_table(docs).collect()}
    # docs with zero tokens are absent (no likelihood to report);
    # token docs present with finite positive nll
    assert set(nll) == {3, 5, 6}
    assert all(r["nll_bits"] >= 0 for r in nll.values())
    top = vocab_topk(docs, k=3).collect()
    assert top[0]["cnt"] >= top[-1]["cnt"]
    kept = temperature_mix(docs, alpha=0.5, salt="x")
    assert kept.count() == 6  # single stratum -> rate 1


def test_round4_ops_degenerate(spark):
    """tfidf pairs / bigram NLL / chunk spans on the weird corpus:
    no crashes, sane shapes (empty + tokenless docs drop out where
    the semantics say so)."""
    from annotation_service_spark.functions.text import bigram_nll_table
    from annotation_service_spark.operators.curation import chunk_spans
    from annotation_service_spark.operators.ranking import (
        tfidf_shingle_pairs,
    )

    docs = _weird_docs(spark).withColumn("n_chars", F.length("text"))
    # docs 5 and 6 are exact duplicates -> identical shingle vectors
    pairs = {
        (r.doc_a, r.doc_b): r.sim
        for r in tfidf_shingle_pairs(docs, min_sim=0.0).collect()
    }
    assert set(pairs) == {(5, 6)}
    assert pairs[(5, 6)] == 1.0
    nll = {r.id: r for r in bigram_nll_table(docs).collect()}
    assert set(nll) == {5, 6}  # only docs with >= 2 tokens
    assert nll[5].nll_bits == nll[6].nll_bits
    spans = chunk_spans(docs, chunk_size=5, overlap=2)
    got = {r.doc_id for r in spans.collect()}
    assert got == {1, 2, 3, 4, 5, 6}  # every doc gets >= 1 chunk
    zero = [r for r in spans.collect() if r.doc_id == 1]
    assert zero == [zero[0]] and zero[0].chunk_end == 0


def test_tfidf_empty_corpus(spark):
    from annotation_service_spark.operators.ranking import (
        tfidf_shingle_pairs,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert tfidf_shingle_pairs(empty).count() == 0


def test_r10_new_operators_degenerate_inputs(spark):
    """Empty and no-feature corpora through every r10-continuation
    operator: zero rows out, no crash — the contract every pair stage
    already honors."""
    from annotation_service_spark.operators import decontam as dc
    from annotation_service_spark.operators import dedup as dd
    from annotation_service_spark.operators.spatial import (
        grid_knn_join,
        grid_radius_join,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    tiny = spark.createDataFrame(
        [(1, "xy"), (2, "")], "doc_id long, text string"
    )  # no 3-gram features
    for df in (empty, tiny):
        assert dd.prefix_filter_jaccard_pairs(df, threshold=0.5).count() == 0
        assert dd.weighted_jaccard_pairs(df, threshold=0.5).count() == 0
        assert dd.weighted_minhash_pairs(df, threshold=0.5).count() == 0
        assert dd.winnow_pairs(df, k=5, window=4).count() == 0
    # decontaminate_spans: empty corpus -> empty; corpus with no
    # grams -> rows pass through unmasked (tokens exist, no hits)
    bench = spark.createDataFrame(
        [(100, "some benchmark text here")], "doc_id long, text string"
    )
    assert dc.decontaminate_spans(empty, bench).count() == 0
    rows = {r.doc_id: r for r in dc.decontaminate_spans(tiny, bench).collect()}
    assert rows[1].n_removed == 0 and rows[1].n_spans == 0
    assert 2 not in rows  # zero tokens -> no row, like the flag form
    # empty BENCHMARK: nothing masked anywhere
    docs = spark.createDataFrame(
        [(1, "one two three four five")], "doc_id long, text string"
    )
    out = dc.decontaminate_spans(docs, empty).collect()
    assert out[0].n_removed == 0 and out[0].n_spans == 0
    # spatial: empty sides
    epts = spark.createDataFrame([], "id long, lat double, lon double")
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "id long, lat double, lon double"
    )
    assert grid_radius_join(epts, pts, 100.0).count() == 0
    assert grid_radius_join(pts, epts, 100.0).count() == 0
    assert grid_knn_join(pts, epts, k=1).count() == 0
