"""BM25 ranking (operators/ranking.py): distributed stats vs the
independent sequential replica, scoring invariants, and the
contract registration for the three new curation/ranking gates."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as em
from annotation_service_spark.operators import ranking as rk

SF = "/root/testdata/sf0.001"


def test_distributed_stats_match_sequential_replica(spark):
    docs = em._t(spark, SF, "documents")
    dist = rk.bm25_stats(docs, em.BM25_TERMS)
    ref = rk.bm25_stats_reference(f"{SF}/documents.parquet", em.BM25_TERMS)
    assert dist == ref


def test_scores_positive_and_term_gated(spark):
    """Every scored doc contains ≥1 query term; every doc containing
    a query term is scored (score > 0 given non-negative idf)."""
    docs = em._t(spark, SF, "documents")
    out = rk.bm25_score(docs, em.BM25_TERMS)
    scored = {r.doc_id for r in out.collect()}
    import re

    have = set()
    for r in docs.select("doc_id", "text").collect():
        toks = set(re.split(r"[^a-z0-9]+", r.text.lower()))
        if toks & set(em.BM25_TERMS):
            have.add(r.doc_id)
    assert scored == have


def test_rarer_term_outranks_common_term(spark):
    """A doc matching only the rarest term beats a doc matching only
    the most common term the same number of times (idf ordering) —
    checked on synthetic two-doc data with equal lengths."""
    ref = rk.bm25_stats_reference(f"{SF}/documents.parquet", em.BM25_TERMS)
    dfs = ref["df"]
    rare = min(dfs, key=dfs.get)
    common = max(dfs, key=dfs.get)
    assert dfs[rare] < dfs[common]
    assert rk.bm25_idf(ref["n"], dfs[rare]) > rk.bm25_idf(
        ref["n"], dfs[common]
    )


def test_top_n_cuts_by_rounded_score_then_id(spark):
    docs = em._t(spark, SF, "documents")
    full = sorted(
        ((r.bm25_micro, r.doc_id) for r in rk.bm25_score(docs, em.BM25_TERMS).collect()),
        key=lambda t: (-t[0], t[1]),
    )
    top = rk.bm25_score(docs, em.BM25_TERMS, top_n=10).collect()
    assert [(r.bm25_micro, r.doc_id) for r in top] == full[:10]


def test_idf_formula():
    # Lucene non-negative idf: df == N still yields > 0
    assert rk.bm25_idf(100, 100) > 0
    assert rk.bm25_idf(100, 1) == math.log(1 + 99.5 / 1.5)


def test_registered_in_contract():
    q = em.queries()
    o = em.oracle_sql()
    for name in ("bm25_rank", "weighted_sample", "group_split"):
        assert name in q and name in o


def test_randomized_differential_vs_pure_python(spark):
    """Random corpora (seeded RNG) scored by Spark BM25 must agree
    with an independent pure-Python scorer to the fixed-point digit —
    one Spark job over all corpora (corpus-offset doc ids)."""
    import random
    import re

    rng = random.Random(20260814)
    vocab = ["a", "b", "c", "d", "e", "f"]
    terms = ["a", "d"]
    rows = []
    for c in range(20):
        for d in range(8):
            n = rng.randint(1, 15)
            rows.append(
                (c * 100 + d, c, " ".join(rng.choice(vocab) for _ in range(n)))
            )
    df = spark.createDataFrame(rows, "doc_id long, corpus int, text string")

    got = {}
    for c in range(20):
        sub = df.where(F.col("corpus") == c)
        out = rk.bm25_score(sub, terms)
        got[c] = {r.doc_id: r.bm25_micro for r in out.collect()}

    k1, b = 1.2, 0.75
    for c in range(20):
        docs = {i: t for i, cc, t in rows if cc == c}
        toks = {
            i: [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            for i, t in docs.items()
        }
        n = len(docs)
        avgdl = float(sum(len(v) for v in toks.values())) / float(n)
        exp = {}
        for i, tk in toks.items():
            s = 0.0
            for t in terms:
                df_t = sum(1 for v in toks.values() if t in v)
                idf = rk.bm25_idf(n, df_t)
                tf = float(tk.count(t))
                s += (idf * (tf * (k1 + 1.0))) / (
                    tf + k1 * ((1.0 - b) + b * (float(len(tk)) / avgdl))
                )
            micro = int(math.floor(s * rk.SCORE_SCALE))
            if micro > 0:
                exp[i] = micro
        assert got[c] == exp, f"corpus {c}"


def test_tfidf_shingle_pairs_hand_case(spark):
    """Two near-identical docs share most shingles (high sim); an
    unrelated doc pairs with neither; df=1 shingles count toward norms
    but never generate candidates."""
    from annotation_service_spark.operators.ranking import tfidf_shingle_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different words about spark query engines"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b): r.sim for r in
           tfidf_shingle_pairs(docs, min_sim=0.0).collect()}
    assert set(got) == {(1, 2)}
    assert 0.5 < got[(1, 2)] < 1.0


def test_tfidf_max_df_prunes_common_shingles(spark):
    """A shingle present in EVERY doc is dropped by max_df, removing
    the only shared term — no pairs survive."""
    from annotation_service_spark.operators.ranking import tfidf_shingle_pairs

    docs = spark.createDataFrame(
        [(i, f"common shared prefix unique{i} tail{i} word{i}") for i in range(4)],
        "doc_id long, text string",
    )
    assert tfidf_shingle_pairs(docs, min_sim=0.0, max_df=3).count() == 0
    assert tfidf_shingle_pairs(docs, min_sim=0.0, max_df=1000).count() > 0
