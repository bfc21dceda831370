"""Randomized differential test: span coverage / removal vs a
brute-force pure-Python oracle (the geo-ip_test.go:123-203 pattern —
random corpora, independent implementation, exact agreement).

One Spark job over MANY random corpora: corpora are generated with a
seeded RNG, tagged with a corpus id, and processed in a single pass
(doc ids offset per corpus) — the differential sweep costs two Spark
actions total, not two per corpus.
"""

from __future__ import annotations

import random
import re

from annotation_service_spark.operators.dedup import (
    duplicate_span_coverage,
    remove_duplicate_spans,
)

K = 3
VOCAB = ["a", "b", "c", "d", "e"]
N_CORPORA = 25
DOCS_PER = 6


def _gen_corpora():
    rng = random.Random(20260814)
    corpora = []
    for c in range(N_CORPORA):
        docs = {}
        for d in range(DOCS_PER):
            n = rng.randint(0, 12)
            docs[c * 1000 + d] = " ".join(
                rng.choice(VOCAB) for _ in range(n)
            )
        corpora.append(docs)
    return corpora


def _oracle(docs: dict[int, str], k: int):
    """Brute force: count k-gram occurrences corpus-wide, mark
    covered positions, derive coverage and cleaned text."""
    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        for i, s in docs.items()
    }
    from collections import Counter

    counts = Counter()
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            counts[tuple(ts[p : p + k])] += 1
    out = {}
    for i, ts in toks.items():
        covered = set()
        for p in range(len(ts) - k + 1):
            if counts[tuple(ts[p : p + k])] > 1:
                covered.update(range(p, p + k))
        kept = [t for p, t in enumerate(ts) if p not in covered]
        out[i] = (len(ts), len(covered), " ".join(kept))
    return out


def test_span_ops_match_bruteforce(spark):
    corpora = _gen_corpora()
    rows = [(i, s) for docs in corpora for i, s in docs.items()]

    # per-corpus isolation inside ONE dataframe: remap each corpus's
    # tokens to a corpus-unique vocabulary (a -> ax17), preserving
    # all equality structure within a corpus while guaranteeing no
    # gram ever matches across corpora.
    remapped = [
        (i, " ".join(f"{t}x{i // 1000}" for t in s.split()))
        for i, s in rows
    ]
    df = spark.createDataFrame(remapped, ["doc_id", "text"])

    cov = {
        r["id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicate_span_coverage(df, k=K).collect()
    }
    rem = {
        r["id"]: (r["n_kept"], r["clean_text"])
        for r in remove_duplicate_spans(df, k=K).collect()
    }

    for docs in corpora:
        cid = next(iter(docs)) // 1000
        remapped_docs = {
            i: " ".join(f"{t}x{cid}" for t in s.split())
            for i, s in docs.items()
        }
        exp = _oracle(remapped_docs, K)
        for i, (n_tok, n_cov, clean) in exp.items():
            assert cov[i] == (n_tok, n_cov), (i, cov[i], (n_tok, n_cov))
            assert rem[i] == (n_tok - n_cov, clean), (i, rem[i])


def test_span_ops_cross_invariants(spark):
    """For random corpora: dup_tokens + n_kept == n_tokens doc-by-doc
    (coverage and removal agree on the covered set), and coverage is
    monotonically non-increasing in k (a duplicated k+1-span implies
    duplicated k-spans covering at least the same positions)."""
    rng = random.Random(777)
    rows = []
    for c in range(10):
        for d in range(8):
            n = rng.randint(0, 15)
            rows.append(
                (
                    c * 1000 + d,
                    " ".join(
                        f"{rng.choice(VOCAB)}x{c}" for _ in range(n)
                    ),
                )
            )
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    cov_by_k = {}
    for k in (2, 3, 4):
        cov_by_k[k] = {
            r["id"]: (r["n_tokens"], r["dup_tokens"])
            for r in duplicate_span_coverage(df, k=k).collect()
        }
    rem3 = {
        r["id"]: r["n_kept"] for r in remove_duplicate_spans(df, k=3).collect()
    }
    for i, (n_tok, dup) in cov_by_k[3].items():
        assert dup + rem3[i] == n_tok, i
    for i in cov_by_k[2]:
        assert (
            cov_by_k[2][i][1] >= cov_by_k[3][i][1] >= cov_by_k[4][i][1]
        ), i
