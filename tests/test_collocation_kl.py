"""PMI collocations, source-KL mixing diagnostics, and containment
dedup — each differentially checked against a pure-Python reference
implementation over the same planted fixture."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from annotation_service_spark.functions import text as txt
from annotation_service_spark.operators import dedup as dd


def _toks(s: str) -> list[str]:
    return [w for w in re.split("[^a-z0-9]+", s.lower()) if w]


PMI_DOCS = [
    (1, "hong kong hong kong hong kong"),
    (2, "hong kong is far from here"),
    (3, "the cat sat on the mat"),
    (4, "the dog sat on the mat"),
    (5, "the cat ran to the mat"),
    (6, "the dog ran to the mat"),
    (7, "cat cat cat dog dog dog"),
    (8, "hong kong hong kong"),
]


def _py_pmi(docs, min_count, k):
    uni: Counter = Counter()
    big: Counter = Counter()
    for _, text in docs:
        ws = _toks(text)
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = float(sum(big.values()))
    rows = []
    for (w1, w2), c in big.items():
        if c < min_count:
            continue
        pmi = math.log2(c * n / (uni[w1] * uni[w2]))
        pmi = math.floor(pmi * 1e6 + 0.5) / 1e6
        rows.append((w1, w2, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_pmi_matches_python_reference(spark):
    df = spark.createDataFrame(PMI_DOCS, "doc_id long, text string")
    got = [
        (r.w1, r.w2, r.n_pair, r.pmi)
        for r in txt.pmi_collocations(df, min_count=2, k=10).collect()
    ]
    assert got == _py_pmi(PMI_DOCS, 2, 10)
    # the exclusive pair outranks pairs diluted by the ubiquitous 'the'
    order = [(w1, w2) for w1, w2, _, _ in got]
    assert order.index(("hong", "kong")) < order.index(("the", "cat"))


def test_pmi_min_count_floors_rare_pairs(spark):
    df = spark.createDataFrame(PMI_DOCS, "doc_id long, text string")
    got = txt.pmi_collocations(df, min_count=5, k=10).collect()
    assert all(r.n_pair >= 5 for r in got)
    # 'hong kong' appears 6x; every other bigram < 5
    assert {(r.w1, r.w2) for r in got} == {("hong", "kong")}


KL_DOCS = [
    # two sources with the SAME distribution -> identical kl
    (1, "alpha beta gamma alpha beta", "s1"),
    (2, "alpha beta gamma alpha beta", "s2"),
    # one source skewed entirely to a different token
    (3, "omega omega omega omega omega", "s3"),
]


def _py_kl(docs, top_v):
    st: dict[str, Counter] = {}
    marg: Counter = Counter()
    for _, text, src in docs:
        ws = _toks(text)
        st.setdefault(src, Counter()).update(ws)
        marg.update(ws)
    top = sorted(marg.items(), key=lambda kv: (-kv[1], kv[0]))[:top_v]
    v = float(len(top))
    n_q = float(sum(c for _, c in top))
    out = {}
    for src, cnt in st.items():
        n_s = float(sum(cnt[t] for t, _ in top))
        kl = 0.0
        for t, c_t in top:
            p = (cnt[t] + 1.0) / (n_s + v)
            q = (c_t + 1.0) / (n_q + v)
            kl += p * math.log2(p / q)
        out[src] = (int(n_s), math.floor(kl * 1e6 + 0.5) / 1e6)
    return out


def test_source_kl_matches_python_reference(spark):
    df = spark.createDataFrame(KL_DOCS, "doc_id long, text string, source string")
    got = {
        r.source: (r.n_tokens, r.kl_bits)
        for r in txt.source_kl_table(df, top_v=500).collect()
    }
    want = _py_kl(KL_DOCS, 500)
    assert set(got) == set(want)
    for src in want:
        assert got[src][0] == want[src][0]
        assert got[src][1] == pytest.approx(want[src][1], abs=2e-6)
    # identical sources agree; the skewed source diverges more
    assert got["s1"][1] == got["s2"][1]
    assert got["s3"][1] > got["s1"][1]


CONTAIN_DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (
        2,
        "intro words alpha beta gamma delta epsilon and then a very "
        "long tail of unrelated content about query engines shuffles "
        "joins partitions and adaptive execution plans",
    ),
    (3, "alpha beta gamma delta epsilon"),  # exact twin of 1
    (4, "nothing shared with anything else whatsoever here"),
]


def test_containment_is_directed(spark):
    df = spark.createDataFrame(CONTAIN_DOCS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.containment
        for r in dd.ngram_containment_pairs(df, ngram=3, threshold=0.8).collect()
    }
    # doc 1 fully contained in doc 2 -> directed 1->2 at 1.0, not 2->1
    assert got[(1, 2)] == pytest.approx(1.0)
    assert (2, 1) not in got
    # exact twins emit BOTH orientations at 1.0
    assert got[(1, 3)] == pytest.approx(1.0)
    assert got[(3, 1)] == pytest.approx(1.0)
    # the disjoint doc appears nowhere
    assert not any(4 in p for p in got)


def test_containment_vs_jaccard_asymmetry(spark):
    """The defining case: containment fires where jaccard cannot."""
    df = spark.createDataFrame(CONTAIN_DOCS, "doc_id long, text string")
    jac = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(df, ngram=3, threshold=0.8).collect()
    }
    assert (1, 2) not in jac  # short-in-long is invisible to jaccard>=0.8
