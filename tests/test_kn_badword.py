"""Kneser-Ney NLL (functions/text.py::kneser_ney_nll_table) and the
word-blocklist page filter (blocked_word_filter).

The KN test recomputes the interpolated-KN probabilities in pure
Python (dict counters — an independent implementation of the same
published formula) and checks the per-doc NLL to the operator's own
1e-6 rounding. The blocklist tests pin the whole-token contract
('class' never matches inside 'classic') and row totality.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from annotation_service_spark.functions.text import (
    blocked_word_filter,
    kneser_ney_nll_table,
)

D = 0.75


def _toks(t: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


def ref_kn(docs: dict[int, str]) -> dict[int, tuple[int, float]]:
    doc_bgs = {
        i: list(zip(_toks(t), _toks(t)[1:])) for i, t in docs.items()
    }
    cab = Counter(bg for bgs in doc_bgs.values() for bg in bgs)
    ca, n1_fwd, n1_back = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b), c in cab.items():
        ca[a] += c
        n1_fwd[a] += 1
        n1_back[b] += 1
    nt = float(len(cab))
    out = {}
    for i, bgs in doc_bgs.items():
        if not bgs:
            continue
        nll = 0.0
        for a, b in bgs:
            p = (max(cab[(a, b)] - D, 0.0) / ca[a]) + (
                ((D * n1_fwd[a]) / ca[a]) * (n1_back[b] / nt)
            )
            nll += -math.log2(p)
        mean = nll / len(bgs)
        out[i] = (len(bgs), math.floor(mean * 1e6 + 0.5) / 1e6)
    return out


def test_kn_matches_pure_python(spark):
    docs = {
        0: "the cat sat on the mat",
        1: "the cat ate the fish",
        2: "a dog sat on a log",
        3: "fish ate the dog",
        4: "one",  # < 2 tokens: no bigrams, drops out
        5: "the the the the",  # repetition: KN discounts the self-loop
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        r.id: (r.n_bigrams, r.nll_bits)
        for r in kneser_ney_nll_table(df).collect()
    }
    want = ref_kn(docs)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 2e-6, (i, got[i], want[i])


def test_kn_discount_shifts_mass_to_continuations():
    """Sanity on the formula itself: with equal raw counts, the
    backoff term gives a bigram whose SECOND word follows many
    distinct contexts a strictly higher probability than one whose
    second word has a single predecessor — the continuation prior
    Laplace smoothing cannot express."""
    docs = {
        0: "a z b z c z d z",  # z follows a,b,c,d → N1+(·z)=4
        1: "a q",              # q only follows a   → N1+(·q)=1
    }
    toks = {i: _toks(t) for i, t in docs.items()}
    cab = Counter(
        bg for i in toks for bg in zip(toks[i], toks[i][1:])
    )
    ca, n1f, n1b = defaultdict(int), defaultdict(int), defaultdict(int)
    for (a, b), c in cab.items():
        ca[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nt = float(len(cab))

    def p(a, b):
        return (max(cab[(a, b)] - D, 0.0) / ca[a]) + (
            ((D * n1f[a]) / ca[a]) * (n1b[b] / nt)
        )

    # identical c_ab (=1) and identical context 'a' (c_a=2, N1+(a·)=2);
    # only the continuation count differs
    assert cab[("a", "z")] == cab[("a", "q")] == 1
    assert p("a", "z") > p("a", "q")


def test_blocked_word_boundaries(spark):
    df = spark.createDataFrame(
        [
            (0, "classic classes subclass"),  # no whole-token 'class'
            (1, "Class! said the teacher"),  # punctuation boundary hits
            (2, "zebra banana"),  # clean
            (3, ""),  # empty text still yields a row
            (4, "apple CLASS apple class"),  # dedup + case fold
        ],
        "doc_id long, text string",
    )
    got = {
        r.id: (r.blocked, r.n_hits, r.hit_words)
        for r in blocked_word_filter(df, ["class", "apple"]).collect()
    }
    assert got[0] == (False, 0, "")
    assert got[1] == (True, 1, "class")
    assert got[2] == (False, 0, "")
    assert got[3] == (False, 0, "")
    assert got[4] == (True, 2, "apple,class")


def test_blocked_list_normalized(spark):
    """List entries are lowercased and deduped before matching."""
    df = spark.createDataFrame([(0, "foo bar")], "doc_id long, text string")
    row = blocked_word_filter(df, ["FOO", "foo", "Bar"]).collect()[0]
    assert (row.blocked, row.n_hits, row.hit_words) == (True, 2, "bar,foo")


def test_blocked_no_shuffle_plan(spark):
    """The blocklist folds into the plan as a literal — the physical
    plan is scan+project only (no Exchange, no Join)."""
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = blocked_word_filter(df, ["x"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
