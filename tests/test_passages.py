"""Maximal shared-passage extraction + keep-first span dedup.

Differential tests against an independent pure-python oracle:
`shared_passages` must report exactly the maximal shared token runs
(ExactSubstr semantics, Lee et al. 2022 — the dot-plot diagonal
construction), and `remove_duplicate_spans_keep_first` must keep one
canonical copy of every duplicated passage where
`remove_duplicate_spans` cuts all of them.
"""

from __future__ import annotations

import re

import pytest

from annotation_service_spark.operators import dedup as dd


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute_passages(docs, k, min_tokens):
    """All maximal shared runs between doc pairs, by diagonal scan."""
    toks = {i: _toks(t) for i, t in docs}
    grams = {
        i: [tuple(ts[p : p + k]) for p in range(len(ts) - k + 1)]
        for i, ts in toks.items()
    }
    out = set()
    ids = sorted(toks)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            matches = {
                (pa, pb)
                for pa, ga in enumerate(grams[a])
                for pb, gb in enumerate(grams[b])
                if ga == gb
            }
            by_diag: dict[int, list[int]] = {}
            for pa, pb in matches:
                by_diag.setdefault(pa - pb, []).append(pa)
            for diag, pas in by_diag.items():
                pas.sort()
                run_start = pas[0]
                prev = pas[0]
                for pa in pas[1:] + [None]:
                    if pa is not None and pa == prev + 1:
                        prev = pa
                        continue
                    length = prev - run_start + k
                    if length >= min_tokens:
                        out.add((a, b, run_start, run_start - diag, length))
                    if pa is not None:
                        run_start = prev = pa
    return out


PASSAGE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def passage_docs(spark):
    rows = [
        # 1 and 2 share PASSAGE (13 tokens) at different offsets
        (1, "alpha beta " + PASSAGE + " gamma delta epsilon zeta"),
        (2, "one two three four " + PASSAGE + " five six"),
        # 3 shares a shorter run with 1/2 (first 9 tokens of PASSAGE)
        (3, "unrelated prefix words here " + " ".join(PASSAGE.split()[:9]) + " totally different tail"),
        # 4 shares nothing
        (4, "completely independent document content with no overlap at all whatsoever"),
        # 5 duplicates PASSAGE twice internally and shares with 1/2
        (5, PASSAGE + " interlude words " + PASSAGE),
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passages_matches_bruteforce(spark, passage_docs):
    rows, df = passage_docs
    k, mt = 4, 7
    got = {
        (r.id_a, r.id_b, r.start_a, r.start_b, r.length)
        for r in dd.shared_passages(df, k=k, min_tokens=mt, max_df=None).collect()
    }
    exp = _brute_passages(rows, k, mt)
    assert got == exp
    # sanity on the planted structure: the full 13-token passage is
    # reported between 1 and 2, and 5 reports TWO runs against 1
    lens_12 = {t[4] for t in got if t[:2] == (1, 2)}
    assert 13 in lens_12
    assert sum(1 for t in got if t[:2] == (1, 5)) == 2


def test_shared_passages_default_threshold_suppresses_lone_anchors(
    spark, passage_docs
):
    """With the default min_tokens=2k-1, a single colliding k-gram
    (run of one anchor, length k) never reports."""
    rows, df = passage_docs
    out = dd.shared_passages(df, k=4, max_df=None).collect()
    assert all(r.length >= 7 for r in out)
    exp = _brute_passages(rows, 4, 7)
    assert {(r.id_a, r.id_b, r.start_a, r.start_b, r.length) for r in out} == exp


def test_keep_first_preserves_one_copy(spark, passage_docs):
    """remove_duplicate_spans cuts every occurrence of a duplicated
    passage; the keep-first form must keep exactly the canonical
    first (min (id, pos)) occurrence — so doc 1 (the corpus-first
    holder of PASSAGE) keeps its full text, later holders lose it."""
    rows, df = passage_docs
    k = 4
    all_cut = {r.id: r for r in dd.remove_duplicate_spans(df, k=k).collect()}
    keep1 = {
        r.id: r for r in dd.remove_duplicate_spans_keep_first(df, k=k).collect()
    }
    # doc 4 shares nothing: untouched in both
    assert keep1[4].n_kept == keep1[4].n_tokens == all_cut[4].n_kept
    # doc 1 holds the canonical first occurrence -> loses NOTHING
    assert keep1[1].n_kept == keep1[1].n_tokens
    assert all_cut[1].n_kept < all_cut[1].n_tokens  # total-cut removed it
    # doc 2's copy is non-canonical -> removed in keep-first too
    assert keep1[2].n_kept < keep1[2].n_tokens
    assert PASSAGE not in keep1[2].clean_text
    # every doc keeps at least as much under keep-first as under total cut
    for i in keep1:
        assert keep1[i].n_kept >= all_cut[i].n_kept
    # corpus-wide, at least one copy of the passage text survives
    surviving = " | ".join(r.clean_text for r in keep1.values())
    assert PASSAGE in surviving


def test_keep_first_internal_repeat(spark):
    """A passage repeated WITHIN one document: the first occurrence
    is canonical, the later one is cut."""
    p = "zero one two three four five six seven"
    df = spark.createDataFrame(
        [(7, p + " filler words go here " + p)], "doc_id long, text string"
    )
    out = dd.remove_duplicate_spans_keep_first(df, k=4).collect()[0]
    assert 0 < out.n_kept < out.n_tokens
    assert out.clean_text.startswith(p)
    # the second copy is gone
    assert out.clean_text.count("zero one two three") == 1


def test_shared_passages_randomized_differential(spark):
    """Randomized corpora vs the brute-force diagonal scan: small
    vocab so accidental k-gram collisions, internal repeats, and
    overlapping runs all arise naturally; several (k, min_tokens)
    regimes."""
    import random

    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(12)]
    for trial in range(4):
        rows = []
        for did in range(1, 9):
            n = rng.randrange(5, 40)
            words = [rng.choice(vocab) for _ in range(n)]
            # occasionally splice a chunk of an earlier doc in
            if rows and rng.random() < 0.6:
                src = rng.choice(rows)[1].split()
                if len(src) > 6:
                    a = rng.randrange(0, len(src) - 4)
                    b = rng.randrange(a + 3, min(len(src), a + 15))
                    at = rng.randrange(0, len(words))
                    words[at:at] = src[a:b]
            rows.append((did, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        k = rng.choice([3, 4])
        mt = rng.choice([k, 2 * k - 1])
        got = {
            (r.id_a, r.id_b, r.start_a, r.start_b, r.length)
            for r in dd.shared_passages(
                df, k=k, min_tokens=mt, max_df=None
            ).collect()
        }
        exp = _brute_passages(rows, k, mt)
        assert got == exp, (trial, k, mt, got ^ exp)


def test_shared_passage_anchors_superset_of_runs(spark, passage_docs):
    """Anchor observability: every reported run of length L is backed
    by exactly L-k+1 anchors on its diagonal, so the anchor count is
    a true upper-bound resource measure for the operator."""
    rows, df = passage_docs
    k = 4
    anchors = dd.shared_passage_anchors(df, k=k, max_df=None).collect()
    akey = {(r.id_a, r.id_b, r.diag, r.pa) for r in anchors}
    runs = dd.shared_passages(df, k=k, min_tokens=k, max_df=None).collect()
    for r in runs:
        diag = r.start_a - r.start_b
        for pa in range(r.start_a, r.start_a + r.length - k + 1):
            assert (r.id_a, r.id_b, diag, pa) in akey
    assert len(akey) >= sum(r.length - k + 1 for r in runs)


def test_shared_passages_merge_cap_splits_restores_maximality(spark):
    """VERDICT r11 item 7: with merge_cap_splits=True, runs that a
    max_df stop-gram cap split through a hot interior re-merge to the
    exact uncapped maximal run (verified against the brute-force
    diagonal scan on the pair), runs with a GENUINELY differing
    middle on the same diagonal stay split, and a run split by TWO
    hot phrases chain-merges. Merge happens before the min_tokens
    filter, so a split piece under the floor still surfaces merged."""
    hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    hot2 = "g1 g2 g3 g4 g5 g6 g7 g8"
    fillers = [
        (100 + i, f"pre{i} junk{i} " + hot + f" mid{i} " + hot2 + f" tail{i}")
        for i in range(20)
    ]
    # docs 1/2: shared run with the hot phrase interior; the prefix
    # piece (u1 u2 + straddle) is SHORTER than min_tokens on its own
    shared = "u1 u2 " + hot + " v1 v2 v3 v4 v5 v6"
    pair = [(1, "aaa bbb " + shared + " ccc"), (2, "xxx " + shared + " yyy zzz")]
    # docs 3/4: same-diagonal runs around a truly differing middle
    ctrl = [
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 mida q1 q2 q3 q4 q5 q6 q7 q8"),
        (4, "w1 w2 w3 w4 w5 w6 w7 w8 midb q1 q2 q3 q4 q5 q6 q7 q8"),
    ]
    # docs 6/7: one run split by TWO hot phrases (chain merge)
    shared2 = "m1 m2 m3 " + hot + " n1 n2 n3 " + hot2 + " o1 o2 o3"
    chain = [(6, "lead " + shared2), (7, shared2 + " trail words")]
    rows = pair + ctrl + chain + fillers
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, mt, cap = 4, 7, 10

    def runs(out, a, b):
        return {
            (r.start_a, r.start_b, r.length)
            for r in out
            if (r.id_a, r.id_b) == (a, b)
        }

    uncapped = dd.shared_passages(df, k=k, min_tokens=mt, max_df=None).collect()
    split = dd.shared_passages(df, k=k, min_tokens=mt, max_df=cap).collect()
    merged = dd.shared_passages(
        df, k=k, min_tokens=mt, max_df=cap, merge_cap_splits=True
    ).collect()

    # pair 1/2: capped-unmerged loses the run's hot interior AND its
    # under-floor prefix piece; merged == uncapped == brute force
    exp_12 = {
        t[2:] for t in _brute_passages([r for r in rows if r[0] in (1, 2)], k, mt)
    }
    assert runs(merged, 1, 2) == runs(uncapped, 1, 2) == exp_12
    assert len(runs(uncapped, 1, 2)) == 1
    assert runs(split, 1, 2) != runs(uncapped, 1, 2)

    # control 3/4: truly differing middle — merge must NOT join
    exp_34 = {
        t[2:] for t in _brute_passages([r for r in rows if r[0] in (3, 4)], k, mt)
    }
    assert len(exp_34) == 2
    assert runs(merged, 3, 4) == runs(split, 3, 4) == exp_34

    # chain 6/7: two hot interiors, three pieces -> one merged run
    exp_67 = {
        t[2:] for t in _brute_passages([r for r in rows if r[0] in (6, 7)], k, mt)
    }
    assert runs(merged, 6, 7) == runs(uncapped, 6, 7) == exp_67
    assert len(exp_67) == 1
    # unmerged, only the middle piece clears the floor (the outer
    # pieces are under min_tokens) — the merged run is the full span
    assert runs(split, 6, 7) != runs(merged, 6, 7)
    assert max(t[2] for t in runs(split, 6, 7)) < max(
        t[2] for t in runs(merged, 6, 7)
    )


def test_shared_passages_extend_cap_edges_restores_endpoints(spark):
    """extend_cap_edges=True restores run ENDPOINTS a hot edge gram
    truncated: hot-prefix, hot-suffix, and hot-everywhere-but-anchor
    shapes all come back equal to the uncapped brute force; genuinely
    differing neighborhoods stop extension exactly at the mismatch
    (the control pair is byte-equal to brute force too); and the flag
    demands merge_cap_splits."""
    hot = "h1 h2 h3 h4 h5 h6 h7 h8"
    hot2 = "g1 g2 g3 g4 g5 g6 g7 g8"
    hot3 = "f1 f2 f3 f4 f5 f6 f7 f8"
    fillers = [
        (
            100 + i,
            f"pre{i} junk{i} " + hot + f" mid{i} " + hot2
            + f" via{i} " + hot3 + f" tail{i}",
        )
        for i in range(20)
    ]
    # 1/2: hot PREFIX — the run's left edge is truncated under the cap
    sh_a = hot + " u1 u2 u3 u4 u5 u6 u7 u8"
    # 3/4: hot SUFFIX
    sh_b = "v1 v2 v3 v4 v5 v6 v7 v8 " + hot
    # 6/7: hot prefix AND interior AND suffix (merge + both edges);
    # three DISTINCT hot phrases so no entirely-hot off-diagonal run
    # exists between the pair (those have no anchors and are
    # unrecoverable under any cap by construction)
    sh_c = hot + " m1 m2 m3 m4 m5 " + hot2 + " n1 n2 n3 n4 n5 " + hot3
    # 8/9: control — differing token right next to the shared run
    rows = (
        [(1, "aa bb " + sh_a + " cc"), (2, "xx " + sh_a + " yy zz")]
        + [(3, "aa bb " + sh_b + " cc"), (4, "xx " + sh_b + " yy zz")]
        + [(6, "lead " + sh_c), (7, sh_c + " trail")]
        + [
            (8, "p1 p2 p3 p4 p5 p6 p7 p8 enda"),
            (9, "p1 p2 p3 p4 p5 p6 p7 p8 endb"),
        ]
        + fillers
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, mt, cap = 4, 7, 10

    def runs(out, a, b):
        return {
            (r.start_a, r.start_b, r.length)
            for r in out
            if (r.id_a, r.id_b) == (a, b)
        }

    merged_only = dd.shared_passages(
        df, k=k, min_tokens=mt, max_df=cap, merge_cap_splits=True
    ).collect()
    extended = dd.shared_passages(
        df, k=k, min_tokens=mt, max_df=cap,
        merge_cap_splits=True, extend_cap_edges=True,
    ).collect()

    for a, b in ((1, 2), (3, 4), (6, 7), (8, 9)):
        exp = {
            t[2:]
            for t in _brute_passages([r for r in rows if r[0] in (a, b)], k, mt)
        }
        assert runs(extended, a, b) == exp, (a, b)
    # without extension the hot-edge pairs are truncated
    assert runs(merged_only, 1, 2) != runs(extended, 1, 2)
    assert runs(merged_only, 3, 4) != runs(extended, 3, 4)
    # the full prefix+interior+suffix run is ONE maximal run
    assert len(runs(extended, 6, 7)) == 1
    # control pair: extension stopped at the true mismatch
    assert runs(merged_only, 8, 9) == runs(extended, 8, 9)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="merge_cap_splits"):
        dd.shared_passages(df, max_df=cap, extend_cap_edges=True)
