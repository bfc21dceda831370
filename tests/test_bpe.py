"""BPE trainer + encoder: hand-case, partition property, and a
randomized differential against an independent in-test encoder."""

from __future__ import annotations

import random

from annotation_service_spark.functions.bpe import (
    _encode_word,
    bpe_encode,
    train_bpe,
    word_freqs,
)


def test_train_bpe_hand_case():
    # classic example: {"low":5, "lower":2, "newest":6, "widest":3}
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, 4)
    # "es" occurs in newest+widest = 9, the clear first merge;
    # then ("es","t") = 9; then ("l","o") = 7; then ("lo","w") = 7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")
    assert merges[3] == ("lo", "w")


def test_encode_word_applies_rank_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert _encode_word("lowest", ranks) == ["low", "est"]
    assert _encode_word("xyz", ranks) == ["x", "y", "z"]
    assert _encode_word("", ranks) == []


def _naive_encode(word, merges):
    """Independent implementation: apply merges one at a time in
    LEARNED order over the whole word (equivalent to greedy
    lowest-rank because earlier merges can never be re-enabled by
    later ones acting on disjoint symbols)."""
    sym = list(word)
    for a, b in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [a + b]
            else:
                i += 1
    return sym


def test_bpe_differential_and_partition_property(spark):
    rng = random.Random(11)
    words = [
        "".join(rng.choice("abcd") for _ in range(rng.randint(1, 8)))
        for _ in range(200)
    ]
    docs = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    freqs = word_freqs(df)
    # distributed word freq == local word freq
    local = {}
    for _, t in docs:
        for w in t.lower().split():
            local[w] = local.get(w, 0) + 1
    assert freqs == local

    merges = train_bpe(freqs, 30)
    out = {r["id"]: r for r in bpe_encode(df, merges).collect()}
    assert set(out) == {i for i, _ in docs}
    for i, t in docs:
        toks = out[i]["tokens"]
        assert out[i]["n_tokens"] == len(toks)
        # partition property: concatenating tokens re-yields the text
        # without whitespace
        assert "".join(toks) == t.lower().replace(" ", "")
        # differential vs the independent sequential-merge encoder
        expect = []
        for w in t.lower().split():
            expect.extend(_naive_encode(w, merges))
        assert toks == expect, i


def test_word_freqs_bounded_driver_collect(spark):
    """Heavy-tail vocabulary (VERDICT r3 #2): the driver collect is
    capped by max_words / min_count, keeps the highest-frequency head,
    and the learned merges are unchanged when only tail singletons are
    dropped."""
    head = [(i, "aa bb aa bb cc") for i in range(40)]
    # 3000 distinct singleton "URL-like" tail words
    tail = [
        (1000 + i, f"http-x{i}-y{i * 7} zz-{i}-tail") for i in range(1500)
    ]
    df = spark.createDataFrame(head + tail, ["doc_id", "text"])

    capped = word_freqs(df, max_words=100)
    assert len(capped) == 100
    # the head survives the cap with exact counts
    assert capped["aa"] == 80 and capped["bb"] == 80 and capped["cc"] == 40

    floored = word_freqs(df, min_count=2, max_words=None)
    assert floored == {"aa": 80, "bb": 80, "cc": 40}

    # merges learned from the floored table == merges from the exact
    # table here (tail singletons share no high-mass pairs)
    exact = word_freqs(df, max_words=None)
    assert len(exact) == 3 + 3000
    assert train_bpe(floored, 3) == train_bpe(
        {w: c for w, c in exact.items() if c >= 2}, 3
    )


def test_word_freqs_warns_when_cap_binds(spark):
    """The bounded default must not truncate SILENTLY: when the
    collected table hits max_words exactly, a RuntimeWarning names
    the cap and the exact opt-out."""
    import warnings

    df = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i}") for i in range(30)], ["doc_id", "text"]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        capped = word_freqs(df, max_words=10)
    assert len(capped) == 10
    assert any("max_words" in str(w.message) for w in caught)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        word_freqs(df, max_words=None)
    # no cap warning from the exact form (unrelated library warnings
    # may pass through the recorder)
    assert not [w for w in caught if "max_words" in str(w.message)]
