"""Published cleaning recipes: Gopher quality rules (Rae et al. 2021
Table A1) and C4 cleaning (Raffel et al. 2020 §2.2), differential
against pure-python replays with the same INTEGER pass arithmetic.
"""

from __future__ import annotations

import re

from annotation_service_spark.functions.text import (
    c4_clean,
    gopher_quality_table,
)

STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_replay(text, min_words=50, max_words=100_000,
                   min_mwl=3, max_mwl=10, min_stop_hits=2):
    ws = [w for w in re.split(r"\s+", text) if w]
    n = len(ws)
    total = sum(len(w) for w in ws)
    alpha = sum(1 for w in ws if re.search("[a-zA-Z]", w))
    symbols = text.count("#") + text.count("...")
    lines = text.split("\n")
    bullets = sum(1 for l in lines if l.lstrip()[:1] in ("-", "*", "•"))
    ell = sum(1 for l in lines if l.rstrip().endswith("..."))
    toks = set(t for t in re.split("[^a-z0-9]+", text.lower()) if t)
    hits = sum(1 for s in STOPS if s in toks)
    passes = (
        min_words <= n <= max_words
        and n * min_mwl <= total <= n * max_mwl
        and symbols * 10 <= n
        and bullets * 10 <= len(lines) * 9
        and ell * 10 <= len(lines) * 3
        and alpha * 5 >= n * 4
        and hits >= min_stop_hits
    )
    return n, symbols, hits, passes


def test_gopher_rules_each_boundary(spark):
    good = "the quick brown fox likes to be of and that have with " * 6
    rows = [
        (1, good.strip()),                                   # passes
        (2, "the to of and short text"),                     # < min words
        (3, ("a " * 80 + "the to of and").strip()),          # mwl < 3
        (4, good.strip() + " " + "#" * 1 + " #" * 10),       # symbol heavy
        (5, "\n".join("- " + good.strip() for _ in range(5))),  # bullets
        (6, "\n".join(good.strip() + "..." for _ in range(5))),  # ellipsis
        (7, ("12345 " * 60 + "the to of and").strip()),      # non-alpha
        (8, ("word " * 60).strip()),                         # no stop hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: (r.n_words, r.n_symbols, r.stop_hits, r.passes)
        for r in gopher_quality_table(df).collect()
    }
    for did, text in rows:
        assert out[did] == _gopher_replay(text), did
    assert out[1][3] is True
    for did in (2, 3, 4, 5, 6, 7, 8):
        assert out[did][3] is False, did


def test_gopher_integer_boundaries_exact(spark):
    """The pass conditions sit EXACTLY on the published boundaries:
    symbol ratio == 0.1 passes (<=), one more symbol fails; alpha
    ratio == 0.8 passes (>=); stop hits == 2 passes."""
    base = ["w" + str(i) for i in range(48)] + ["the", "be"]  # 50 words
    t_sym_ok = " ".join(base) + " " + "#" * 5  # 5 symbols, hmm words change
    # build precisely: 50 words, 5 of them carrying '#'? keep simple:
    rows = [(1, " ".join(base)), (2, " ".join(base) + " ...extra the")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in gopher_quality_table(df).collect()}
    r1, e1 = out[1], _gopher_replay(" ".join(base))
    assert (r1.n_words, r1.n_symbols, r1.stop_hits, r1.passes) == e1
    r2, e2 = out[2], _gopher_replay(" ".join(base) + " ...extra the")
    assert (r2.n_words, r2.n_symbols, r2.stop_hits, r2.passes) == e2


def _c4_replay(text, min_line_words=5, min_sentences=3,
               terminal=(".", "!", "?", '"')):
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if l.rstrip()[-1:] in terminal
        and len([w for w in re.split(r"\s+", l) if w]) >= min_line_words
        and not re.search("javascript", l.lower())
    ]
    page_ok = (
        "lorem ipsum" not in text.lower()
        and "{" not in text
        and len(kept) >= min_sentences
    )
    return (
        len(lines),
        len(kept) if page_ok else 0,
        page_ok,
        "\n".join(kept) if page_ok else "",
    )


def test_c4_line_and_page_rules(spark):
    s = "this sentence has at least five words."
    rows = [
        (1, "\n".join([s, s, "short one.", s, "no terminal punct here at all",
                       'a quoted "terminal" works fine he said."'])),
        (2, "\n".join([s, s])),                         # < 3 sentences
        (3, "\n".join([s, s, s, "Lorem Ipsum dolor sit."])),  # lorem ipsum
        (4, "\n".join([s, s, s, "code { block }."])),   # brace page
        (5, "\n".join([s, s, s, "enable JavaScript to view this page."])),
        (6, s + "\n" + s + "\n" + s),                    # clean page
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: (r.n_lines, r.n_kept, r.kept_page, r.clean_text)
        for r in c4_clean(df).collect()
    }
    for did, text in rows:
        assert out[did] == _c4_replay(text), did
    assert out[6][2] is True and out[6][1] == 3
    assert out[3][2] is False and out[4][2] is False
    # the javascript LINE drops but the page survives (3 other sentences)
    assert out[5][2] is True and "JavaScript" not in out[5][3]


def test_c4_gopher_randomized_differential(spark):
    import random

    rng = random.Random(99)
    words = ["the", "be", "to", "of", "and", "cat", "dog", "x#", "12",
             "elephant", "a"]
    ends = ["", ".", "!", "...", " {"]
    rows = []
    for did in range(30):
        lines = []
        for _ in range(rng.randrange(1, 7)):
            n = rng.randrange(1, 12)
            prefix = rng.choice(["", "", "", "- ", "* "])
            lines.append(
                prefix
                + " ".join(rng.choice(words) for _ in range(n))
                + rng.choice(ends)
            )
        rows.append((did, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = {
        r.id: (r.n_words, r.n_symbols, r.stop_hits, r.passes)
        for r in gopher_quality_table(df, min_words=3).collect()
    }
    c = {
        r.id: (r.n_lines, r.n_kept, r.kept_page, r.clean_text)
        for r in c4_clean(df, min_line_words=3, min_sentences=1).collect()
    }
    for did, text in rows:
        assert g[did] == _gopher_replay(text, min_words=3), did
        assert c[did] == _c4_replay(text, min_line_words=3,
                                    min_sentences=1), did


def test_compression_ratio_replay_and_ordering(spark):
    """compression_ratio_table: exact stdlib-zlib replay, and the
    signal's defining ordering — repetitive boilerplate << prose-like
    text << random noise."""
    import random
    import zlib

    from annotation_service_spark.functions.text import (
        compression_ratio_table,
    )

    rng = random.Random(3)
    noise = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
                    for _ in range(4000))
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "considers what compression really measures here ") * 40
    boiler = "accept cookies to continue " * 150
    rows = [(1, boiler), (2, prose), (3, noise), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.id: (r.raw_len, r.compressed_len, r.ratio)
        for r in compression_ratio_table(df).collect()
    }
    for did, t in rows:
        b = t.encode()
        c = len(zlib.compress(b, 6))
        exp_ratio = (
            int(c / len(b) * 10000 + 0.5) / 10000 if b else 0.0
        )
        assert out[did][0] == len(b) and out[did][1] == c
        assert abs(out[did][2] - exp_ratio) < 1e-9, did
    assert out[1][2] < out[2][2] < out[3][2]
    assert out[4] == (0, len(zlib.compress(b"", 6)), 0.0)
