"""profile_table (column profiling) and normalize_text_table (NFC +
whitespace canonicalization). Value parity with DuckDB is
driver-gated (`profile_table`, `text_normalize`); these cover the
semantics the oracle can't see — planted Unicode and null behavior —
plus plan-shape checks."""

from __future__ import annotations

import hashlib
import unicodedata

from pyspark.sql import functions as F

import __spark_entry__ as em
from annotation_service_spark.functions.text import normalize_text_table
from annotation_service_spark.operators.profile import profile_table

SF = "/root/testdata/sf0.001"


def test_profile_counts_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (None, "b", 2.5)],
        "k long, s string, v double",
    )
    rows = {r.column_name: r for r in profile_table(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["k"].n_nulls == 1 and rows["k"].n_distinct == 3
    assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 2
    assert rows["v"].n_nulls == 1 and rows["v"].n_distinct == 2
    assert rows["s"].min_value == "a" and rows["s"].max_value == "b"
    assert rows["v"].min_value == "1.5"


def test_profile_single_pass_no_join(spark):
    """The profile must be BOUNDED aggregation passes over the table
    — no per-column scans, and (r13) no sort of the Expand-multiplied
    stream: the exact mode splits into a hash-friendly distinct pass
    plus a grouping-free min/max pass glued by a 1-row cross join,
    because string min/max buffers in the combined pass forced
    SortAggregate over |rows|×(n_cols+1) Expand output (measured 2
    Sorts, ~3.5 s on a 2.6 MB table)."""
    out = profile_table(em._t(spark, SF, "orders"))
    p = out._jdf.queryExecution().executedPlan().toString()
    # the only join is the 1-row × 1-row cross glue — never a keyed
    # self-join of the table
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # two bounded passes, not one per column
    assert p.count("orders.parquet") <= 2
    # the Expand stream must aggregate hash-side — no sorted
    # aggregation of the multiplied rows
    assert "Sort " not in p, p


def test_profile_approx_mode_avoids_expand(spark):
    exact = profile_table(em._t(spark, SF, "orders"), approx=False)
    approx = profile_table(em._t(spark, SF, "orders"), approx=True)
    p_exact = exact._jdf.queryExecution().executedPlan().toString()
    p_approx = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in p_exact  # the documented cost of exact distincts
    assert "Expand" not in p_approx


def test_normalize_nfc_and_whitespace(spark):
    decomposed = "Café  du\tMonde\n"  # e + combining acute
    composed = unicodedata.normalize("NFC", decomposed)
    assert composed != decomposed  # the fixture genuinely decomposes
    df = spark.createDataFrame([(1, decomposed), (2, "  x  y  ")],
                               "doc_id long, text string")
    rows = {r.id: r for r in normalize_text_table(df).collect()}
    want1 = "Café du Monde"
    assert rows[1].norm_len == len(want1)
    assert rows[1].norm_md5 == hashlib.md5(want1.encode()).hexdigest()
    assert rows[2].norm_md5 == hashlib.md5(b"x y").hexdigest()


def test_normalize_null_text_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = normalize_text_table(df).collect()[0]
    assert r.norm_len is None and r.norm_md5 is None


def test_registered_in_contract():
    for name in ("profile_table", "text_normalize"):
        assert name in em.queries()
        assert name in em.oracle_sql()


def test_table_diff_hand_case(spark):
    from annotation_service_spark.operators.profile import table_diff

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, t string"
    )
    b = spark.createDataFrame(
        [(2, "y"), (3, "Z"), (4, "w")], "id long, t string"
    )
    got = {r.id: r.status for r in table_diff(a, b, "id", ["t"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}


def test_table_diff_multi_column_and_separator_safety(spark):
    """The \\x1f separator keeps ('ab','c') distinct from ('a','bc');
    a change in ANY compare column flags the row."""
    from annotation_service_spark.operators.profile import table_diff

    a = spark.createDataFrame(
        [(1, "ab", "c"), (2, "q", "r")], "id long, u string, v string"
    )
    b = spark.createDataFrame(
        [(1, "a", "bc"), (2, "q", "r")], "id long, u string, v string"
    )
    got = {
        r.id: r.status
        for r in table_diff(a, b, "id", ["u", "v"]).collect()
    }
    assert got == {1: "changed"}


def test_corpus_diff_registered():
    import __spark_entry__ as em

    assert "corpus_diff" in em.queries()
    assert "corpus_diff" in em.oracle_sql()


def test_table_digest_order_and_partition_invariant(spark):
    """The digest must be identical under row reordering and
    different partitionings, and differ when any row changes."""
    from annotation_service_spark.operators.profile import table_digest

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "id long, t string"
    )
    shuffled = (
        spark.createDataFrame([(3, "z"), (1, "x"), (2, "y")], "id long, t string")
        .repartition(7)
    )
    d1 = table_digest(a, ["id", "t"]).collect()[0]
    d2 = table_digest(shuffled, ["id", "t"]).collect()[0]
    assert (d1.digest, d1.n_rows) == (d2.digest, d2.n_rows)
    mut = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "Z")], "id long, t string"
    )
    assert table_digest(mut, ["id", "t"]).collect()[0].digest != d1.digest


def test_table_digest_registered():
    import __spark_entry__ as em

    assert "table_digest" in em.queries()
    assert "table_digest" in em.oracle_sql()
