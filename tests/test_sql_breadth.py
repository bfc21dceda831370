"""Semi/anti/subquery join-class gates (SURVEY §2.3 notes the
reference itself has none — these extend the engine's SQL breadth).

Value-level correctness is driver-gated against DuckDB at sf0.01
(`semi_join`, `anti_join`, `scalar_subquery`, `case_pivot`,
`nation_volume`, `having_subquery` in ``oracle_sql()``); these tests
pin the PHYSICAL properties that make each plan survive scale, plus
cheap semantic invariants at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_semi_join_is_left_semi_no_dedup(spark):
    out = em.q_semi_join(spark, SF)
    p = _plan(out)
    assert "LeftSemi" in p
    # a semi join must not be rewritten as join+distinct
    assert "Deduplicate" not in p
    rows = {r.o_orderpriority: r.n_orders for r in out.collect()}
    orders = em._t(spark, SF, "orders")
    li = em._t(spark, SF, "lineitem")
    # oracle-free invariant: per-priority count never exceeds the
    # priority's total order count, and equals the distinct count of
    # qualifying orderkeys computed the expensive way
    joined = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .where(li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("o_orderpriority", "o_orderkey")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
    )
    expensive = {r.o_orderpriority: r["count"] for r in joined.collect()}
    assert rows == expensive


def test_anti_join_is_left_anti_and_disjoint_from_semi(spark):
    out = em.q_anti_join(spark, SF)
    assert "LeftAnti" in _plan(out)
    got = out.collect()
    cust = em._t(spark, SF, "customer")
    urgent_cust = (
        em._t(spark, SF, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    # anti-join complement check: n_custs(kept) + |rich ∩ urgent| = |rich|
    tot = cust.agg(
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    rich = cust.crossJoin(F.broadcast(tot)).where(
        F.col("c_acctbal").cast("decimal(12,2)") * F.col("n") > F.col("s")
    )
    n_rich = rich.count()
    n_rich_urgent = rich.join(urgent_cust, "c_custkey", "left_semi").count()
    assert sum(r.n_custs for r in got) == n_rich - n_rich_urgent


def test_scalar_subquery_matches_float_formulation(spark):
    """The cross-multiplied integer predicate must select exactly the
    rows the textbook float form (qty < 0.2*avg) selects — quantities
    are integral so no boundary row can sit between the two."""
    out = em.q_scalar_subquery(spark, SF).collect()[0]
    li = em._t(spark, SF, "lineitem")
    stats = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("a"))
    n_float = (
        li.join(stats, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("a"))
        .count()
    )
    assert out.n_rows == n_float
    assert out.total_price > 0


def test_case_pivot_share_bounds(spark):
    rows = em.q_case_pivot(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.promo_share <= 1.0
        assert r.promo_revenue <= r.total_revenue


def test_nation_volume_broadcasts_both_nation_roles(spark):
    out = em.q_nation_volume(spark, SF)
    p = _plan(out)
    # the two nation role-joins must both ride BroadcastExchange
    assert p.count("BroadcastExchange") >= 2
    rows = out.collect()
    for r in rows:
        assert r.supp_nation < r.cust_nation
        assert r.l_year in (1996, 1997)


def test_having_subquery_topn(spark):
    rows = em.q_having_subquery(spark, SF).collect()
    assert len(rows) <= 100
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert all(r.total_qty > 150 for r in rows)


@pytest.mark.parametrize(
    "name",
    [
        "semi_join",
        "anti_join",
        "scalar_subquery",
        "case_pivot",
        "nation_volume",
        "having_subquery",
    ],
)
def test_registered_in_contract(name):
    assert name in em.queries()
    assert name in em.oracle_sql()


def test_set_ops_cohort_invariants(spark):
    """retained_calm ⊆ retained; no calm customer has an urgent
    order; every retained customer has orders in both years."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = em.q_set_ops(spark, sf).collect()
    retained = {r.o_custkey for r in out if r.cohort == "retained"}
    calm = {r.o_custkey for r in out if r.cohort == "retained_calm"}
    assert calm <= retained
    orders = em._t(spark, sf, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("y"),
        "o_orderpriority",
    ).collect()
    by_cust = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for c in retained:
        ys = {r.y for r in by_cust[c]}
        assert {1995, 1996} <= ys
    for c in calm:
        assert all(r.o_orderpriority != "1-URGENT" for r in by_cust[c])


def test_set_ops_registered():
    import __spark_entry__ as em

    assert "set_ops" in em.queries() and "set_ops" in em.oracle_sql()


def test_unpivot_roundtrip_and_shape(spark):
    """Melted output has rows x measures entries; re-pivoting the
    long form recovers the wide values exactly."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    wide_n = em._t(spark, sf, "lineitem").count()
    out = em.q_unpivot_measures(spark, sf)
    assert out.count() == wide_n * 4
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
    # so the roundtrip compares per-key SUMS (melt preserves totals)
    back = (
        out.groupBy("l_orderkey", "l_linenumber")
        .pivot("measure", ["l_quantity", "l_discount"])
        .agg(F.sum("v_milli"))
    )
    orig = (
        em._t(spark, sf, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.sum(
                F.floor(F.col("l_quantity").cast("double") * 1000).cast("long")
            ).alias("q"),
            F.sum(
                F.floor(F.col("l_discount").cast("double") * 1000).cast("long")
            ).alias("d"),
        )
    )
    j = back.join(orig, ["l_orderkey", "l_linenumber"])
    assert (
        j.where(
            (F.col("l_quantity") != F.col("q"))
            | (F.col("l_discount") != F.col("d"))
        ).count()
        == 0
    )


def test_unpivot_registered():
    import __spark_entry__ as em

    assert "unpivot_measures" in em.queries()
    assert "unpivot_measures" in em.oracle_sql()


def test_tpch_q13_histogram_conserves_customers(spark):
    """Q13 shape: the count histogram must conserve the customer
    population (sum of custdist == |customer|) and carry a 0 bucket
    (the outer join keeps order-less customers)."""
    import __spark_entry__ as em

    SF = "/root/testdata/sf0.001"
    rows = em.q_tpch_q13(spark, SF).collect()
    n_cust = em._t(spark, SF, "customer").count()
    assert sum(r.custdist for r in rows) == n_cust
    # brute-force histogram replica (includes the 0 bucket when a
    # customer has no qualifying orders — at this SF all do)
    from collections import Counter
    from pyspark.sql import functions as F

    per = Counter(
        r.c_custkey
        for r in em._t(spark, SF, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select(F.col("o_custkey").alias("c_custkey"))
        .collect()
    )
    custs = [r.c_custkey for r in em._t(spark, SF, "customer").collect()]
    expect = Counter(per.get(c, 0) for c in custs)
    assert {(r.c_count, r.custdist) for r in rows} == set(expect.items())


def test_tpch_q21_sole_offender_semantics(spark):
    """Q21 shape: every reported supplier must, for at least one
    multi-supplier 'F' order, be the ONLY supplier with an 'R' line —
    re-derive one reported pair by brute force and confirm."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    SF = "/root/testdata/sf0.001"
    out = {r.s_name: r.numwait for r in em.q_tpch_q21(spark, SF).collect()}
    assert out and all(v >= 1 for v in out.values())
    # brute-force re-derivation of the full result
    li = em._t(spark, SF, "lineitem")
    orders = em._t(spark, SF, "orders").where(F.col("o_orderstatus") == "F")
    sup = {r.s_suppkey: r.s_name for r in em._t(spark, SF, "supplier").collect()}
    rows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .collect()
    )
    from collections import defaultdict

    supp_by_order = defaultdict(set)
    r_by_order = defaultdict(set)
    for r in rows:
        supp_by_order[r.l_orderkey].add(r.l_suppkey)
        if r.l_returnflag == "R":
            r_by_order[r.l_orderkey].add(r.l_suppkey)
    expect = defaultdict(int)
    for o, supps in supp_by_order.items():
        if len(supps) > 1 and len(r_by_order[o]) == 1:
            expect[sup[next(iter(r_by_order[o]))]] += 1
    assert out == dict(expect)


def test_tpch_q9_registered_and_yearly(spark):
    import __spark_entry__ as em

    SF = "/root/testdata/sf0.001"
    rows = em.q_tpch_q9(spark, SF).collect()
    assert rows and all(1995 <= r.o_year <= 2001 for r in rows)
    for n in ("tpch_q9", "tpch_q13", "tpch_q21"):
        assert n in em.queries() and n in em.oracle_sql()


def test_event_transitions_rows_normalize(spark):
    import __spark_entry__ as em
    from collections import defaultdict

    rows = em.q_event_transitions(spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_cur = defaultdict(float)
    n_by_cur = defaultdict(int)
    for r in rows:
        by_cur[r.cur] += r.p
        n_by_cur[r.cur] += r.n
    # each row distribution sums to ~1 (rounding leaves <= n_types ulps)
    for cur, s in by_cur.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)
    assert "event_transitions" in em.queries()


def test_robust_outliers_planted(spark):
    """Every reported row honors the |z| > 3.5 contract."""
    import __spark_entry__ as em

    rows = em.q_robust_outliers(spark, "/root/testdata/sf0.001").collect()
    # all reported rows honor the contract
    assert all(abs(r.z) > 3.5 for r in rows)
    # and the gate is registered with its oracle
    assert "robust_outliers" in em.oracle_sql()
