"""Invariants of the gate-registry driver window (VERDICT r10 items 1/8).

The correctness driver hash-verifies the FIRST ``DRIVER_WINDOW`` entries of
``queries()``.  Round 10's hand-maintained boundary comment drifted 8
positions and hid 8 stale gates from the intended rotation; the registry now
builds from an explicit window/backlog split with asserts, and this test
pins the r11 rotation contents so a future edit that displaces the boundary
(or drops a stale gate from the window) fails loudly.

No SparkSession needed — this is pure registry introspection.
"""

import __spark_entry__ as em

# The 25 gates whose newest driver evidence was round 7 (recomputed from
# CORRECTNESS_r01..r10 — the full list from VERDICT r10 item 1, not the
# round-10 notes' truncated 17+6).
R7_STALE = {
    "kmeans_fixed", "knn_pagerank_lsh", "mom_revenue", "multimodal_pipeline",
    "native_pivot", "ntile_deciles", "perceptron_filter", "pmi_collocations",
    "price_ranks", "robust_outliers", "session_rollup", "source_kl",
    "stats_agg", "stream_dedup_exact", "stream_rollup", "tpch_q2", "tpch_q4",
    "tpch_q7", "tpch_q11", "tpch_q12", "tpch_q15", "tpch_q16", "tpch_q17",
    "tpch_q22", "zorder_layout",
}

# Gates whose implementing source round-11 code changes touch (spatial
# antimeridian guard, fingerprint-family cache lifecycle, eval-report
# unpersists) — these must be re-verified by the r11 driver run.
R11_TOUCHED = {
    "geo_radius_join", "annotate_nearest_site", "dedup_simhash",
    "dedup_weighted_minhash", "dedup_eval_report",
}


def test_window_size_and_boundary():
    q = em.queries()
    names = list(q)
    assert em.DRIVER_WINDOW == 50
    assert len(names) == len(set(names))
    window = set(names[: em.DRIVER_WINDOW])
    assert len(em._window_gates()) == em.DRIVER_WINDOW
    assert set(em._window_gates()) == window


# Operators introduced in round 11 — never driver-verified before, so
# they lead the window.
R11_NEW = {
    "shared_passages", "span_dedup_keep_first", "token_budget_sample",
    "dedup_eval_weighted",
}


def test_r11_rotation_contents():
    window = set(list(em.queries())[: em.DRIVER_WINDOW])
    missing_stale = R7_STALE - window
    assert not missing_stale, f"r7-stale gates outside the window: {missing_stale}"
    missing_touched = R11_TOUCHED - window
    assert not missing_touched, f"r11-touched gates outside the window: {missing_touched}"
    assert R11_NEW <= window


def test_every_gate_has_an_oracle_or_is_documented():
    q, o = em.queries(), em.oracle_sql()
    # the registry currently keeps full oracle coverage; if a genuinely
    # non-SQL-expressible gate is ever added without one, list it here.
    allowed_no_oracle = set()
    missing = [k for k in q if k not in o and k not in allowed_no_oracle]
    assert not missing, f"gates without oracle SQL: {missing}"


def test_window_and_backlog_disjoint_and_complete():
    w, b = em._window_gates(), em._backlog_gates()
    assert not (w.keys() & b.keys())
    assert len(w) + len(b) == len(em.queries())
