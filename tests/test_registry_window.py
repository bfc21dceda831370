"""Invariants of the gate-registry driver window (VERDICT r10 items 1/8,
r11 items 1/9, r12 item 1).

The correctness driver hash-verifies the FIRST ``DRIVER_WINDOW`` entries of
``queries()``.  Round 10's hand-maintained boundary comment drifted 8
positions and hid 8 stale gates from the intended rotation; the registry now
builds from an explicit window/backlog split with asserts, this test pins
each round's rotation contents, and the staleness invariant recomputes gate
freshness from the CORRECTNESS_r*.json artifacts themselves. Re-stated
TIME-STABLY in r13 (VERDICT r12 item 1): instead of "the global-oldest
cohort must be in the window" (which went red the moment each round's
artifact dropped), the invariant is now "no gate's newest evidence may be
older than latest_round - 3" — with a 50-gate window over a ~170-gate
registry, four windows cover everything, so a correctly-rotated registry is
green BOTH before and after the round's artifact lands.

No SparkSession needed — this is pure registry/artifact introspection.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as em

REPO = pathlib.Path(__file__).resolve().parent.parent

# How many rounds a gate's driver evidence may trail the newest artifact.
# 50-gate window, ~170 gates: ceil(170/50) = 4 windows cover the registry,
# so a straight oldest-first rotation keeps every gate within 3 rounds.
MAX_EVIDENCE_AGE_ROUNDS = 3

# The full 33-gate cohort whose newest driver evidence was round 9
# (recomputed from CORRECTNESS_r01..r12 — the list from VERDICT r12 item 1).
R9_STALE = {
    "anti_join", "attribution_join", "bigram_nll", "bm25_rank",
    "case_pivot", "cms_counts", "cohort_retention", "corpus_diff",
    "dedup_incremental", "distinct_users", "doc_chunks", "doc_percentiles",
    "embedding_gram", "event_cube", "event_rollup", "event_rollup_hopping",
    "event_topk_windowed", "first_touch", "funnel", "gap_fill",
    "group_split", "grouping_sets", "having_subquery", "incremental_rollup",
    "json_extract", "knn_pagerank", "linear_interp", "pii_redact",
    "quality_quantile_mix", "rolling_avg", "span_dedup", "span_dedup_apply",
    "upsert_merge",
}

# Gates whose implementing source round-13 code changes touch (blank-line
# exclusion + broadcast keep-first shape in curation.py, URL
# percent-encoding normalization + parameterized tracker list in url.py,
# TTL plumbing in streaming_hot_lines) — these must be re-verified by the
# r13 driver run.
R13_TOUCHED = {
    "boilerplate_lines", "line_dedup_keep_first", "url_dedup",
    "stream_url_dedup", "web_pipeline", "stream_hot_lines",
}

# Operators introduced in round 13 — never driver-verified before, so
# they lead the window.
R13_NEW = {
    "web_pipeline_full", "url_host_filter",
    "html_extract", "html_links", "html_pipeline",
    "robots_filter", "sentence_dedup", "stream_sentence_dedup",
    "kn_nll", "badword_filter",
}


def test_window_size_and_boundary():
    q = em.queries()
    names = list(q)
    assert em.DRIVER_WINDOW == 50
    assert len(names) == len(set(names))
    window = set(names[: em.DRIVER_WINDOW])
    assert len(em._window_gates()) == em.DRIVER_WINDOW
    assert set(em._window_gates()) == window


def test_r13_rotation_contents():
    window = set(list(em.queries())[: em.DRIVER_WINDOW])
    missing_stale = R9_STALE - window
    assert not missing_stale, f"r9-stale gates outside the window: {missing_stale}"
    missing_touched = R13_TOUCHED - window
    assert not missing_touched, f"r13-touched gates outside the window: {missing_touched}"
    assert R13_NEW <= window


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


def _freshness() -> dict[str, int]:
    """Newest round with a hash-green driver row, per gate, recomputed
    from the CORRECTNESS_r*.json artifacts in the repo root."""
    newest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(path.stem.split("_r")[1])
        rows = json.loads(path.read_text())
        for gate, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                newest[gate] = max(newest.get(gate, 0), rnd)
    return newest


def test_no_gate_evidence_older_than_rotation_horizon():
    """The time-stable staleness invariant (VERDICT r12 item 1): every
    gate must either sit in the CURRENT window (it is being
    re-verified this round) or carry driver evidence no older than
    latest_round - MAX_EVIDENCE_AGE_ROUNDS.  Unlike the r12 "global
    oldest cohort" form, this stays green when the round's own
    artifact drops: the window gates are exempt by construction, and
    a straight oldest-first rotation keeps the backlog inside the
    horizon."""
    newest = _freshness()
    if not newest:  # fresh clone without artifacts — nothing to check
        return
    latest = max(newest.values())
    horizon = latest - MAX_EVIDENCE_AGE_ROUNDS
    window = set(em._window_gates())
    gates = set(em.queries())
    # gates with NO driver evidence at all (newly added) must be queued
    # for verification, i.e. inside the window
    never_verified = gates - set(newest)
    stranded_new = never_verified - window
    assert not stranded_new, (
        f"gates with no driver evidence outside the window: {stranded_new}"
    )
    too_old = {
        g: r
        for g, r in newest.items()
        if g in gates and g not in window and r < horizon
    }
    assert not too_old, (
        f"gates whose newest evidence (value) trails r{latest} by more "
        f"than {MAX_EVIDENCE_AGE_ROUNDS} rounds and are not queued in the "
        f"current window: {dict(sorted(too_old.items()))}"
    )
