"""Invariants of the gate-registry driver window (VERDICT r10 items 1/8,
r11 items 1/9).

The correctness driver hash-verifies the FIRST ``DRIVER_WINDOW`` entries of
``queries()``.  Round 10's hand-maintained boundary comment drifted 8
positions and hid 8 stale gates from the intended rotation; the registry now
builds from an explicit window/backlog split with asserts, this test pins
each round's rotation contents, and — new in r12 — the staleness invariant
recomputes gate freshness from the CORRECTNESS_r*.json artifacts themselves,
so "the oldest-evidence cohort is in the window" is a pytest instead of a
per-round judge recomputation.

No SparkSession needed — this is pure registry/artifact introspection.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as em

REPO = pathlib.Path(__file__).resolve().parent.parent

# The 22 gates whose newest driver evidence was round 8 (recomputed from
# CORRECTNESS_r01..r11 — the full list from VERDICT r11 item 1).
R8_STALE = {
    "lpa_communities", "merge_annotators", "pack_chunks", "range_lookup",
    "repetition_filter", "response_keys", "sessionize", "skew_agg",
    "skew_join", "stratified_sample", "text_metrics", "topk_per_group",
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q10", "tpch_q13",
    "tpch_q20", "tpch_q21", "triangle_count", "vocab_topk",
}

# Gates whose implementing source round-12 code changes touch (MP4 demux
# + id-typed frames table, scoped-cache sameResult reuse, minhash
# num_hashes guard, passage cap-split merge, token-budget collect guard)
# — these must be re-verified by the r12 driver run.
R12_TOUCHED = {
    "token_budget_sample", "shared_passages", "multimodal_pipeline",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_weighted_minhash",
    "dedup_eval_report", "dedup_eval_weighted",
}

# Operators introduced in round 12 — never driver-verified before, so
# they lead the window.
R12_NEW = {
    "token_budget_sample_tokens", "boilerplate_lines",
    "line_dedup_keep_first", "stream_hot_lines",
    "gopher_quality", "c4_filter", "url_dedup", "length_buckets",
    "web_pipeline", "stream_url_dedup",
}


def test_window_size_and_boundary():
    q = em.queries()
    names = list(q)
    assert em.DRIVER_WINDOW == 50
    assert len(names) == len(set(names))
    window = set(names[: em.DRIVER_WINDOW])
    assert len(em._window_gates()) == em.DRIVER_WINDOW
    assert set(em._window_gates()) == window


def test_r12_rotation_contents():
    window = set(list(em.queries())[: em.DRIVER_WINDOW])
    missing_stale = R8_STALE - window
    assert not missing_stale, f"r8-stale gates outside the window: {missing_stale}"
    missing_touched = R12_TOUCHED - window
    assert not missing_touched, f"r12-touched gates outside the window: {missing_touched}"
    assert R12_NEW <= window


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


def test_window_covers_oldest_evidence_cohort():
    """VERDICT r11 item 9: the per-round rotation recomputation as an
    invariant.  Every gate whose newest driver evidence is the GLOBAL
    oldest round must be inside the current window, and every gate
    with NO driver evidence at all (newly added) must be too — so a
    rotation that strands the stalest cohort fails every pytest run,
    not just the next judge pass."""
    newest = _freshness()
    if not newest:  # fresh clone without artifacts — nothing to check
        return
    window = set(em._window_gates())
    gates = set(em.queries())
    never_verified = gates - set(newest)
    stranded_new = never_verified - window
    assert not stranded_new, (
        f"gates with no driver evidence outside the window: {stranded_new}"
    )
    evidenced = {g: r for g, r in newest.items() if g in gates}
    oldest = min(evidenced.values())
    cohort = {g for g, r in evidenced.items() if r == oldest}
    stranded = cohort - window
    assert not stranded, (
        f"oldest-evidence (r{oldest}) gates outside the window: {stranded}"
    )
