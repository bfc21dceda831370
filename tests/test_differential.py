"""Randomized differential tests — the reference's pattern
(geolite2v2/geo-ip_test.go:123-203: 10k random IPs, binary search vs
linear scan must agree), applied across our operator implementations.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from annotation_service_spark.functions import ip as ipf
from annotation_service_spark.operators import interval as iv


def test_range_join_binary_vs_sql_oracle(spark):
    """10k random probes (in-range, gaps, exact boundaries) through
    the broadcast binary-search join must agree with a plain SQL
    BETWEEN join over the same ranges."""
    rng = random.Random(1234)
    ranges = []
    lo = 0
    for i in range(500):
        lo += rng.randrange(1, 50)
        hi = lo + rng.randrange(0, 40)
        ranges.append((lo, hi, f"p{i}"))
        lo = hi + 1
    rdf = spark.createDataFrame(ranges, "low long, high long, payload string")

    probes = [rng.randrange(0, lo + 100) for _ in range(10000)]
    # force boundary hits: lows, highs, and just-outside values
    for l, h, _ in ranges[::17]:
        probes += [l, h, l - 1, h + 1]
    pdf = spark.createDataFrame([(i, v) for i, v in enumerate(probes)], "id long, v long")

    fast = iv.range_join_broadcast(
        pdf, rdf, probe_col="v", low="low", high="high", payload=["payload"]
    )
    pdf.createOrReplaceTempView("probes_t")
    rdf.createOrReplaceTempView("ranges_t")
    oracle = spark.sql(
        """
        SELECT p.id, p.v, r.payload
        FROM probes_t p LEFT JOIN ranges_t r
          ON p.v BETWEEN r.low AND r.high
        """
    )
    a = sorted((r.id, r.payload) for r in fast.collect())
    b = sorted((r.id, r.payload) for r in oracle.collect())
    assert a == b


def test_range_join_binary_vs_sql_oracle_ipv6_bytes(spark):
    """Same differential on 16-byte binary bounds (mixed v4/v6)."""
    rng = random.Random(99)
    rows = []
    for i in range(200):
        if i % 3:
            base = rng.randrange(0, 2**32 - 4096)
            lo = ipf.py_ip_to_bytes16(
                f"{base >> 24 & 255}.{base >> 16 & 255}.{base >> 8 & 255}.{base & 255}"
            )
        else:
            lo = bytes([0x20, 0x01]) + rng.randbytes(14)
        hi = (int.from_bytes(lo, "big") + rng.randrange(0, 4096)).to_bytes(16, "big")
        rows.append((lo, hi, f"p{i}"))
    # make disjoint by flattening first
    seq_rows = [(i, lo, hi, p) for i, (lo, hi, p) in enumerate(rows)]
    src = spark.createDataFrame(
        seq_rows, "seq long, ip_low binary, ip_high binary, payload string"
    )
    flat = iv.flatten_intervals(src, payload=["payload"], seq="seq").cache()

    probes = []
    flat_rows = flat.collect()
    for i, r in enumerate(flat_rows[::5]):
        probes.append((i * 2, r.ip_low))
        probes.append((i * 2 + 1, r.ip_high))
    probes += [
        (100000 + j, rng.randbytes(16)) for j in range(2000)
    ]
    pdf = spark.createDataFrame(probes, "id long, v binary")

    fast = iv.range_join_broadcast(pdf, flat, probe_col="v", payload=["payload"])
    pdf.createOrReplaceTempView("probes_b")
    flat.createOrReplaceTempView("ranges_b")
    oracle = spark.sql(
        """
        SELECT p.id, r.payload
        FROM probes_b p LEFT JOIN ranges_b r
          ON p.v >= r.ip_low AND p.v <= r.ip_high
        """
    )
    a = sorted((r.id, r.payload) for r in fast.collect())
    b = sorted((r.id, r.payload) for r in oracle.collect())
    assert a == b


@st.composite
def interval_sets(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        lo = draw(st.integers(min_value=0, max_value=400))
        hi = lo + draw(st.integers(min_value=0, max_value=120))
        payload = draw(st.sampled_from(["a", "b", "c"]))
        rows.append((i, lo, hi, payload))
    return rows


class TestFlattenProperties:
    """Property-based invariants of interval flattening (hypothesis),
    checked against brute-force per-point evaluation of the
    later-wins rule."""

    @settings(max_examples=12, deadline=None)
    @given(interval_sets())
    def test_flatten_invariants(self, rows):
        spark = self._spark
        df = spark.createDataFrame(rows, "seq long, low long, high long, payload string")
        out = iv.flatten_intervals(
            df, low="low", high="high", payload=["payload"], seq="seq"
        ).collect()
        got = sorted((r.low, r.high, r.payload) for r in out)

        # brute force: winner at point x = row with max seq covering x
        lo_min = min(r[1] for r in rows)
        hi_max = max(r[2] for r in rows)
        expect_points = {}
        for x in range(lo_min, hi_max + 1):
            best = None
            for seq, lo, hi, p in rows:
                if lo <= x <= hi:
                    best = p  # rows iterated in seq order → last wins
            if best is not None:
                expect_points[x] = best

        # 1) disjoint + sorted
        for (l1, h1, _), (l2, _, _) in zip(got, got[1:]):
            assert l1 <= h1 < l2
        # 2) pointwise equality with the later-wins rule
        got_points = {}
        for lo, hi, p in got:
            for x in range(lo, hi + 1):
                assert x not in got_points
                got_points[x] = p
        assert got_points == expect_points
        # 3) maximal merge: no adjacent equal-payload ranges
        for (l1, h1, p1), (l2, _, p2) in zip(got, got[1:]):
            assert not (h1 + 1 == l2 and p1 == p2)

    @pytest.fixture(autouse=True)
    def _bind_spark(self, spark):
        type(self)._spark = spark


def test_prefix_filter_jaccard_randomized_differential(spark):
    """Randomized differential for the PPJoin-style prefix filter:
    many seeded corpora with heavy shared-vocabulary overlap (pair
    similarities densely straddling each threshold) — the prefix path
    must agree with the plain equi-join form EXACTLY, rows and
    jaccard doubles, at thresholds across the range, uncapped and
    capped. Small vocab + short docs maximizes borderline pairs where
    an off-by-one in the prefix length (the ceil/epsilon math) would
    show as a missed pair."""
    from annotation_service_spark.operators import dedup as dd

    for seed, t, max_df in [
        (7, 0.25, None),
        (11, 0.5, None),
        (13, 0.6, 12),
        (17, 0.85, None),
        (23, 1.0, 8),
    ]:
        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(14)]  # tiny vocab: dense overlap
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 16))))
            for i in range(60)
        ]
        # plant near-dups at graded mutation distances so every
        # threshold has pairs on both sides of its boundary
        for j in range(12):
            base = rows[j][1].split()
            k = j % 4  # 0 = exact dup, 1-3 = increasingly mutated
            mut = base[: max(1, len(base) - k)] + [f"m{j}"] * k
            rows.append((500 + j, " ".join(mut)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        plain = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in dd.ngram_jaccard_pairs(
                df, threshold=t, max_df=max_df
            ).collect()
        )
        pref = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in dd.prefix_filter_jaccard_pairs(
                df, threshold=t, max_df=max_df
            ).collect()
        )
        assert pref == plain, f"seed={seed} t={t} max_df={max_df}"
        # the corpora must actually exercise the boundary: the planted
        # near-dups guarantee pairs at every threshold (exact dups
        # survive even t=1.0)
        assert len(plain) > 0, f"seed={seed}: degenerate corpus, no pairs"
