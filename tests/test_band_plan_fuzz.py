"""Pure-python tests: LSH band planning + perceptual-hash fuzzing.

No spark fixture — these run JVM-free.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from annotation_service_spark.operators.dedup import lsh_band_plan
from annotation_service_spark.operators.multimodal import afp63, phash63


def _curve(b: int, r: int, j: float) -> float:
    return 1 - (1 - j**r) ** b


def test_lsh_band_plan_crossing_and_sharpness():
    """The planned (b, r) puts the S-curve's 50% point within ~0.03
    of the target and the curve is genuinely sharp: well below 50%
    at t-0.15, well above at t+0.15. The fixed-16 factorization of
    t=0.5 must reproduce the shipped 16/8 default family."""
    for t in (0.3, 0.5, 0.7, 0.8, 0.9):
        b, r = lsh_band_plan(t)
        cross = (1.0 / b) ** (1.0 / r)
        assert abs(cross - t) <= 0.03, (t, b, r)
        assert _curve(b, r, max(0.01, t - 0.15)) < 0.45, (t, b, r)
        assert _curve(b, r, min(0.99, t + 0.15)) > 0.8, (t, b, r)
    assert lsh_band_plan(0.5, num_hashes=16) == (8, 2)  # the shipped default
    with pytest.raises(ValueError):
        lsh_band_plan(0.99)
    with pytest.raises(ValueError):
        lsh_band_plan(0.5, max_hashes=3)


def test_lsh_band_plan_fixed_budget_degenerate_raises():
    """The fixed-num_hashes branch must never hand back a degenerate
    factorization: a prime budget only factors as (1,n)/(n,1) — r=1 is
    linear (never sharp) and b=1 is no banding — so it raises with a
    pick-a-composite hint instead of silently returning a flat curve
    (ADVICE r10). A composite budget whose best crossing is >0.25 from
    the target raises too, matching the free search's tolerance
    contract."""
    for prime in (13, 17, 31):
        with pytest.raises(ValueError, match="composite"):
            lsh_band_plan(0.5, num_hashes=prime)
    with pytest.raises(ValueError, match="composite"):
        lsh_band_plan(0.5, num_hashes=2)
    # composite but hopeless: 4 = 2x2 only, crossing 0.707 vs t=0.3
    with pytest.raises(ValueError, match="0.25"):
        lsh_band_plan(0.3, num_hashes=4)
    # composite and reachable budgets still resolve to real plans
    b, r = lsh_band_plan(0.8, num_hashes=64)
    assert b >= 2 and r >= 2 and b * r == 64
    assert abs((1.0 / b) ** (1.0 / r) - 0.8) <= 0.25


def test_phash_fuzz_corrupt_payload_paths():
    """phash63/afp63 over adversarial arrays: extreme shapes and
    degenerate content must return well-formed 63-bit ints or raise
    cleanly — never hang, never emit out-of-range values."""
    rng = np.random.RandomState(3)
    shapes = [(1, 1, 3), (1, 500, 3), (500, 1, 3), (7, 7), (64, 64, 3)]
    for shp in shapes:
        img = rng.randint(0, 256, shp).astype(np.uint8)
        h = phash63(img)
        assert 0 <= h < 1 << 63
    # constant image: all-equal DCT AC coefficients -> deterministic
    flat = np.full((16, 16, 3), 128, dtype=np.uint8)
    assert phash63(flat) == phash63(flat)


def test_afp_fuzz_degenerate_audio():
    """afp63 over silence, DC offset, impulse, and tiny inputs."""
    assert 0 <= afp63(np.zeros(1000)) < 1 << 63          # silence
    assert 0 <= afp63(np.ones(1000) * 0.7) < 1 << 63     # DC
    imp = np.zeros(1000)
    imp[0] = 1.0
    assert 0 <= afp63(imp) < 1 << 63                     # impulse
    with pytest.raises(ValueError):
        afp63(np.zeros(8))                               # too short
    # determinism under dtype variation
    x = np.random.RandomState(1).randn(2000)
    assert afp63(x) == afp63(x.astype(np.float32).astype(np.float64))


def test_minhash_lsh_auto_band_wiring(spark):
    """bands=None routes through lsh_band_plan: at t=0.5 with the
    16-hash budget the planned factorization IS the shipped (8, 2)
    default, so the auto-planned pair set is identical to the
    default call; free search (num_hashes=None too) yields a valid
    deeper plan that still finds the planted near-dup."""
    from annotation_service_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog and keeps running today"
    rows = [(1, base), (2, base.replace("lazy", "sleepy")),
            (3, "completely different words in this unrelated document here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    default = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
    auto = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, num_hashes=16, bands=None).collect()
    }
    assert auto == default and (1, 2) in auto
    free = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(df, num_hashes=None, bands=None).collect()
    }
    assert (1, 2) in free


def test_minhash_lsh_pairs_num_hashes_none_with_bands_raises(spark):
    """ADVICE r11: num_hashes=None is the plan-from-threshold
    signature and only meaningful with bands=None; with bands left at
    its default it used to reach range(None) deep in
    minhash_signatures. It must fail loudly at the API edge."""
    import pytest
    from annotation_service_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="bands=None"):
        minhash_lsh_pairs(df, num_hashes=None)
    with pytest.raises(ValueError, match="bands=None"):
        minhash_lsh_pairs(df, num_hashes=None, bands=4)
