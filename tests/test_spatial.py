"""Spatial grid-radius join tests (operators/spatial.py)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from annotation_service_spark.operators.spatial import (
    grid_radius_join,
    haversine_km,
)


def _hav(a, b):
    la1, lo1 = math.radians(a[0]), math.radians(a[1])
    la2, lo2 = math.radians(b[0]), math.radians(b[1])
    x = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(x))


def test_grid_radius_join_vs_bruteforce(spark):
    """Grid-blocked radius self-join against an all-pairs python brute
    force: seeded uniform points plus planted adversarial pairs —
    across the antimeridian seam, at the high-latitude edge of the
    cell cover, and just inside/outside the radius boundary."""
    rng = random.Random(4)
    pts = [(i, rng.uniform(-60, 60), rng.uniform(-180, 180)) for i in range(250)]
    pts += [
        (1000, 10.0, 179.95),
        (1001, 10.0, -179.95),  # ~11 km apart, across the seam
        (1002, 59.0, 100.0),
        (1003, 59.2, 100.3),    # close pair near max_abs_lat
        (1004, -30.0, 50.0),
        (1005, -30.0, 50.0),    # exact co-location (dist 0)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 500.0
    got = {
        (r.id_l, r.id_r): r.dist_km
        for r in grid_radius_join(df, df, radius)
        .where("id_l < id_r")
        .collect()
    }
    exp = {}
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            d = round(_hav(pts[i][1:], pts[j][1:]), 6)
            if d <= radius:
                exp[(pts[i][0], pts[j][0])] = d
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-6)
    assert (1000, 1001) in got and (1002, 1003) in got
    assert got[(1004, 1005)] == 0.0


def test_grid_radius_join_two_sided_and_suffixes(spark):
    """Left/right are independent tables; output carries suffixed
    columns from both plus dist_km; every returned pair is within the
    radius and every in-radius pair is returned."""
    left = spark.createDataFrame(
        [(1, 48.8, 2.3, "paris"), (2, 40.7, -74.0, "nyc")],
        "id long, lat double, lon double, name string",
    )
    right = spark.createDataFrame(
        [(10, 51.5, -0.1, "london"), (11, 41.0, -73.0, "stamford")],
        "id long, lat double, lon double, name string",
    )
    out = grid_radius_join(left, right, 400.0).collect()
    pairs = {(r.name_l, r.name_r): r.dist_km for r in out}
    assert set(pairs) == {("paris", "london"), ("nyc", "stamford")}
    assert pairs[("paris", "london")] == pytest.approx(
        _hav((48.8, 2.3), (51.5, -0.1)), abs=1e-5
    )


def test_grid_radius_join_polar_guard(spark):
    """A latitude beyond max_abs_lat must RAISE loudly (the longitude
    cell cover breaks there), not silently miss pairs."""
    df = spark.createDataFrame(
        [(1, 80.0, 0.0), (2, 80.0, 10.0)], "id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="polar|max_abs_lat"):
        grid_radius_join(df, df, 100.0).collect()
    # and the same rows pass with a raised bound
    ok = grid_radius_join(df, df, 300.0, max_abs_lat=81.0).where(
        "id_l < id_r"
    ).collect()
    assert len(ok) == 1  # ~193 km apart at lat 80


def test_grid_radius_join_wrap_overlap_guard(spark):
    """d_lon > 120 deg (fewer than 3 lon cells around the globe) must
    RAISE at plan time: an antimeridian-shifted replica's 3x3 cells
    would overlap the home replica's and emit duplicate pairs. Both
    routes into the regime are covered — huge radius at the default
    bound, and moderate radius at a high max_abs_lat."""
    df = spark.createDataFrame(
        [(1, 10.0, 179.9), (2, 10.0, -179.9)], "id long, lat double, lon double"
    )
    with pytest.raises(ValueError, match="120|antimeridian"):
        grid_radius_join(df, df, 5400.0)  # d_lon ~122 deg at lat 66
    with pytest.raises(ValueError, match="120|antimeridian"):
        grid_radius_join(df, df, 2400.0, max_abs_lat=80.0)  # ~127 deg


def test_grid_radius_join_exactly_once_near_wrap_limit(spark):
    """Just inside the 120-deg guard (radius 5200 km -> d_lon ~118.6
    deg) each pair still meets on exactly ONE cell key: seam-straddling
    and same-side points all emit once, and the pair set matches the
    all-pairs brute force."""
    pts = [
        (1, 10.0, 179.5),
        (2, 10.0, -179.5),  # across the seam
        (3, 0.0, 0.0),
        (4, 30.0, 40.0),
        (5, -20.0, -120.0),
        (6, 12.0, 170.0),
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    radius = 5200.0
    rows = grid_radius_join(df, df, radius).where("id_l < id_r").collect()
    got = {}
    for r in rows:
        assert (r.id_l, r.id_r) not in got, "duplicate pair emitted"
        got[(r.id_l, r.id_r)] = r.dist_km
    exp = {
        (a[0], b[0]): round(_hav(a[1:], b[1:]), 6)
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if round(_hav(a[1:], b[1:]), 6) <= radius
    }
    assert got == {k: pytest.approx(v, abs=1e-6) for k, v in exp.items()}
    assert (1, 2) in got  # the seam pair survived


def test_grid_knn_join_vs_bruteforce(spark):
    """k-NN assignment against python brute force: every left point
    gets its k nearest in-radius rights in (dist, id) order; points
    with nothing in radius are absent; co-located rights tie-break by
    id deterministically."""
    from annotation_service_spark.operators.spatial import grid_knn_join

    rng = random.Random(12)
    lefts = [(i, rng.uniform(-55, 55), rng.uniform(-175, 175)) for i in range(60)]
    rights = [(100 + j, rng.uniform(-55, 55), rng.uniform(-175, 175)) for j in range(25)]
    # co-located pair of rights near left 0 for the tie-break
    rights += [(900, lefts[0][1], lefts[0][2]), (901, lefts[0][1], lefts[0][2])]
    ldf = spark.createDataFrame(lefts, "id long, lat double, lon double")
    rdf = spark.createDataFrame(rights, "id long, lat double, lon double")
    out = grid_knn_join(ldf, rdf, k=2, radius_km=2000.0).collect()
    got = {}
    for r in out:
        got.setdefault(r.id_l, []).append((r.knn_rank, r.id_r, r.dist_km))
    exp = {}
    for li, la, lo in lefts:
        cands = sorted(
            (round(_hav((la, lo), (rl, rlon)), 6), rid)
            for rid, rl, rlon in rights
            if _hav((la, lo), (rl, rlon)) <= 2000.0
        )
        if cands:
            exp[li] = [(n + 1, rid, d) for n, (d, rid) in enumerate(cands[:2])]
    assert set(got) == set(exp)
    for li in exp:
        assert sorted(got[li]) == exp[li], f"left {li}"
    # the co-located tie: 900 before 901
    first = [t for t in got[lefts[0][0]] if t[0] == 1][0]
    assert first[1] == 900 and first[2] == 0.0
