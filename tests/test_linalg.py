"""Distributed linear algebra: Gram matrix partition-invariance and
PCA differential vs a pure-numpy single-node implementation (the
randomized-differential pattern of geolite2v2/geo-ip_test.go:123-203,
with numpy as the oracle)."""

from __future__ import annotations

import numpy as np
import pytest

from annotation_service_spark.operators.linalg import (
    FIXED_SCALE,
    gram_fixed,
    pca_project,
)


def _emb_df(spark, n=300, dim=8, seed=3, parts=7):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim)) @ np.diag(np.linspace(3.0, 0.1, dim))
    rows = [(i, [float(x) for x in m[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(parts), m


def test_gram_fixed_matches_numpy_and_partitioning(spark):
    df, m = _emb_df(spark)
    q = np.floor(m * FIXED_SCALE).astype(np.int64)
    expect = q.T @ q
    for parts in (1, 13):
        got = {
            (r["i"], r["j"]): r["g"]
            for r in gram_fixed(df.repartition(parts)).collect()
        }
        assert len(got) == 8 * 9 // 2
        for (i, j), g in got.items():
            assert g == expect[i - 1, j - 1], (i, j, parts)


def test_pca_project_matches_numpy(spark):
    df, m = _emb_df(spark)
    k = 3
    # numpy oracle, same conventions: covariance (biased), eigh
    # descending, largest-|entry| positive sign
    mu = m.mean(axis=0)
    cov = (m - mu).T @ (m - mu) / len(m)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, ::-1][:, :k].T
    for r in range(k):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    expect = (m - mu) @ comp.T

    got = {r["id"]: np.array(r["proj"]) for r in pca_project(df, k=k).collect()}
    assert len(got) == len(m)
    for i in range(len(m)):
        assert np.allclose(got[i], expect[i], atol=1e-8), i
    # variance ordering: projected variance decreasing across dims
    p = np.stack([got[i] for i in range(len(m))])
    v = p.var(axis=0)
    assert v[0] > v[1] > v[2]
    # components capture the top of the spectrum
    assert v[0] == pytest.approx(vals[-1], rel=1e-6)
