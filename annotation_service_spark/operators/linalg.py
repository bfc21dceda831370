"""Distributed linear algebra over embedding columns.

Two primitives an embedding-curation pipeline needs beyond per-pair
similarity (operators/similarity.py): the corpus Gram/covariance
matrix and a PCA projection — dimensionality reduction for cheaper
ANN, whitening, and drift diagnostics.

Design for 100 TB:
- Both are ONE pass over the corpus via mapInPandas: each Arrow
  batch contributes a d×d partial (numpy GEMM), and only the d×d
  partials — thousands of rows, independent of corpus size — ever
  shuffle. This is the classic "normal equations" trick: the data
  never moves, the tiny sufficient statistic does.
- ``gram_fixed`` accumulates in int64 FIXED POINT (floor(x·10^6)),
  so the distributed sum is associative-exact: the result is
  bit-identical regardless of partitioning — and therefore exactly
  checkable against a DuckDB oracle (float sums are reduction-order
  dependent and unverifiable). Magnitudes: |q| ≤ ~10^6, products
  ≤ 10^12, 10^6 rows per partition stays < 10^18 < int64 max.
- ``pca_project`` solves the d×d eigenproblem on the DRIVER (d is
  tens-to-thousands — microseconds) and broadcasts the k×d
  component matrix back into a second mapInPandas GEMM. Sign
  convention: each component's largest-|entry| is made positive, so
  results are deterministic and comparable across engines/runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _vec_dim

FIXED_SCALE = 1_000_000


def gram_fixed(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: int = FIXED_SCALE,
) -> DataFrame:
    """Exact upper-triangle Gram matrix of the fixed-point-quantized
    corpus: G[i,j] = Σ_rows q_i·q_j with q = floor(x·scale) as int64.
    Returns (i, j, g) with 1-based i ≤ j (matching SQL list
    indexing for the oracle)."""
    dim = _vec_dim(embeddings, vec_col)

    def partials(it):
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(m * scale).astype(np.int64)
            acc += q.T @ q
            seen = True
        if seen:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {"i": iu[0] + 1, "j": iu[1] + 1, "g": acc[iu]}
            )

    parts = embeddings.select(vec_col).mapInPandas(partials, "i int, j int, g long")
    return parts.groupBy("i", "j").agg(F.sum("g").cast("long").alias("g"))


def _pca_components(
    embeddings: DataFrame, vec_col: str, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(mean d-vector, k×d components) from one distributed pass:
    float sufficient statistics (Σx, Σxxᵀ, n) via mapInPandas
    partials, covariance + eigh on the driver. Float partials are
    fine here — eigenvectors are insensitive to ulp-level sum
    differences at the tolerance PCA is used for."""
    dim = _vec_dim(embeddings, vec_col)

    def partials(it):
        s = np.zeros(dim)
        ss = np.zeros((dim, dim))
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            s += m.sum(axis=0)
            ss += m.T @ m
            n += len(m)
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    def combine(it):
        s = np.zeros(dim)
        ss = np.zeros(dim * dim)
        n = 0
        for pdf in it:
            for _, r in pdf.iterrows():
                n += r["n"]
                s += np.array(r["s"])
                ss += np.array(r["ss"])
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.tolist()]}
            )

    schema = "n long, s array<double>, ss array<double>"
    # tree combine: without it the driver collects one d²-sized row
    # PER INPUT PARTITION (10k partitions × d=1024 would be ~80 GB);
    # one 16-way combine level caps the collect at 16 rows for any
    # corpus, and the repartition moves only 16·d² doubles.
    rows = (
        embeddings.select(vec_col)
        .mapInPandas(partials, schema)
        .repartition(16)
        .mapInPandas(combine, schema)
        .collect()
    )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(dim, dim) for r in rows], axis=0)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, ::-1][:, :k].T  # k×d, descending eigenvalue order
    # deterministic sign: the largest-|entry| of each component > 0
    for r in range(k):
        j = int(np.argmax(np.abs(comp[r])))
        if comp[r, j] < 0:
            comp[r] = -comp[r]
    return mu, comp


def pca_project(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> DataFrame:
    """Project every embedding onto the top-k principal components of
    the corpus covariance. Returns (id, proj array<double> of k).
    Two corpus passes (sufficient statistics, then projection); the
    k×d component matrix travels by closure broadcast."""
    mu, comp = _pca_components(embeddings, vec_col, k)
    mu_l, comp_l = mu.tolist(), comp.tolist()

    def project(it):
        m_mu = np.array(mu_l)
        m_c = np.array(comp_l)
        for pdf in it:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (m - m_mu) @ m_c.T
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "proj": list(p)}
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        project, "id long, proj array<double>"
    )
