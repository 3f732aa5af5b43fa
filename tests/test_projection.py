"""PCA + Johnson-Lindenstrauss projection: the partition-partial
sufficient-statistics fit against full-matrix numpy PCA, the
deterministic sign matrix, distance preservation, and the
zero-shuffle projection plans."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.similarity import (
    jl_project,
    jl_sign_matrix,
    pca_fit,
    pca_project,
)


def _toy(spark, n=60, dim=6, seed=7):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: one dominant direction so the spectrum is
    # unambiguous
    base = rng.randn(n, dim)
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        base,
    )


def test_pca_fit_matches_numpy(spark):
    df, X = _toy(spark)
    mean, comps, vals = pca_fit(df, k=3)
    mu = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert np.allclose(mean, mu, rtol=1e-9, atol=1e-12)
    for got_v, got_l, j in zip(comps, vals, order):
        ref = evecs[:, j]
        if ref[int(np.argmax(np.abs(ref)))] < 0:
            ref = -ref
        assert np.allclose(got_v, ref, rtol=1e-7, atol=1e-9)
        assert abs(got_l - evals[j]) < 1e-9


def test_pca_fit_partition_invariant(spark):
    """The sufficient statistics are algebraically mergeable: 1 vs 8
    partitions must give the same factorization."""
    df, _ = _toy(spark)
    a = pca_fit(df.coalesce(1), k=2)
    b = pca_fit(df.repartition(8), k=2)
    assert np.allclose(a[0], b[0], rtol=1e-9)
    assert np.allclose(a[1], b[1], rtol=1e-7, atol=1e-9)


def test_pca_projection_variance_is_spectrum(spark):
    df, X = _toy(spark)
    mean, comps, vals = pca_fit(df, k=2)
    proj = np.array(
        [
            r.projection
            for r in pca_project(df, mean, comps)
            .orderBy("vec_id")
            .collect()
        ]
    )
    # population variance along each component == its eigenvalue
    got = proj.var(axis=0)
    assert np.allclose(got, vals, rtol=1e-7)


def test_jl_sign_matrix_is_deterministic_and_balanced():
    R = np.array(jl_sign_matrix(16, 64))
    assert R.shape == (16, 64)
    assert np.allclose(np.abs(R), 1.0 / 4.0)  # 1/sqrt(16)
    assert np.array_equal(R, np.array(jl_sign_matrix(16, 64)))
    # parity hash should be roughly balanced
    frac_pos = (R > 0).mean()
    assert 0.4 < frac_pos < 0.6


def test_jl_preserves_pairwise_distances(spark):
    df, X = _toy(spark, n=40, dim=64)
    proj = {
        r.vec_id: np.array(r.projection)
        for r in jl_project(df, out_dim=16).collect()
    }
    rng = np.random.RandomState(1)
    ratios = []
    for _ in range(60):
        i, j = rng.choice(40, 2, replace=False)
        d0 = np.linalg.norm(X[i] - X[j])
        d1 = np.linalg.norm(proj[i] - proj[j])
        ratios.append(d1 / d0)
    # JL with k=16: distances preserved in expectation; the empirical
    # spread stays well inside a 2x band for Gaussian data
    assert 0.5 < min(ratios) and max(ratios) < 2.0
    assert abs(float(np.mean(ratios)) - 1.0) < 0.25


def test_projection_plans_are_shuffle_free(spark):
    df, _ = _toy(spark, n=10, dim=64)
    plan = (
        jl_project(df, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    mean, comps, _ = pca_fit(df, k=2)
    plan2 = (
        pca_project(df, mean, comps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan2
