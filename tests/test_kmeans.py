"""Distributed Lloyd's k-means differentially tested against a
single-node numpy reference with the IDENTICAL deterministic init
(k smallest md5(id) rows), identical empty-cluster rule (keep the old
centroid), and identical tie-break (smaller cluster id wins).

The Spark recompute sums per partition in a different order than numpy's
mean, so centroids agree to ~1e-9 - far below any assignment margin on
continuous embeddings - and assignments must match exactly."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from txf_continuous_data_pipeline_spark.operators.similarity import (
    kmeans_assign,
    kmeans_cost,
    kmeans_fit,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def _numpy_lloyd(ids, X, k, max_iter, tol=1e-6):
    """Reference implementation mirroring kmeans_fit exactly."""
    order = np.argsort(
        np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    )
    cents = X[order[:k]].astype(np.float64).copy()
    converged = False
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (smallest) id
        nxt = cents.copy()
        for c in range(k):
            members = X[assign == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        shift = ((cents - nxt) ** 2).sum(axis=1).max()
        cents = nxt
        if shift <= tol:
            converged = True
            break
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d.argmin(axis=1), n_iter, converged


def _load(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    cents, n_iter, converged = kmeans_fit(emb, 4, max_iter=4)

    ids, X = _load(spark, sf_dir)
    ref_cents, ref_assign, ref_iter, ref_conv = _numpy_lloyd(
        ids, X, 4, max_iter=4
    )
    assert n_iter == ref_iter
    assert converged == ref_conv
    got = np.array([v for _, v in sorted(cents)])
    np.testing.assert_allclose(got, ref_cents, atol=1e-8)

    assigned = {
        r["vec_id"]: r["cluster_id"]
        for r in kmeans_assign(emb, cents).select("vec_id", "cluster_id").collect()
    }
    ref = dict(zip(ids.tolist(), ref_assign.tolist()))
    assert assigned == ref


def test_kmeans_cost_monotone_descent(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    costs = [
        kmeans_cost(emb, kmeans_fit(emb, 4, max_iter=it)[0])
        for it in (1, 2, 4)
    ]
    assert costs[0] >= costs[1] >= costs[2]


def test_kmeans_empty_cluster_keeps_seed(spark):
    # 3 identical points, k=2: one cluster takes everything, the other
    # goes empty and must keep its seed centroid (not vanish / NaN).
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(3)], "vec_id long, embedding array<double>"
    )
    cents, _, converged = kmeans_fit(df, 2, max_iter=3)
    assert len(cents) == 2
    assert converged
    assert all(all(np.isfinite(v)) for _, v in cents)
    winners = {c for c, v in cents if v == [1.0, 2.0]}
    assert winners  # at least one centroid converged onto the point


def test_kmeans_convergence_flag_and_validation(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    # huge tol -> first iteration's shift already passes
    _, n_iter, converged = kmeans_fit(emb, 2, max_iter=5, tol=1e12)
    assert (n_iter, converged) == (1, True)
    with pytest.raises(ValueError):
        kmeans_fit(emb, 0)
    with pytest.raises(ValueError):
        kmeans_fit(emb.limit(3), 5, max_iter=1)


def test_kmeans_assignment_plan_is_shuffle_free(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    cents, _, _ = kmeans_fit(emb, 2, max_iter=1)
    plan = kmeans_assign(emb, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ivf_learned_is_exact_within_cell(spark, sf_dir):
    """ivf_topk_learned == brute force restricted to the query's own
    cell (nprobe=1), computed independently in numpy: same quantizer
    (kmeans_fit is deterministic), exact top-k among cell-mates by
    (cos desc, id). Pins the whole train -> store -> probe composition,
    not just its stages."""
    from txf_continuous_data_pipeline_spark.operators.similarity import (
        ivf_topk_learned,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    query_ids = {0, 1, 2}
    got = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["cos_sim"])
        for r in ivf_topk_learned(
            emb,
            query_pred=lambda c: c.isin(*query_ids),
            k=3,
            n_clusters=4,
            max_iter=3,
        ).collect()
    }

    cents, _, _ = kmeans_fit(emb, 4, max_iter=3)
    C = np.array([v for _, v in cents])
    ids, X = _load(spark, sf_dir)
    cell = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    norms = np.sqrt((X**2).sum(axis=1))
    by_id = {int(i): n for n, i in enumerate(ids)}
    for q in query_ids:
        qi = by_id[q]
        mates = [
            n
            for n in range(len(ids))
            if cell[n] == cell[qi] and int(ids[n]) not in query_ids
        ]
        cos = np.round(
            (X[mates] @ X[qi]) / (norms[mates] * norms[qi]), 6
        )
        want = sorted(
            zip(-cos, ids[mates].astype(int).tolist())
        )[:3]
        for rn, (negc, vid) in enumerate(want, start=1):
            g_vid, g_cos = got[(q, rn)]
            assert (g_vid, g_cos) == (vid, -negc), (q, rn)
