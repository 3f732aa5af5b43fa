"""Embedding-quality sweeps: planted-outlier detection and the
Matryoshka truncation sweep's self-consistency invariant."""

from __future__ import annotations

import numpy as np

from txf_continuous_data_pipeline_spark.operators.similarity import (
    embedding_outliers,
)
from txf_continuous_data_pipeline_spark.queries.registry import REGISTRY


def test_embedding_outliers_flags_planted_point(spark):
    rng = np.random.RandomState(3)
    rows = []
    # label 0: tight cluster around (1,0,...) + ONE far point (id 99)
    for i in range(30):
        v = np.array([1.0, 0.0, 0.0, 0.0]) + rng.normal(0, 0.01, 4)
        rows.append((i, [float(x) for x in v], 0))
    rows.append((99, [5.0, 5.0, 5.0, 5.0], 0))
    # label 1: tight cluster, no outlier
    for i in range(100, 130):
        v = np.array([0.0, 1.0, 0.0, 0.0]) + rng.normal(0, 0.01, 4)
        rows.append((i, [float(x) for x in v], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {r["vec_id"]: r for r in embedding_outliers(emb, z_thresh=2.0).collect()}
    assert 99 in out and out[99]["label"] == 0
    assert out[99]["z_score"] > 2.0
    # the planted point inflates label 0's std so much that none of its
    # cluster points can trip (their z goes negative); label 1's pure
    # gaussian cluster may legitimately flag ~2%-tail strays.
    assert {v for v, r in out.items() if r["label"] == 0} == {99}


def test_embedding_outliers_silent_on_degenerate_label(spark):
    # all-identical label -> stddev 0 -> must emit nothing, not NaN
    emb = spark.createDataFrame(
        [(i, [1.0, 2.0], 7) for i in range(5)],
        "vec_id long, embedding array<double>, label int",
    )
    assert embedding_outliers(emb).count() == 0


def test_matryoshka_full_dim_recovers_itself(spark, sf_dir):
    fn, _sql = REGISTRY["matryoshka_recall"]
    rows = fn(spark, sf_dir).collect()
    dims = {r["dim"] for r in rows}
    assert dims == {8, 16, 32, 64}
    for r in rows:
        if r["dim"] == 64:
            assert r["n_hits"] == 3, r  # reference compares to itself
        assert 0 <= r["n_hits"] <= 3
