"""Logistic-regression classifier: the distributed full-batch GD
trainer against a transparent numpy reference, the serving projection's
zero-shuffle plan shape, and end-to-end langid skill on testdata."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    hashing_trick_embed,
    logreg_score,
    logreg_train,
)

DIM = 4
LR, ITERS, L2 = 0.5, 10, 1e-4

ROWS = [
    ([1.0, 0.0, 0.2, 0.0], 1),
    ([0.9, 0.1, 0.0, 0.0], 1),
    ([0.0, 1.0, 0.0, 0.3], 0),
    ([0.1, 0.8, 0.0, 0.1], 0),
    ([0.7, 0.2, 0.1, 0.0], 1),
    ([0.2, 0.9, 0.3, 0.0], 0),
]


def _ref_train():
    X = np.array([x for x, _ in ROWS])
    y = np.array([float(v) for _, v in ROWS])
    n = len(y)
    w = np.zeros(DIM)
    b = 0.0
    for _ in range(ITERS):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - y
        w = w - LR * (X.T @ r / n + L2 * w)
        b -= LR * r.sum() / n
    return w, b


def test_logreg_train_matches_numpy(spark):
    """Driver path (the default at sample scale): exact numpy GD."""
    df = spark.createDataFrame(
        ROWS, "embedding array<double>, y int"
    )
    w, b = logreg_train(
        df, dim=DIM, label_col="y", lr=LR, n_iters=ITERS, l2=L2
    )
    rw, rb = _ref_train()
    assert np.allclose(w, rw, rtol=1e-12, atol=1e-14)
    assert abs(b - rb) < 1e-14


def test_logreg_distributed_path_matches_driver(spark):
    """driver_row_limit=0 forces the distributed aggregate loop; it
    must agree with the collected-numpy path to float tolerance."""
    df = spark.createDataFrame(
        ROWS, "embedding array<double>, y int"
    )
    wd, bd = logreg_train(
        df, dim=DIM, label_col="y", lr=LR, n_iters=ITERS, l2=L2,
        driver_row_limit=0,
    )
    rw, rb = _ref_train()
    assert np.allclose(wd, rw, rtol=1e-9, atol=1e-12)
    assert abs(bd - rb) < 1e-12


def test_logreg_score_matches_sigmoid(spark):
    df = spark.createDataFrame(ROWS, "embedding array<double>, y int")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    w, b = _ref_train()
    got = {
        r.doc_id: (r.score, r.pred)
        for r in logreg_score(df, list(w), float(b)).collect()
    }
    X = np.array([x for x, _ in ROWS])
    ref = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    ids = sorted(got)
    for i, d in enumerate(ids):
        assert abs(got[d][0] - round(float(ref[i]), 6)) <= 1e-6
        assert got[d][1] == int(ref[i] >= 0.5)


def test_logreg_score_plan_has_no_exchange(spark):
    """Serving is the 100-TB pass: the literal-weight dot product must
    stay a zero-shuffle whole-stage projection."""
    df = spark.createDataFrame(ROWS, "embedding array<double>, y int")
    df = df.withColumn("doc_id", F.monotonically_increasing_id())
    plan = (
        logreg_score(df, [0.1] * DIM, 0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_langid_classifier_beats_majority_baseline(spark, sf_dir):
    """Trained on the doc_id%5==0 sample, the langid model must beat
    the majority-class baseline on HELD-OUT docs - the end-to-end
    'does the distributed trainer actually learn' check."""
    from txf_continuous_data_pipeline_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents")
    emb = hashing_trick_embed(docs, dim=32).join(
        docs.select(
            "doc_id", (F.col("lang") == "en").cast("int").alias("y")
        ),
        "doc_id",
    )
    train = emb.where(F.col("doc_id") % 5 == 0)
    held = emb.where(F.col("doc_id") % 5 != 0)
    w, b = logreg_train(train, dim=32, label_col="y", n_iters=25, lr=2.0)
    scored = logreg_score(held, w, b).join(
        held.select("doc_id", "y"), "doc_id"
    )
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("y")).cast("double")).alias("acc"),
        F.greatest(
            F.avg(F.col("y").cast("double")),
            1 - F.avg(F.col("y").cast("double")),
        ).alias("baseline"),
    ).first()
    assert agg["acc"] > agg["baseline"]


def test_dense_vec_rounding_is_half_up_like_both_engines(spark):
    """The Arrow scatter tail must round 6dp midpoints half-UP (Spark
    F.round == DuckDB round); np.round's half-even emitted 0.007812
    for an exact 1/128 component. 16384 unit weights under a 16384-dim
    helper give components exactly 1/128 (sqrt(16384) = 128 is exact
    in binary float)."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.operators.textstats import (
        _dense_unit_vec_udf,
    )

    dim = 16384
    entries = spark.createDataFrame(
        [(1, [(i, 1.0) for i in range(dim)])],
        "doc_id long, _e array<struct<_pos: long, _n: double>>",
    )
    dense = _dense_unit_vec_udf(dim, "_n")
    out = entries.select(
        F.transform(dense(F.col("_e")), lambda x: F.round(x, 6)).alias(
            "v"
        )
    ).head()["v"]
    assert out[0] == 0.007813 and out[-1] == 0.007813
