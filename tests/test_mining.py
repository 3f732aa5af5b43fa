"""Hard-negative / triplet mining semantics on a hand-built frame:
label partitioning, similarity tie-break on the lower id, and the
absent-label anchor drop the SQL oracle's inner join implies."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.similarity import (
    hard_negative_topk,
    mine_triplets,
)


def _frames(spark):
    # 2-d vectors: cosine orders by angle to the anchor (1, 0).
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 0),    # same label, identical direction
            (11, [1.0, 0.1], 0),    # same label, slightly off
            (12, [1.0, 0.05], 1),   # impostor, very close
            (13, [0.0, 1.0], 1),    # impostor, orthogonal
            (14, [1.0, 0.05], 2),   # impostor, ties 12 -> lower id wins
        ],
        "vec_id long, embedding array<double>, label int",
    )
    anchors = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 7, [1.0, 0.0])],
        "q_id long, q_label int, q_vec array<double>",
    )
    return anchors, corpus


def test_hard_negative_excludes_same_label_and_breaks_ties(spark):
    anchors, corpus = _frames(spark)
    rows = {
        (r["q_id"], r["rn"]): (r["vec_id"], r["label"])
        for r in hard_negative_topk(anchors, corpus, k=3).collect()
    }
    # anchor 0 (label 0): negatives are 12/13/14 only; 12 and 14 tie on
    # cos_sim -> lower vec_id first.
    assert rows[(0, 1)] == (12, 1)
    assert rows[(0, 2)] == (14, 2)
    assert rows[(0, 3)] == (13, 1)
    # anchor 1 (label 7): EVERY corpus row is a negative; top-1 is the
    # identical-direction vector.
    assert rows[(1, 1)] == (10, 0)


def test_triplet_mining_picks_rank1_and_drops_absent_labels(spark):
    anchors, corpus = _frames(spark)
    out = {r["q_id"]: r for r in mine_triplets(anchors, corpus).collect()}
    # anchor 1's label 7 has no positives -> inner join drops it.
    assert set(out) == {0}
    r = out[0]
    assert r["pos_id"] == 10 and r["pos_sim"] == 1.0
    assert r["neg_id"] == 12
    assert r["margin"] == round(r["pos_sim"] - r["neg_sim"], 6) > 0


def test_maxsim_rewards_containment_and_ignores_order(spark):
    """MaxSim invariants: a candidate containing every anchor token
    scores exactly n_anchor_tokens (each max-cos hits the identical
    token, cos=1) REGARDLESS of token order; a disjoint candidate
    scores strictly less."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        doc_token_vectors,
        maxsim_topk,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (10, "gamma beta alpha"),          # same tokens, reordered
            (11, "alpha beta gamma delta eps"),  # superset
            (12, "zeta eta theta"),            # disjoint
        ],
        "doc_id long, text string",
    )
    anchors = doc_token_vectors(
        docs.where("doc_id = 0"), n_tokens=8
    )
    corpus = doc_token_vectors(
        docs.where("doc_id >= 10"), n_tokens=16
    )
    rows = {r["doc_id"]: r for r in maxsim_topk(anchors, corpus, k=3).collect()}
    assert rows[10]["score"] == 3.0  # full containment, any order
    assert rows[11]["score"] == 3.0  # superset: extra tokens don't hurt
    assert rows[12]["score"] < 3.0
    assert rows[12]["rn"] == 3


def test_retrieve_rerank_scores_bounded_and_complete(spark, sf_dir):
    """MaxSim over a shortlist: per anchor exactly k results, scores
    bounded by the anchor token count (each max-cos <= 1), ranks
    contiguous from 1."""
    from txf_continuous_data_pipeline_spark.queries.registry import REGISTRY

    rows = REGISTRY["retrieve_rerank_topk"][0](spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
        assert r["score"] <= 8.0 + 1e-9
    for q, rs in by_q.items():
        assert sorted(x["rn"] for x in rs) == [1, 2, 3]


def test_quantile_sketch_within_rank_error_of_exact(spark, sf_dir):
    """The bottom-k hash sketch's quantile of a k-sample has binomial
    rank error: sd = n*sqrt(q(1-q)/k). Verify each sketch quantile's
    RANK in the full sorted data sits within 5 sd (+2 slack) of the
    target rank, per group - the accuracy half of the checkability
    trade (the value half is the driver oracle)."""
    from txf_continuous_data_pipeline_spark.queries.registry import REGISTRY
    from txf_continuous_data_pipeline_spark.sources import read_table

    got = {
        r["l_returnflag"]: r
        for r in REGISTRY["price_quantile_sketch"][0](spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    import bisect
    import math

    k = 4096
    for flag, r in got.items():
        assert r["n_retained"] == min(k, r["n_rows"])
        vals = sorted(
            x["l_extendedprice"]
            for x in li.where(F.col("l_returnflag") == flag).collect()
        )
        n = len(vals)
        assert n == r["n_rows"]
        for p, col in (
            (0.5, "p50_sketch"),
            (0.9, "p90_sketch"),
            (0.99, "p99_sketch"),
        ):
            rank = bisect.bisect_left(vals, r[col])
            tol = 5 * n * math.sqrt(p * (1 - p) / k) + 2
            assert abs(rank - p * n) <= tol, (flag, col, rank, p * n, tol)


def test_quantile_sketch_prefilter_is_lossless(spark, sf_dir):
    """The scale-path hash prefilter (threshold sized off the exact
    group counts, ~margin*k expected survivors) must retain the SAME
    rows as the unfiltered bottom-k - pinned by running the sketch
    with the default margin and with an effectively-infinite one
    (threshold saturates at 2^60 = no filter) and requiring identical
    output, checksum included."""
    from txf_continuous_data_pipeline_spark.operators.sketches import (
        bottomk_quantile_sketch,
    )
    from txf_continuous_data_pipeline_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem")

    def _run(margin):
        return {
            tuple(r)
            for r in bottomk_quantile_sketch(
                li,
                value_col="l_extendedprice",
                group_col="l_returnflag",
                id_cols=["l_orderkey", "l_linenumber"],
                k=4096,
                prefilter_margin=margin,
            ).collect()
        }

    assert _run(4.0) == _run(1e18)
