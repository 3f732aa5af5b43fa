"""Sparse (BM25) and hybrid (RRF) retrieval: formula differential
against a transparent pure-Python reference, tie/rounding pinning,
and the broadcast plan shape."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    bm25_topk,
)

CORPUS = [
    (10, "spark shuffles the big join"),
    (11, "broadcast the small join side"),
    (12, "spark spark spark streaming state"),
    (13, "lexical retrieval with bm25 scoring"),
    (14, "dense retrieval with embeddings"),
]
QUERIES = [(0, "spark join"), (1, "retrieval scoring")]
K1, B = 1.2, 0.75


def _ref_bm25(k):
    toks = {d: t.lower().split() for d, t in CORPUS}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = float(len(toks))
    avgdl = sum(dl.values()) / n
    tf = {d: Counter(ts) for d, ts in toks.items()}
    df = Counter()
    for ts in toks.values():
        for t in set(ts):
            df[t] += 1
    out = []
    for qid, qtext in QUERIES:
        scores = {}
        for d in toks:
            s = 0.0
            for t in set(qtext.lower().split()):
                if tf[d][t] == 0:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += (
                    idf
                    * tf[d][t]
                    * (K1 + 1)
                    / (tf[d][t] + K1 * (1 - B + B * dl[d] / avgdl))
                )
            if s > 0:
                scores[d] = round(s, 6)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rn, (d, s) in enumerate(ranked[:k], 1):
            out.append((qid, d, s, rn))
    return sorted(out)


def test_bm25_matches_pure_python_reference(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    got = sorted(
        (r["q_id"], r["doc_id"], r["score"], r["rn"])
        for r in bm25_topk(corpus, queries, k=3, k1=K1, b=B).collect()
    )
    assert got == _ref_bm25(3)
    # only docs sharing a query term score at all
    assert all(s > 0 for _q, _d, s, _r in got)


def test_bm25_query_terms_broadcast(spark):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "q_id long, q_text string")
    plan = (
        bm25_topk(corpus, queries, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the query-term prune join and the dfreq enrich join are both
    # broadcast-side; no cartesian anywhere
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan


def test_rrf_fusion_prefers_items_ranked_by_both(spark):
    got = {}
    from txf_continuous_data_pipeline_spark.queries import REGISTRY

    fn = REGISTRY["hybrid_rrf_topk"][0]
    for r in fn(spark, "/root/testdata/sf0.001").collect():
        got.setdefault(r["q_id"], []).append((r["rn"], r["id"], r["rrf"]))
    assert set(got) == {0, 1, 2, 3, 4}
    for q, rows in got.items():
        rows.sort()
        # fused scores are monotone in rank and bounded by the two-list
        # maximum 2/(60+1)
        scores = [s for _rn, _i, s in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(0 < s <= round(2 / 61, 6) for s in scores)


def test_bm25_index_serving_and_append_equal_inline(spark, tmp_path):
    """from-index == inline, and append == rebuild: the stored
    postings/dl tables are per-doc disjoint rows, so incremental
    growth is pure append."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        append_bm25_index,
        bm25_topk_from_index,
        write_bm25_index,
    )

    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "q_id long, q_text string")

    def rows(df):
        return sorted(
            (r["q_id"], r["doc_id"], r["score"], r["rn"])
            for r in df.collect()
        )

    # build from the first 3 docs, append the remaining 2
    base = corpus.where(F.col("doc_id") <= 12)
    late = corpus.where(F.col("doc_id") > 12)
    idx = str(tmp_path / "bm25")
    write_bm25_index(base, idx)
    append_bm25_index(late, idx)
    got = rows(bm25_topk_from_index(spark, idx, queries, k=3))
    want = rows(bm25_topk(corpus, queries, k=3))
    assert got == want == _ref_bm25(3)

    # rebuild over the full corpus gives the identical stored tables
    idx2 = str(tmp_path / "bm25_full")
    write_bm25_index(corpus, idx2)
    got2 = rows(bm25_topk_from_index(spark, idx2, queries, k=3))
    assert got2 == want


def test_phrase_search_planted(spark):
    """Planted phrases: overlap counting, repeated-word phrases, a
    cross-boundary non-match, and absent phrases yielding no row."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # 'a a' twice (overlap), 'a b' once
            (2, "x a y a b"),        # 'a b' once at pos 3; 'a a' absent
            (3, "b a"),              # reversed - no 'a b'
            (4, "A  a\ta "),         # normalization: 'a a' twice
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(0, "a a"), (1, "a b"), (2, "zz qq")],
        "q_id long, q_text string",
    )
    got = {
        (r.q_id, r.doc_id): (r.n_hits, r.first_pos)
        for r in phrase_search(docs, qs).collect()
    }
    assert got == {
        (0, 1): (2, 0),
        (0, 4): (2, 0),
        (1, 1): (1, 2),
        (1, 2): (1, 3),
    }


def test_phrase_search_postings_broadcast(spark):
    """The phrase-term side must broadcast - the posting prune join
    must never shuffle the corpus on anything but the term hash."""
    from txf_continuous_data_pipeline_spark.operators.textstats import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(0, "a b")], "q_id long, q_text string"
    )
    plan = phrase_search(docs, qs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
