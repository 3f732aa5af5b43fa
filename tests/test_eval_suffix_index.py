"""build_eval_suffix_index / suffix_eval_maxrun_probe: the broadcast
frozen-eval index behind the streaming decontamination gate's O(batch)
fast path (r14 verdict #1). The load-bearing pin is the differential:
per-doc probe values must equal the merged suffix sort's
suffix_eval_overlap(...).groupBy(max) EXACTLY - the gate's verdicts
(and its stream == batch fold test) ride on it."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import (
    _eval_suffix_array,
    build_eval_suffix_index,
    suffix_eval_maxrun_probe,
    suffix_eval_overlap,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def test_suffix_array_matches_naive_sort():
    rng = np.random.default_rng(7)
    for n in (1, 2, 5, 40, 300):
        # small alphabet forces long ties; distinct negative sentinels
        # mirror the index's doc separators
        e = rng.integers(0, 4, size=n).astype(np.int64)
        e[n // 2] = -1
        if n > 3:
            e[-1] = -2
        sa = _eval_suffix_array(e)
        want = sorted(range(n), key=lambda i: list(e[i:]))
        assert list(sa) == want


def test_probe_matches_merged_sort_on_testdata(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    ev = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)

    idx = build_eval_suffix_index(ev)
    assert idx is not None
    bc = spark.sparkContext.broadcast(idx)
    got = {
        r["doc_id"]: r["max_eval_run"]
        for r in suffix_eval_maxrun_probe(train, bc).collect()
    }

    lens = suffix_eval_overlap(train, ev)
    want = {
        r["doc_id"]: r["mx"]
        for r in lens.groupBy("doc_id")
        .agg(F.max("eval_len").cast("long").alias("mx"))
        .collect()
    }
    # the probe emits a row for EVERY train doc (merged path omits
    # docs with no tokens; the gate left-join coalesces those to 0)
    assert got.keys() >= want.keys()
    for d, m in want.items():
        assert got[d] == m, f"doc {d}: probe {got[d]} != merged {m}"
    for d in got.keys() - want.keys():
        assert got[d] == 0
    # the testdata must actually exercise overlaps or this test is void
    assert max(want.values()) >= 2


def test_stats_probe_matches_merged_sort_aggregates(spark, sf_dir):
    """suffix_eval_stats_probe vs the exact_decontamination
    aggregates over the merged machinery: n_tokens,
    contaminated_positions (ms >= 8) and max_eval_run must agree
    doc-exact - the declared query's oracle identity rides on it."""
    from txf_continuous_data_pipeline_spark.operators.dedup import (
        suffix_eval_stats_probe,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ev = docs.where(F.col("source") == "src0")
    train = docs.where(F.col("source") != "src0")

    idx = build_eval_suffix_index(ev)
    bc = spark.sparkContext.broadcast(idx)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["contaminated_positions"],
            r["max_eval_run"],
        )
        for r in suffix_eval_stats_probe(
            train, bc, run_threshold=8
        ).collect()
    }
    lens = suffix_eval_overlap(train, ev)
    want = {
        r["doc_id"]: (r["nt"], r["cp"], r["mx"])
        for r in lens.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("nt"),
            F.count(F.when(F.col("eval_len") >= 8, 1))
            .cast("long")
            .alias("cp"),
            F.max("eval_len").cast("long").alias("mx"),
        )
        .collect()
    }
    assert got.keys() >= want.keys()
    for d, w in want.items():
        assert got[d] == w, f"doc {d}: probe {got[d]} != merged {w}"
    for d in got.keys() - want.keys():
        assert got[d] == (0, 0, 0)
    # the testdata must exercise contamination or this test is void
    assert any(w[1] > 0 for w in want.values())


def test_probe_edge_cases(spark):
    ev = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "x y z")],
        "doc_id long, text string",
    )
    idx = build_eval_suffix_index(ev)
    bc = spark.sparkContext.broadcast(idx)
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),  # full verbatim quote: 4
            (11, "beta gamma q x y"),  # runs 2 and 2, never cross-doc
            (12, "nothing shared here"),  # 0
            (13, ""),  # no tokens -> 0
            (14, None),  # null text -> 0
            (15, "delta x"),  # doc boundary must not bridge: 1
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["max_eval_run"]
        for r in suffix_eval_maxrun_probe(batch, bc).collect()
    }
    assert got == {10: 4, 11: 2, 12: 0, 13: 0, 14: 0, 15: 1}


def test_empty_eval_side_yields_zero_runs(spark):
    ev = spark.createDataFrame([], "doc_id long, text string")
    idx = build_eval_suffix_index(ev)
    assert idx is not None and len(idx["SA"]) == 0
    bc = spark.sparkContext.broadcast(idx)
    batch = spark.createDataFrame(
        [(1, "any text at all")], "doc_id long, text string"
    )
    rows = suffix_eval_maxrun_probe(batch, bc).collect()
    assert [(r["doc_id"], r["max_eval_run"]) for r in rows] == [(1, 0)]


def test_size_gate_falls_back_to_none(spark):
    ev = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    assert build_eval_suffix_index(ev, max_tokens=3) is None
    assert build_eval_suffix_index(ev, max_tokens=8) is not None


def test_gate_fallback_path_matches_fast_path(spark, sf_dir, tmp_path):
    """decontam_gate_ingest_run over the SAME feed with the index
    gated off (max-tokens env = 0 -> merged-sort fallback) must
    produce identical kept/quarantine doc sets."""
    import os

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        decontam_gate_ingest_run,
    )

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ev = docs.where(F.col("source") == "src0").localCheckpoint(
        eager=True
    )
    train = docs.where(F.col("source") != "src0")
    feed = str(tmp_path / "feed")
    train.coalesce(1).write.mode("append").parquet(feed)

    kept_f, quar_f = decontam_gate_ingest_run(
        spark, feed, str(tmp_path / "w_fast"), ev, max_run=8
    )
    os.environ["SPARK_GRAFT_EVAL_INDEX_MAX_TOKENS"] = "0"
    try:
        kept_s, quar_s = decontam_gate_ingest_run(
            spark, feed, str(tmp_path / "w_slow"), ev, max_run=8
        )
    finally:
        del os.environ["SPARK_GRAFT_EVAL_INDEX_MAX_TOKENS"]

    def _ids(path):
        return {
            r["doc_id"]
            for r in spark.read.parquet(path).select("doc_id").collect()
        }

    assert _ids(kept_f) == _ids(kept_s)
    assert _ids(quar_f) == _ids(quar_s)
    # the quarantined audit column must agree run-length-exact
    qf = {
        r["doc_id"]: r["max_eval_run"]
        for r in spark.read.parquet(quar_f).collect()
    }
    qs = {
        r["doc_id"]: r["max_eval_run"]
        for r in spark.read.parquet(quar_s).collect()
    }
    assert qf == qs and qf
