"""quality_filter_ingest_run: the streaming quality gate must split
the corpus exactly as the batch serving path does (stream == batch),
quarantine rejected rows with their scores instead of dropping them,
and rewrite - not double-append - on checkpoint replay."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.textstats import (
    hashing_trick_embed,
    logreg_score,
)
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    quality_filter_ingest_run,
)

WEIGHTS = [((7 * i) % 13 - 6) / 10.0 for i in range(64)]
BIAS = -0.1


def _stage_docs_feed(spark, sf_dir, feed: str, n_files: int = 3) -> str:
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    # deterministic file split so batch order is stable across runs
    for i in range(n_files):
        docs.where(F.col("doc_id") % n_files == i).coalesce(1).write.mode(
            "append"
        ).parquet(feed)
    return feed


def test_stream_split_equals_batch_scoring(spark, sf_dir, tmp_path):
    feed = _stage_docs_feed(spark, sf_dir, str(tmp_path / "feed"))
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, str(tmp_path / "work"), WEIGHTS, BIAS
    )

    docs = read_table(spark, sf_dir, "documents")
    ref = logreg_score(hashing_trick_embed(docs, dim=64), WEIGHTS, BIAS)
    ref_kept = {
        r.doc_id for r in ref.where(F.col("score") >= 0.5).collect()
    }
    ref_scores = {r.doc_id: r.score for r in ref.collect()}

    kept = spark.read.parquet(kept_dir)
    quar = spark.read.parquet(quar_dir)
    assert {r.doc_id for r in kept.collect()} == ref_kept
    # quarantine = exact complement, auditable with scores
    assert {r.doc_id for r in quar.collect()} == (
        set(ref_scores) - ref_kept
    )
    got_scores = {
        r.doc_id: r.score
        for r in kept.unionByName(quar).collect()
    }
    assert got_scores == ref_scores


def test_rerun_rewrites_instead_of_double_appending(spark, sf_dir, tmp_path):
    feed = _stage_docs_feed(spark, sf_dir, str(tmp_path / "feed"))
    work = str(tmp_path / "work")
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, work, WEIGHTS, BIAS
    )
    n_kept = spark.read.parquet(kept_dir).count()
    n_quar = spark.read.parquet(quar_dir).count()
    # replay against the same checkpoint: availableNow sees no new
    # files, so counts must not move; a second FULL redelivery (fresh
    # checkpoint, same batch ids) rewrites the same partitions
    quality_filter_ingest_run(spark, feed, work, WEIGHTS, BIAS)
    assert spark.read.parquet(kept_dir).count() == n_kept
    import shutil

    shutil.rmtree(os.path.join(work, "ckpt"))
    quality_filter_ingest_run(spark, feed, work, WEIGHTS, BIAS)
    assert spark.read.parquet(kept_dir).count() == n_kept
    assert spark.read.parquet(quar_dir).count() == n_quar


def test_unscorable_rows_quarantine_not_vanish(spark, tmp_path):
    """A row the featurizer cannot score (null text -> no feature row)
    must land in quarantine with a null score - never silently vanish
    from both sinks (the auditability contract)."""
    feed = str(tmp_path / "feed")
    spark.createDataFrame(
        [(1, "spark filter join group"), (2, None), (3, "")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(feed)
    kept_dir, quar_dir = quality_filter_ingest_run(
        spark, feed, str(tmp_path / "work"), WEIGHTS, BIAS
    )
    kept = spark.read.parquet(os.path.join(kept_dir, "*")).collect()
    quar = spark.read.parquet(os.path.join(quar_dir, "*")).collect()
    all_ids = {r["doc_id"] for r in kept} | {r["doc_id"] for r in quar}
    assert all_ids == {1, 2, 3}  # nothing vanished
    by_id = {r["doc_id"]: r for r in quar}
    assert 2 in by_id and by_id[2]["score"] is None
