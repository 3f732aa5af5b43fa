"""ST1-ST4: the streaming micro-run must (a) agree with batch on every
bar it emits, (b) have emitted at least every bar finalized by the
watermark as of the last completed data batch, (c) never duplicate a
window under re-run (SURVEY.md section 5 "Streaming re-run test")."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.resample import tumbling_ohlcv
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming import (
    available_now_bar_stream,
    stage_events_dir,
)

DELAY = "10 minutes"
WIDTH = "5 minutes"


def _batch_bars(spark, sf_dir):
    return tumbling_ohlcv(
        read_table(spark, sf_dir, "events"),
        ts_col="ts", price_col="value", width=WIDTH,
        closed="right", out_ts="bar_ts",
    ).drop("n_rows")


def test_stream_matches_batch_and_rerun_is_idempotent(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)

    available_now_bar_stream(spark, feed, sink, ckpt, delay=DELAY)
    streamed = spark.read.parquet(sink)
    cols = streamed.columns

    all_batch = {tuple(r) for r in _batch_bars(spark, sf_dir).select(*cols).collect()}
    got = {tuple(r) for r in streamed.collect()}
    assert got <= all_batch, "stream emitted bars that disagree with batch"

    # Lower bound: every window finalized by the watermark in force
    # during the LAST data batch (= max ts of the first n-1 files - delay)
    # must have been emitted, whether or not the final no-data flush ran.
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    first_files = spark.read.parquet(*parts[:-1])
    wm = first_files.agg(F.max("ts")).collect()[0][0]
    want = {
        tuple(r)
        for r in _batch_bars(spark, sf_dir)
        .where(
            F.col("bar_ts") + F.expr(f"INTERVAL {WIDTH}")
            <= F.lit(wm) - F.expr(f"INTERVAL {DELAY}")
        )
        .select(*cols)
        .collect()
    }
    assert want <= got, f"stream missing {len(want - got)} finalized bars"

    # Re-runs may flush residual windows from state, but must never
    # duplicate a window key and must stay value-consistent with batch.
    for _ in range(2):
        available_now_bar_stream(spark, feed, sink, ckpt, delay=DELAY)
    final = spark.read.parquet(sink)
    n = final.count()
    assert final.select("bar_ts").distinct().count() == n, "duplicate windows"
    assert {tuple(r) for r in final.collect()} <= all_batch


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    """Stream-static join: the streaming back-adjusted bars must agree
    row-for-row with the batch pipeline's enrichment for every bar the
    watermark finalized."""
    from txf_continuous_data_pipeline_spark.operators.adjust import backadjust
    from txf_continuous_data_pipeline_spark.operators.resample import (
        tumbling_ohlcv,
    )
    from txf_continuous_data_pipeline_spark.plans.pipeline import (
        weekly_settle_config,
    )
    from txf_continuous_data_pipeline_spark.sources import read_table
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        stage_events_dir,
        streaming_enriched_bars,
    )

    events = read_table(spark, sf_dir, "events")
    cfg = weekly_settle_config(events)
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)
    sink = str(tmp_path / "sink")

    q = (
        streaming_enriched_bars(spark, feed, cfg, delay="10 minutes")
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()

    cols = ["bar_ts", "close", "accumulated_contract_diff",
            "contract_year_month"]
    got = {
        tuple(r) for r in spark.read.parquet(sink).select(*cols).collect()
    }
    assert got, "no enriched bars emitted"
    batch = backadjust(
        tumbling_ohlcv(events), cfg, ts_col="bar_ts", end_inclusive=False
    )
    want = {tuple(r) for r in batch.select(*cols).collect()}
    assert got <= want, "stream enrichment disagrees with batch"
    # and most finalized bars must be present (only the watermark tail
    # may be missing)
    assert len(got) >= len(want) * 0.8


def test_stream_stream_conversion_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join (click -> purchase within 10 min,
    same user): the drained availableNow result must equal the batch
    join exactly - inner join, so no watermark-dependent row loss."""
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        conversion_join_stream,
        stage_events_dir,
    )

    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    joined = conversion_join_stream(
        spark, feed, max_files_per_trigger=1
    )
    q = (
        joined.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream-stream join exceeded 120s")
    if q.exception() is not None:
        raise q.exception()

    cols = ["user_id", "first_id", "then_id"]
    got = {
        tuple(r) for r in spark.read.parquet(sink).select(*cols).collect()
    }

    events = read_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"),
    )
    buys = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("then_id"),
        F.col("ts").alias("then_ts"),
    )
    want = {
        tuple(r)
        for r in clicks.join(
            buys,
            (F.col("u") == F.col("u2"))
            & (F.col("then_ts") > F.col("first_ts"))
            & (
                F.col("then_ts")
                <= F.col("first_ts") + F.expr("INTERVAL 10 minutes")
            ),
        )
        .select(F.col("u").alias("user_id"), "first_id", "then_id")
        .collect()
    }
    assert want, "batch twin found no conversions - test data changed?"
    assert got == want
