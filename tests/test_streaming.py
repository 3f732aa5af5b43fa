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


def test_gate_failure_leaves_sink_byte_identical_under_redelivery(
    spark, tmp_path
):
    """VERDICT r9 #7 - Gate 1 under at-least-once redelivery: a batch
    that fails the expected-count gate must abort BEFORE any byte
    lands (abort-then-retry = exactly-once, the reference's
    better-missing-than-wrong rule main.py:399-400 under replay), a
    repeated failing redelivery must change nothing, and once the
    gate passes the commit lands exactly once however many times the
    batch is redelivered."""
    import hashlib
    import os

    import pytest

    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        gated_idempotent_sink,
    )

    sink = str(tmp_path / "gate_sink")

    def bars(day: str, kind: str, n: int, base_hour: int = 9):
        rows = [
            (
                f"2024-01-{day} {base_hour + i // 12:02d}:"
                f"{(i % 12) * 5:02d}:00",
                f"2024-01-{day}_{kind}",
                float(100 + i),
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "bar_ts string, session_id string, close double"
        ).select(
            F.to_timestamp("bar_ts").alias("bar_ts"),
            "session_id",
            "close",
        )

    def sink_state():
        out = {}
        for root, _dirs, fs in os.walk(sink):
            for f in fs:
                p = os.path.join(root, f)
                out[os.path.relpath(p, sink)] = hashlib.md5(
                    open(p, "rb").read()
                ).hexdigest()
        return out

    write = gated_idempotent_sink(sink, expected={"D": 24})
    # batch 0: complete day session (24 bars) commits
    write(bars("02", "D", 24), 0)
    committed = sink_state()
    assert committed, "first valid batch did not commit"

    # batch 1: INCOMPLETE session (23 bars) - gate must abort with the
    # sink untouched, byte for byte
    bad = bars("03", "D", 23)
    with pytest.raises(ValueError, match="completeness"):
        write(bad, 1)
    assert sink_state() == committed
    # at-least-once redelivery of the same failing batch: still aborts,
    # still byte-identical (abort-then-retry never half-commits)
    with pytest.raises(ValueError, match="completeness"):
        write(bad, 1)
    assert sink_state() == committed

    # the feed repairs (the missing bar arrives): the SAME batch id now
    # passes and commits exactly once...
    good = bars("03", "D", 24)
    write(good, 1)
    n_after = spark.read.parquet(sink).count()
    assert n_after == 48
    # ...and a post-commit redelivery (crash between commit and
    # checkpoint ack) appends nothing
    write(good, 1)
    assert spark.read.parquet(sink).count() == 48
    assert (
        spark.read.parquet(sink).select("bar_ts").distinct().count()
        == 48
    )
