"""dedup_stream: an at-least-once feed (a replayed file) must
contribute zero duplicate rows downstream, with state bounded by the
watermark horizon."""

from __future__ import annotations

import glob
import os
import shutil
import time

from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    dedup_stream,
    stage_events_dir,
    stream_events,
)


def test_replayed_file_adds_no_duplicates(spark, sf_dir, tmp_path):
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=3)
    # Replay: re-deliver the FIRST file as a new arrival (same rows,
    # later modification time) - the classic at-least-once failure mode.
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    replay = os.path.join(feed, "replay-" + os.path.basename(parts[0]))
    shutil.copy(parts[0], replay)
    os.utime(replay, (time.time() + 100, time.time() + 100))

    deduped = dedup_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        key_cols=("event_id",),
        delay="10 minutes",
    )
    sink = str(tmp_path / "sink")
    q = (
        deduped.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("parquet")
        .option("path", sink)
        .start()
    )
    finished = q.awaitTermination(120)
    if not finished:
        q.stop()
        raise TimeoutError("streaming dedup run exceeded 120s")
    assert q.exception() is None

    got = spark.read.parquet(sink)
    n_src = read_table(spark, sf_dir, "events").count()
    # every source row exactly once, despite 1/3 of the feed arriving
    # twice
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
