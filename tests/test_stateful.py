"""applyInPandasWithState sessionizer: every emitted session must agree
with the batch twin (session_stats), sessions closed by the watermark in
force during the last data batch must all be emitted, and re-runs from
the same checkpoint must never emit a session key twice."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.relational import session_stats
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming import stage_events_dir
from txf_continuous_data_pipeline_spark.streaming.incremental import stream_events
from txf_continuous_data_pipeline_spark.streaming.stateful import (
    stateful_session_stream,
)

GAP = "30 minutes"
DELAY = "10 minutes"
COLS = ["user_id", "session_start", "session_end", "n_events"]


def _batch_sessions(spark, sf_dir):
    return session_stats(
        read_table(spark, sf_dir, "events"), key_col="user_id", ts_col="ts",
        gap=GAP,
    ).select(*COLS)


def _run(spark, feed, sink, ckpt):
    sessions = stateful_session_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        key_col="user_id", ts_col="ts", gap=GAP, delay=DELAY,
    )
    q = (
        sessions.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("stateful stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)

    _run(spark, feed, sink, ckpt)
    got = {tuple(r) for r in spark.read.parquet(sink).select(*COLS).collect()}
    assert got, "no sessions emitted"

    batch = {tuple(r) for r in _batch_sessions(spark, sf_dir).collect()}
    assert got <= batch, "stream emitted sessions that disagree with batch"

    # Lower bound: sessions whose close condition (last event + gap) fell
    # below the watermark of the LAST data batch (max ts of the first n-1
    # files - delay) must all be out, whether or not the final no-data
    # flush batch ran.
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    wm = spark.read.parquet(*parts[:-1]).agg(F.max("ts")).collect()[0][0]
    want = {
        tuple(r)
        for r in _batch_sessions(spark, sf_dir)
        .where(
            F.col("session_end") + F.expr(f"INTERVAL {GAP}")
            < F.lit(wm) - F.expr(f"INTERVAL {DELAY}")
        )
        .collect()
    }
    assert want <= got, f"missing {len(want - got)} finalized sessions"

    # Re-run from the same checkpoint: residual state may flush, but no
    # session key may appear twice and values must stay batch-consistent.
    _run(spark, feed, sink, ckpt)
    final = spark.read.parquet(sink)
    n = final.count()
    assert (
        final.select("user_id", "session_start").distinct().count() == n
    ), "duplicate sessions emitted"
    assert {tuple(r) for r in final.select(*COLS).collect()} <= batch


FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FCOLS = ["user_id", "step_idx", "step", "ts"]


def _batch_funnel(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.relational import (
        funnel_step_times,
    )

    return funnel_step_times(
        read_table(spark, sf_dir, "events"), FUNNEL_STEPS
    ).select(*FCOLS)


def _run_funnel(spark, feed, sink, ckpt):
    from txf_continuous_data_pipeline_spark.streaming.stateful import (
        stateful_funnel_stream,
    )

    adv = stateful_funnel_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        FUNNEL_STEPS,
        delay=DELAY,
    )
    q = (
        adv.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("funnel stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()


def test_stateful_funnel_matches_batch(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "fsink")
    ckpt = str(tmp_path / "fckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "ffeed"), n_files=4)

    _run_funnel(spark, feed, sink, ckpt)
    got = {tuple(r) for r in spark.read.parquet(sink).select(*FCOLS).collect()}
    assert got, "no advances emitted"

    batch = {tuple(r) for r in _batch_funnel(spark, sf_dir).collect()}
    assert got <= batch, "stream emitted advances that disagree with batch"

    # advances finalized by the last data batch's watermark must be out
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    wm = spark.read.parquet(*parts[:-1]).agg(F.max("ts")).collect()[0][0]
    want = {
        tuple(r)
        for r in _batch_funnel(spark, sf_dir)
        .where(F.col("ts") < F.lit(wm) - F.expr(f"INTERVAL {DELAY}"))
        .collect()
    }
    assert want <= got, f"missing {len(want - got)} finalized advances"

    # exactly-once: no (user, step_idx) twice, even after a re-run
    _run_funnel(spark, feed, sink, ckpt)
    final = spark.read.parquet(sink)
    n = final.count()
    assert final.select("user_id", "step_idx").distinct().count() == n
    assert {tuple(r) for r in final.select(*FCOLS).collect()} <= batch


def test_funnel_step_times_consistent_with_counts(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.relational import (
        funnel_counts,
    )

    ev = read_table(spark, sf_dir, "events")
    counts = {
        r.step_idx: r.users
        for r in funnel_counts(ev, FUNNEL_STEPS).collect()
    }
    times = (
        _batch_funnel(spark, sf_dir)
        .groupBy("step_idx")
        .count()
        .collect()
    )
    assert {r.step_idx: r["count"] for r in times} == counts


def test_stateful_sessions_handle_disordered_feed(spark, tmp_path):
    """Cross-batch disorder within the watermark delay must not split
    sessions or freeze session_start: a late-but-on-time event arriving
    one batch later still lands in its session (the fold-on-arrival
    form this replaced emitted a wrong early fragment here)."""
    import datetime as dt
    import glob as _glob
    import os as _os
    import time as _time

    from txf_continuous_data_pipeline_spark.operators.relational import (
        session_stats,
    )
    from txf_continuous_data_pipeline_spark.streaming.stateful import (
        stateful_session_stream,
    )

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    batches = [
        [(1, t(10, 0), 7, "view", 1.0, "{}"), (2, t(10, 5), 7, "view", 1.0, "{}")],
        # 10:02 is OLDER than batch 1's max but on time (delay 10m);
        # 10:40 opens the next session (gap 30m)
        [(3, t(10, 2), 7, "view", 1.0, "{}"), (4, t(10, 40), 7, "view", 1.0, "{}")],
        # pushes the watermark past 10:05 + gap so session 1 finalizes
        [(5, t(11, 30), 7, "view", 1.0, "{}")],
    ]
    feed = str(tmp_path / "dfeed")
    _os.makedirs(feed)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    all_rows = [r for b in batches for r in b]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{feed}/b{i}"
        )
    # flatten into one dir with arrival-ordered mtimes
    now = _time.time()
    k = 0
    for i in range(len(batches)):
        for f in sorted(_glob.glob(f"{feed}/b{i}/part-*")):
            dst = f"{feed}/part-{k:03d}.parquet"
            _os.rename(f, dst)
            _os.utime(dst, (now + 2 * k, now + 2 * k))
            k += 1

    sink, ckpt = str(tmp_path / "dsink"), str(tmp_path / "dckpt")
    q = (
        stateful_session_stream(
            stream_events(spark, feed, max_files_per_trigger=1),
            gap=GAP, delay=DELAY,
        )
        .writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("disordered stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()

    got = {tuple(r) for r in spark.read.parquet(sink).select(*COLS).collect()}
    batch_df = spark.createDataFrame(all_rows, schema)
    want_all = {
        tuple(r)
        for r in session_stats(batch_df, key_col="user_id", ts_col="ts", gap=GAP)
        .select(*COLS)
        .collect()
    }
    # every emitted session must be batch-exact (the late 10:02 event
    # inside session 1, not a split fragment)...
    assert got <= want_all, f"stream={got} batch={want_all}"
    # ...and session 1 (finalized by the 11:30 watermark) must be out,
    # with all 3 events
    s1 = next(s for s in want_all if s[3] == 3)
    assert s1 in got, f"finalized 3-event session missing: {got}"


SCD2_COLS = ["user_id", "event_type", "valid_from", "valid_to"]


def _batch_scd2(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.linkage import scd2_build

    return scd2_build(
        read_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_type", "event_id"
        ),
        key_col="user_id", ts_col="ts", attr_col="event_type",
        tiebreak_col="event_id",
    )


def _run_scd2(spark, feed, sink, ckpt):
    from txf_continuous_data_pipeline_spark.streaming.stateful import (
        stateful_scd2_stream,
    )

    hist = stateful_scd2_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        key_col="user_id", delay=DELAY,
    )
    q = (
        hist.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("scd2 stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()


def test_stateful_scd2_matches_batch(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)

    _run_scd2(spark, feed, sink, ckpt)
    got = {
        tuple(r) for r in spark.read.parquet(sink).select(*SCD2_COLS).collect()
    }
    assert got, "no intervals emitted"

    closed_batch = {
        tuple(r)
        for r in _batch_scd2(spark, sf_dir)
        .where(F.col("valid_to").isNotNull())
        .select(*SCD2_COLS)
        .collect()
    }
    assert got <= closed_batch, "stream emitted intervals batch disagrees with"

    # Lower bound: intervals whose CLOSING event fell below the last
    # data batch's watermark must all be out.
    parts = sorted(glob.glob(os.path.join(feed, "part-*")))
    wm = spark.read.parquet(*parts[:-1]).agg(F.max("ts")).collect()[0][0]
    want = {
        tuple(r)
        for r in _batch_scd2(spark, sf_dir)
        .where(F.col("valid_to") < F.lit(wm) - F.expr(f"INTERVAL {DELAY}"))
        .select(*SCD2_COLS)
        .collect()
    }
    assert want <= got, f"missing {len(want - got)} finalized intervals"

    # Re-run from the same checkpoint: no duplicate intervals, still
    # batch-consistent.
    _run_scd2(spark, feed, sink, ckpt)
    final = spark.read.parquet(sink)
    n = final.count()
    assert (
        final.select("user_id", "valid_from").distinct().count() == n
    ), "duplicate intervals emitted"
    assert {tuple(r) for r in final.select(*SCD2_COLS).collect()} <= closed_batch


def test_stateful_heavy_hitters_mg_bounds(spark, sf_dir, tmp_path):
    """Misra-Gries streaming sketch vs exact batch counts: per shard,
    est <= true <= est + dec for every surfaced item, and every item
    with true shard count > n_shard/(capacity+1) is surfaced."""
    from txf_continuous_data_pipeline_spark.streaming.stateful import (
        stateful_heavy_hitters_stream,
    )

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)

    N_SHARDS, CAP = 4, 8
    hh = stateful_heavy_hitters_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        item_col="user_id", n_shards=N_SHARDS, capacity=CAP,
    )
    q = (
        hh.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("heavy-hitter stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()

    out = spark.read.parquet(sink)
    latest = out.join(
        out.groupBy("shard").agg(F.max("version").alias("version")),
        ["shard", "version"],
    )
    sketch = {
        (r["shard"], r["item"]): (r["est"], r["dec"])
        for r in latest.collect()
    }
    assert sketch, "no sketch rows emitted"

    events = read_table(spark, sf_dir, "events").select(
        F.pmod(F.xxhash64("user_id"), F.lit(N_SHARDS))
        .cast("int")
        .alias("shard"),
        F.col("user_id").alias("item"),
    )
    true_counts = {
        (r["shard"], r["item"]): r["n"]
        for r in events.groupBy("shard", "item").count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    shard_totals = {}
    for (sh, _it), n in true_counts.items():
        shard_totals[sh] = shard_totals.get(sh, 0) + n

    for (sh, it), (est, dec) in sketch.items():
        true = true_counts[(sh, it)]
        assert est <= true <= est + dec, (sh, it, est, dec, true)
    for (sh, it), true in true_counts.items():
        if true > shard_totals[sh] / (CAP + 1):
            assert (sh, it) in sketch, (
                f"guaranteed heavy hitter {(sh, it)} missing "
                f"(true={true}, bound={shard_totals[sh] / (CAP + 1):.1f})"
            )


def test_stateful_group_stats_match_batch_moments(spark, sf_dir, tmp_path):
    """Welford/Chan streaming moments: the latest version per group
    must equal the batch avg/stddev_samp to FP tolerance."""
    import math

    from txf_continuous_data_pipeline_spark.streaming.stateful import (
        stateful_group_stats_stream,
    )

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    feed = stage_events_dir(spark, sf_dir, str(tmp_path / "feed"), n_files=4)

    st = stateful_group_stats_stream(
        stream_events(spark, feed, max_files_per_trigger=1),
        group_col="event_type", value_col="value",
    )
    q = (
        st.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", sink)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
        raise TimeoutError("group-stats stream exceeded 120s")
    if q.exception() is not None:
        raise q.exception()

    out = spark.read.parquet(sink)
    latest = out.join(
        out.groupBy("group").agg(F.max("version").alias("version")),
        ["group", "version"],
    )
    got = {
        r["group"]: (r["n"], r["mean"], r["m2"]) for r in latest.collect()
    }
    want = {
        r["event_type"]: (r["n"], r["m"], r["sd"])
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("m"),
            F.stddev_samp("value").alias("sd"),
        )
        .collect()
    }
    assert got.keys() == want.keys()
    for g, (n, mean, m2) in got.items():
        wn, wm, wsd = want[g]
        assert n == wn
        assert math.isclose(mean, wm, rel_tol=1e-9)
        assert math.isclose(
            math.sqrt(m2 / (n - 1)), wsd, rel_tol=1e-9
        ), g
