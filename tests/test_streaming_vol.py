"""Streaming twin of the session risk+execution+flow surface
(streaming/incremental.realized_vol_ingest_run): per-batch monitor
rows (vol/ATR/vwap/flow-imbalance) per touched session over the
continuous adjusted series, riding the Gate-2 bar-ingest loop. Stream's final row per session must equal the
batch fold of the SAME operators over the same sunk bars, and a full
replay must append/rewrite nothing."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import backadjust
from txf_continuous_data_pipeline_spark.operators.returns import (
    continuous_log_returns,
    order_flow_imbalance,
    session_atr,
    session_realized_vol,
    session_vwap,
)
from txf_continuous_data_pipeline_spark.operators.sessions import (
    split_and_label,
)
from txf_continuous_data_pipeline_spark.plans.pipeline import (
    weekly_settle_config,
)
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.streaming.incremental import (
    realized_vol_ingest_run,
    stage_events_dir,
)


def _tree_hashes(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, path)] = hashlib.sha256(
                    fh.read()
                ).hexdigest()
    return out


def _batch_fold_vol(spark, bars_dir, cfg):
    """The batch computation over the sunk bars, composed from the
    exact operators the stream's monitor uses (realized vol + ATR +
    vwap)."""
    stored = spark.read.parquet(bars_dir)
    adjusted = backadjust(
        split_and_label(stored, "bar_ts"),
        cfg,
        ts_col="bar_ts",
        end_inclusive=False,
    ).where(
        F.substring_index(F.col("session_id"), "_", -1) != "UNKNOWN"
    )
    vol = session_realized_vol(continuous_log_returns(adjusted))
    atr = session_atr(adjusted, n=14).select(
        "session_id", "true_range", "atr_14"
    )
    flow = order_flow_imbalance(adjusted).select(
        "session_id", "buy_volume", "sell_volume",
        "neutral_volume", "flow_imbalance",
    )
    return (
        session_vwap(adjusted)
        .join(vol, "session_id", "left")
        .join(atr, "session_id", "left")
        .join(flow, "session_id", "left")
    )


def test_stream_vol_equals_batch_fold_and_replay_is_noop(
    spark, sf_dir, tmp_path
):
    events = read_table(spark, sf_dir, "events")
    cfg = weekly_settle_config(events)
    feed = stage_events_dir(
        spark, sf_dir, str(tmp_path / "feed"), n_files=4
    )
    work = str(tmp_path / "work")

    bars_dir, mon_dir = realized_vol_ingest_run(spark, feed, work, cfg)

    # final monitor row per session = the row from the LAST batch that
    # touched it (later batches supersede as more bars close)
    mon = spark.read.parquet(mon_dir)
    last = mon.groupBy("session_id").agg(
        F.max("batch_id").alias("batch_id")
    )
    cols = [
        "session_id", "vwap", "volume", "notional", "n_returns",
        "realized_vol", "max_abs_return", "true_range", "atr_14",
        "buy_volume", "sell_volume", "neutral_volume",
        "flow_imbalance",
    ]
    final = {
        tuple(r[c] for c in cols)
        for r in mon.join(last, ["session_id", "batch_id"]).collect()
    }
    want = {
        tuple(r[c] for c in cols)
        for r in _batch_fold_vol(spark, bars_dir, cfg).collect()
    }
    assert final == want and want

    # a session spanning several batches must have been UPDATED (the
    # monitor is live, not a one-shot report)
    n_rows = mon.count()
    n_sessions = mon.select("session_id").distinct().count()
    assert n_rows > n_sessions, "no session ever updated across batches"

    # full replay over the consumed checkpoint: nothing is appended to
    # the bar sink and no monitor partition is rewritten
    limits_dir = os.path.join(work, "limits")
    before_bars = _tree_hashes(bars_dir)
    before_mon = _tree_hashes(mon_dir)
    before_lim = _tree_hashes(limits_dir)
    realized_vol_ingest_run(spark, feed, work, cfg)
    assert _tree_hashes(bars_dir) == before_bars
    assert _tree_hashes(mon_dir) == before_mon
    assert _tree_hashes(limits_dir) == before_lim


def test_stream_limits_feed_equals_batch_fold(spark, sf_dir, tmp_path):
    """The limits/batch=<id> feed: final row per (session, contract)
    must equal price_limit_report over the same sunk bars - the shared
    operator plus the Gate-2 freeze argument, pinned end to end."""
    from txf_continuous_data_pipeline_spark.operators.returns import (
        price_limit_report,
    )

    events = read_table(spark, sf_dir, "events")
    cfg = weekly_settle_config(events)
    feed = stage_events_dir(
        spark, sf_dir, str(tmp_path / "feed"), n_files=4
    )
    work = str(tmp_path / "work")
    bars_dir, _ = realized_vol_ingest_run(spark, feed, work, cfg)

    lim = spark.read.parquet(os.path.join(work, "limits"))
    last = lim.groupBy("session_id", "contract_year_month").agg(
        F.max("batch_id").alias("batch_id")
    )
    cols = [
        "session_id", "contract_year_month", "prev_close",
        "max_up_pct", "max_down_pct", "limit_up_touch",
        "limit_down_touch",
    ]
    final = {
        tuple(r[c] for c in cols)
        for r in lim.join(
            last, ["session_id", "contract_year_month", "batch_id"]
        ).collect()
    }
    stored = spark.read.parquet(bars_dir)
    adjusted = backadjust(
        split_and_label(stored, "bar_ts"),
        cfg,
        ts_col="bar_ts",
        end_inclusive=False,
    ).where(
        F.substring_index(F.col("session_id"), "_", -1) != "UNKNOWN"
    )
    want = {
        tuple(r[c] for c in cols)
        for r in price_limit_report(adjusted).collect()
    }
    assert final == want and want


def test_volume_clock_stream_equals_batch_minus_pending(
    spark, sf_dir, tmp_path
):
    """The live volume clock (fixed threshold): the final batch dir
    must equal the batch operator over the same sunk bars MINUS its
    pending tail bucket, completed buckets must accrue across batches
    (append-only boundaries), and a full replay rewrites nothing."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        volume_clock_bars,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        volume_clock_ingest_run,
    )

    events = read_table(spark, sf_dir, "events")
    cfg = weekly_settle_config(events)
    feed = stage_events_dir(
        spark, sf_dir, str(tmp_path / "feed"), n_files=4
    )
    work = str(tmp_path / "work")
    bars_dir, vbars_dir = volume_clock_ingest_run(
        spark, feed, work, cfg, bucket_volume=40
    )

    vb = spark.read.parquet(vbars_dir)
    last_batch = vb.agg(F.max("batch_id").alias("b")).collect()[0]["b"]
    data_cols = sorted(
        c for c in vb.columns if c not in ("batch_id", "batch")
    )
    final = {
        tuple(r[c] for c in data_cols)
        for r in vb.where(F.col("batch_id") == last_batch).collect()
    }

    stored = spark.read.parquet(bars_dir)
    adjusted = backadjust(
        split_and_label(stored, "bar_ts"),
        cfg,
        ts_col="bar_ts",
        end_inclusive=False,
    ).where(
        F.substring_index(F.col("session_id"), "_", -1) != "UNKNOWN"
    )
    batch_vb = volume_clock_bars(adjusted, bucket_volume=40)
    pending = batch_vb.agg(F.max("vbar_seq").alias("p")).collect()[0][
        "p"
    ]
    want = {
        tuple(r[c] for c in data_cols)
        for r in batch_vb.where(
            F.col("vbar_seq") < pending
        ).collect()
    }
    assert final == want and want

    # boundaries are append-only UNDER IN-ORDER DELIVERY (this staged
    # feed is in-order): every batch's completed set must be a
    # VALUE-IDENTICAL prefix (by vbar_seq) of the final one - not just
    # the same count (review finding: a restated bucket would keep
    # countDistinct equal while values differ)
    seq_i = data_cols.index("vbar_seq")
    final_by_seq = {row[seq_i]: row for row in final}
    batch_ids = [
        r["batch_id"]
        for r in vb.select("batch_id").distinct().collect()
    ]
    for b in sorted(batch_ids):
        batch_rows = {
            tuple(r[c] for c in data_cols)
            for r in vb.where(F.col("batch_id") == b).collect()
        }
        for row in batch_rows:
            assert row == final_by_seq[row[seq_i]], (b, row)

    # full replay: no bar appended, no vbars partition rewritten
    before_bars = _tree_hashes(bars_dir)
    before_vb = _tree_hashes(vbars_dir)
    volume_clock_ingest_run(spark, feed, work, cfg, bucket_volume=40)
    assert _tree_hashes(bars_dir) == before_bars
    assert _tree_hashes(vbars_dir) == before_vb


def test_out_of_order_admission_rewrites_downstream_sessions(
    spark, sf_dir
):
    """r11 advice (medium): the monitor's freeze argument only held
    for session-local metrics. ATR(14), the first-bar log return, and
    the limits prev_close lag are cross-session - a late-admitted bar
    for an earlier session Y (the gate admits those via its keyed
    anti-join) must also rewrite the downstream sessions whose rows
    depend on Y, or they stay permanently stale vs the batch fold.
    Simulated at the exact production frames (_monitor_frames +
    _monitor_touch_closure): seed last-write state from a snapshot
    MISSING a middle session Y (every session directly touched, as a
    prior run would have), then admit Y against the full snapshot
    touching ONLY Y. Closure on: merged state == batch fold for every
    session. Closure off (the pre-fix behavior): the merged state
    must DIFFER - pinning that the closure is load-bearing, not
    decorative."""
    from txf_continuous_data_pipeline_spark.operators.resample import (
        tumbling_ohlcv,
    )
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        _monitor_frames,
        _monitor_touch_closure,
    )

    events = read_table(spark, sf_dir, "events")
    cfg = weekly_settle_config(events)
    bars = tumbling_ohlcv(
        events, ts_col="ts", price_col="value",
        width="5 minutes", closed="right", out_ts="bar_ts",
    ).drop("n_rows")
    full = backadjust(
        split_and_label(bars, "bar_ts"),
        cfg,
        ts_col="bar_ts",
        end_inclusive=False,
    ).where(
        F.substring_index(F.col("session_id"), "_", -1) != "UNKNOWN"
    ).persist()
    order = [
        r["session_id"]
        for r in full.groupBy("session_id")
        .agg(F.min("bar_ts").alias("s"))
        .orderBy("s")
        .collect()
    ]
    assert len(order) >= 6, "need enough sessions to stage a gap"
    y = order[len(order) // 2]

    def _rows(df, key_cols):
        data = sorted(c for c in df.columns)
        kidx = [data.index(k) for k in key_cols]
        out = {}
        for r in df.collect():
            t = tuple(r[c] for c in data)
            out[tuple(t[i] for i in kidx)] = t
        return out

    # batch fold over the full series = the ground truth final state
    want_mon, want_lim = _monitor_frames(full, order)
    want_mon = _rows(want_mon, ["session_id"])
    want_lim = _rows(
        want_lim, ["session_id", "contract_year_month"]
    )

    # seed: a prior run that never saw Y, every session touched
    snap1 = full.where(F.col("session_id") != y)
    t1 = [s for s in order if s != y]
    mon1, lim1 = _monitor_frames(snap1, t1)
    state_mon = _rows(mon1, ["session_id"])
    state_lim = _rows(lim1, ["session_id", "contract_year_month"])

    # the late admission WITHOUT the closure: stale downstream rows
    mon_bare, lim_bare = _monitor_frames(full, [y])
    broken_mon = dict(state_mon)
    broken_mon.update(_rows(mon_bare, ["session_id"]))
    assert broken_mon != want_mon, (
        "staging failed: Y's admission did not perturb any downstream "
        "row, the closure test would be vacuous"
    )

    # the late admission WITH the closure: every dependent rewritten
    closure = _monitor_touch_closure(full, [y])
    assert y in closure and len(closure) > 1
    mon2, lim2 = _monitor_frames(full, closure)
    state_mon.update(_rows(mon2, ["session_id"]))
    state_lim.update(_rows(lim2, ["session_id", "contract_year_month"]))
    full.unpersist()

    assert state_mon == want_mon
    assert state_lim == want_lim
