"""Config-revision restatement against a date-partitioned adjusted
sink (operators/adjust.restate_adjusted_history).

The reference's blind spot being closed: its sink is append-only behind
a watermark (Gate 2, main.py:548-558) while the accumulated offset is a
prefix sum over the config (main.py:210) - so a CORRECTED settlement
row retroactively changes every later contract's offset but the sunk
history silently keeps the stale values. The operator rewrites exactly
the affected date partitions.

Fixture discipline: prices are dyadic rationals (multiples of 0.5) and
roll gaps are small integers, so every float in play is exactly
representable and restated == rebuilt is checked with EXACT equality
(no 1-ulp slack to hide a semantics bug behind).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pytest

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import (
    backadjust,
    derive_accumulated_gap,
    restate_adjusted_history,
    restate_frame,
)
from txf_continuous_data_pipeline_spark.sources.io import (
    write_date_partitioned,
)


def _raw_bars(spark):
    # 21 days x 24 hourly bars starting Monday 2024-01-01; dyadic prices
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), 100.0 + i * 0.5, 10 + i % 7)
        for i in range(21 * 24)
    ]
    return spark.createDataFrame(rows, "bar_id long, ts timestamp, close double, volume long")


def _cfg(spark, diffs):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (
            f"2024w{i + 1}",
            float(d),
            base + dt.timedelta(days=7 * i),
            base + dt.timedelta(days=7 * (i + 1)),
        )
        for i, d in enumerate(diffs)
    ]
    return spark.createDataFrame(
        rows,
        "contract_year_month string, next_contract_diff double, "
        "start_k timestamp, settle_k timestamp",
    )


def _build_sink(spark, path, cfg):
    sunk = backadjust(
        _raw_bars(spark),
        derive_accumulated_gap(cfg),
        ts_col="ts",
        price_cols=("close",),
        end_inclusive=False,
    )
    write_date_partitioned(sunk, str(path), ts_col="ts")


def _file_hashes(path):
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, path)] = hashlib.sha256(
                    fh.read()
                ).hexdigest()
    return out


def _rows(df):
    cols = sorted(c for c in df.columns if c != "_date")
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def sink(spark, tmp_path):
    path = tmp_path / "adjusted"
    old = _cfg(spark, [10, 20, 30])
    new = _cfg(spark, [10, 26, 30])  # week-2 gap corrected 20 -> 26
    _build_sink(spark, path, old)
    return path, old, new


def test_restated_sink_equals_full_rebuild(spark, sink):
    path, old, new = sink
    stats = restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    # week-2's own accumulated offset is the exclusive prefix sum of
    # week 1 - unchanged; weeks 3+ shift by +6. 14 days of hourly bars.
    assert stats["config_changes"] == 1  # only week 3's accumulated moved
    assert stats["restated_rows"] == 7 * 24  # week 3 only
    assert stats["rewritten_partitions"] == 7

    rebuilt = backadjust(
        _raw_bars(spark),
        derive_accumulated_gap(new),
        ts_col="ts",
        price_cols=("close",),
        end_inclusive=False,
    )
    got = _rows(spark.read.parquet(str(path)))
    want = _rows(rebuilt)
    assert got == want  # EXACT - dyadic fixture, see module docstring


def test_untouched_partitions_byte_identical(spark, sink):
    path, old, new = sink
    before = _file_hashes(path)
    restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    after = _file_hashes(path)
    # weeks 1-2 (dates 01-01 .. 01-14) hold no changed row: never opened
    for rel, h in before.items():
        if "_date=2024-01-0" in rel or "_date=2024-01-1" in rel:
            day = rel.split("_date=")[1][:10]
            if day <= "2024-01-14":
                assert after.get(rel) == h, f"untouched {rel} rewritten"
    # weeks 3 dates were rewritten
    changed = {
        rel for rel in before
        if "_date=2024-01-1" in rel and rel.split("_date=")[1][:10] >= "2024-01-15"
    }
    assert changed and any(after.get(rel) != before[rel] for rel in changed)


def test_rerun_is_noop_byte_identical(spark, sink):
    path, old, new = sink
    restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    mid = _file_hashes(path)
    stats = restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    assert stats["restated_rows"] == 0
    assert stats["rewritten_partitions"] == 0
    assert _file_hashes(path) == mid  # nothing opened for write


def test_no_config_change_scans_nothing(spark, sink):
    path, old, _ = sink
    stats = restate_adjusted_history(
        spark, str(path), old, old,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    assert stats == {
        "restated_rows": 0,
        "rewritten_partitions": 0,
        "config_changes": 0,
        "scanned_partitions": 0,
    }


def test_interval_boundary_move_restates_label(spark, sink):
    # a boundary fix (week-2 settles 2 days early, week-3 starts there)
    # moves rows BETWEEN contracts: label and offset both restate
    path, old, _ = sink
    base = dt.datetime(2024, 1, 1)
    new = _cfg(spark, [10, 20, 30])
    cut = base + dt.timedelta(days=12)
    new = new.withColumn(
        "settle_k",
        F.when(F.col("contract_year_month") == "2024w2", F.lit(cut))
        .otherwise(F.col("settle_k")),
    ).withColumn(
        "start_k",
        F.when(F.col("contract_year_month") == "2024w3", F.lit(cut))
        .otherwise(F.col("start_k")),
    )
    stats = restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    # the two moved days (01-13, 01-14) re-label w2 -> w3 and take w3's
    # offset; every other row keeps its values
    assert stats["restated_rows"] == 2 * 24
    assert stats["rewritten_partitions"] == 2
    rebuilt = backadjust(
        _raw_bars(spark),
        derive_accumulated_gap(new),
        ts_col="ts",
        price_cols=("close",),
        end_inclusive=False,
    )
    assert _rows(spark.read.parquet(str(path))) == _rows(rebuilt)


def test_sentinel_settle_date_stays_bounded(spark, sink):
    """A typo'd far-future settle date (year 9999) must not hang the
    driver or explode the plan: the affected-date set is merged
    BETWEEN spans (one clause per changed contract), never a per-day
    literal list (r11 review finding). The restatement itself still
    lands: only partitions with an actual change are rewritten."""
    import time

    path, old, _ = sink
    new = _cfg(spark, [10, 20, 30]).withColumn(
        "settle_k",
        F.when(
            F.col("contract_year_month") == "2024w3",
            F.lit(dt.datetime(9999, 1, 1)),
        ).otherwise(F.col("settle_k")),
    )
    t0 = time.monotonic()
    stats = restate_adjusted_history(
        spark, str(path), old, new,
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    assert time.monotonic() - t0 < 60  # per-day loop would take hours
    # widening week-3's interval changes no row values (same offset,
    # same label for every existing bar), so nothing rewrites - but
    # the span arithmetic reflects the sentinel
    assert stats["config_changes"] == 1
    assert stats["scanned_partitions"] > 2_000_000
    assert stats["restated_rows"] == 0
    assert stats["rewritten_partitions"] == 0
    rebuilt = backadjust(
        _raw_bars(spark),
        derive_accumulated_gap(new),
        ts_col="ts",
        price_cols=("close",),
        end_inclusive=False,
    )
    assert _rows(spark.read.parquet(str(path))) == _rows(rebuilt)


def test_restate_frame_requires_applied_shift_columns(spark):
    bars = _raw_bars(spark)
    with pytest.raises(ValueError, match="accumulated_contract_diff"):
        restate_frame(bars, _cfg(spark, [10, 20, 30]))


def test_config_watch_stream_heals_sunk_history(spark, tmp_path):
    """The streaming automation arm (config_revision_watch_run): a
    revised config snapshot landing on the watch feed restates the
    sunk sink to equal a full rebuild; a replay of the consumed feed
    rewrites nothing."""
    from txf_continuous_data_pipeline_spark.streaming.incremental import (
        config_revision_watch_run,
    )

    sink = tmp_path / "adjusted"
    old = _cfg(spark, [10, 20, 30])
    new = _cfg(spark, [10, 26, 30])
    _build_sink(spark, sink, old)

    feed = str(tmp_path / "cfg_feed")
    os.makedirs(feed)
    # one COMPLETE snapshot per file (the loop's feed contract),
    # written by Spark (micros timestamps - pandas' to_parquet writes
    # nanos the schema'd stream read rejects), mtime-stamped in
    # arrival order (the file source orders batches by mtime)
    import glob
    import shutil
    import time

    cols = [
        "contract_year_month", "next_contract_diff", "start_k",
        "settle_k",
    ]
    now = time.time()
    for i, cfg in enumerate((old, new)):
        stage = str(tmp_path / f"cfg_stage{i}")
        cfg.select(*cols).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*"))[0]
        dst = os.path.join(feed, f"snap{i}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (now + 2 * i, now + 2 * i))

    work = str(tmp_path / "watch")
    cur, mon = config_revision_watch_run(
        spark, feed, work, str(sink),
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )

    rebuilt = backadjust(
        _raw_bars(spark),
        derive_accumulated_gap(new),
        ts_col="ts",
        price_cols=("close",),
        end_inclusive=False,
    )
    assert _rows(spark.read.parquet(str(sink))) == _rows(rebuilt)
    # current state = the latest snapshot
    got_cfg = {
        (r["contract_year_month"], r["next_contract_diff"])
        for r in spark.read.parquet(cur).collect()
    }
    assert got_cfg == {("2024w1", 10.0), ("2024w2", 26.0),
                       ("2024w3", 30.0)}
    monitor = {
        r["batch_id"]: (r["seeded"], r["restated_rows"],
                        r["rewritten_partitions"])
        for r in spark.read.parquet(mon).collect()
    }
    assert monitor[0] == (True, 0, 0)  # seeding batch restates nothing
    assert monitor[1] == (False, 7 * 24, 7)  # week-3 shift applied

    # full replay over the consumed checkpoint: nothing changes
    before = _file_hashes(sink)
    before_cur = _file_hashes(cur)
    config_revision_watch_run(
        spark, feed, work, str(sink),
        ts_col="ts", price_cols=("close",), end_inclusive=False,
    )
    assert _file_hashes(sink) == before
    assert _file_hashes(cur) == before_cur
