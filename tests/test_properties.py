"""Property tests for the pipeline's gates (SURVEY.md section 5):

  (a) idempotency - running the incremental batch load twice appends
      nothing the second time (Gate 2, main.py:548-558);
  (b) completeness - removing any single bar from a closed session trips
      Gate 1 (check_completeness, main.py:369-401);
  (c) roll continuity - back-adjustment removes the price gap at every
      contract roll boundary (the purpose of the whole reference
      pipeline, README "back-adjust").
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import (
    backadjust,
    derive_accumulated_gap,
)
from txf_continuous_data_pipeline_spark.operators.quality import (
    EXPECTED_5MIN,
    assert_complete,
    completeness_violations,
)
from txf_continuous_data_pipeline_spark.operators.sessions import split_and_label
from txf_continuous_data_pipeline_spark.plans.pipeline import incremental_run
from txf_continuous_data_pipeline_spark.sources import read_table


def test_incremental_run_is_idempotent(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "sink")
    n1 = incremental_run(spark, sf_dir, sink)
    assert n1 > 0
    n2 = incremental_run(spark, sf_dir, sink)
    assert n2 == 0, f"second run appended {n2} rows"
    total = spark.read.parquet(sink).count()
    assert total == n1


def _dense_kbar_fixture(spark, n_days: int = 2):
    """A reference-shaped 1-min k-bar feed: close-stamped minutes
    08:46-13:45 (day, 300 rows -> 60 five-min bars) and 15:01-05:00
    (night, 840 rows -> 168 bars) for n_days consecutive days - the
    exact cadence behind the Gate-1 expected counts (main.py:331-334)."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 3, 4)  # a Monday
    for d in range(n_days):
        day0 = base + dt.timedelta(days=d)
        for m in range(300):  # 08:46 .. 13:45
            rows.append(
                Row(ts=day0 + dt.timedelta(hours=8, minutes=46 + m), value=100.0 + m)
            )
        for m in range(840):  # 15:01 .. 05:00 next day
            rows.append(
                Row(ts=day0 + dt.timedelta(hours=15, minutes=1 + m), value=200.0 + m)
            )
    return spark.createDataFrame(rows)


def _complete_sessions(spark):
    """Bar-level rows of sessions that pass Gate 1 at 5-min granularity."""
    from txf_continuous_data_pipeline_spark.operators.quality import (
        drop_incomplete_sessions,
    )
    from txf_continuous_data_pipeline_spark.operators.resample import tumbling_ohlcv

    events = _dense_kbar_fixture(spark)
    bars = tumbling_ohlcv(
        events, ts_col="ts", price_col="value", width="5 minutes",
        closed="right", out_ts="bar_ts",
    ).drop("n_rows")
    labeled = split_and_label(bars, "bar_ts")
    return drop_incomplete_sessions(labeled, EXPECTED_5MIN)


def test_dropping_any_bar_trips_gate1(spark):
    complete = _complete_sessions(spark).persist()
    try:
        assert complete.count() > 0, "fixture needs at least one complete session"
        assert completeness_violations(complete, EXPECTED_5MIN).isEmpty()

        # drop one arbitrary bar from each of three different sessions
        w = Window.partitionBy("session_id").orderBy("bar_ts")
        victims = (
            complete.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 7)
            .select("session_id", "bar_ts")
            .limit(3)
        )
        broken = complete.join(victims, ["session_id", "bar_ts"], "left_anti")
        viol = completeness_violations(broken, EXPECTED_5MIN)
        tripped = {r["session_id"] for r in viol.collect()}
        assert {r["session_id"] for r in victims.collect()} <= tripped
        with pytest.raises(ValueError):
            assert_complete(broken, EXPECTED_5MIN)
    finally:
        complete.unpersist()


def test_backadjust_removes_roll_gap(spark):
    """Construct two contracts with a known price gap at the roll and
    check the adjusted series is continuous across the boundary.

    Convention (main.py:210): accumulated[i+1] = accumulated[i] +
    next_diff[i], applied additively to each bar of contract i+1 - so
    continuity requires next_diff = (last price of old contract) -
    (first price of new contract): the new contract is lifted onto the
    old contract's level.
    """
    GAP = 50.0  # old trades at 1000, new at 950 -> next_diff = +50
    rows = []
    # contract A: price 1000 flat, minutes 0..9; roll; contract B: 950 flat
    for m in range(10):
        rows.append(Row(ts=f"2024-01-01 09:{m:02d}:00", price=1000.0))
    for m in range(10, 20):
        rows.append(Row(ts=f"2024-01-01 09:{m:02d}:00", price=950.0))
    bars = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))

    cfg = spark.createDataFrame(
        [
            Row(
                contract_year_month="202401A",
                next_contract_diff=GAP,
                start_k="2024-01-01 09:00:00",
                settle_k="2024-01-01 09:09:00",
            ),
            Row(
                contract_year_month="202401B",
                next_contract_diff=0.0,
                start_k="2024-01-01 09:10:00",
                settle_k="2024-01-01 09:19:00",
            ),
        ]
    ).select(
        "contract_year_month",
        "next_contract_diff",
        F.to_timestamp("start_k").alias("start_k"),
        F.to_timestamp("settle_k").alias("settle_k"),
    )
    # derived accumulated: A (first) gets 0, B gets next_diff(A) = +50
    cfg = derive_accumulated_gap(cfg)

    adj = backadjust(
        bars, cfg, ts_col="ts", price_cols=("price",), end_inclusive=True
    ).orderBy("ts")
    prices = [r["price"] for r in adj.collect()]
    steps = [b - a for a, b in zip(prices, prices[1:])]
    boundary_step = steps[9]
    assert boundary_step == 0.0, f"roll gap survived adjustment: {steps}"
    # and within-contract steps stay zero
    assert all(s == 0.0 for i, s in enumerate(steps) if i != 9), steps
