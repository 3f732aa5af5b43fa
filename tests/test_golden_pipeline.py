"""Golden end-to-end test (SURVEY.md section 5 "Golden pipeline test"):
a hand-checkable dense 1-min k-bar fixture pushed through the full chain
A1 -> F3/F4 -> P11/P12 -> J1/A7 -> F7, with literal expected values for
specific bars - covers the boundary semantics the DuckDB oracle also
encodes (closed-right bucketing, midnight wrap, prev-day night labeling,
roll-gap offsets, drop-open-session)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import backadjust
from txf_continuous_data_pipeline_spark.operators.quality import (
    EXPECTED_5MIN,
    drop_open_session,
)
from txf_continuous_data_pipeline_spark.operators.resample import tumbling_ohlcv
from txf_continuous_data_pipeline_spark.operators.sessions import split_and_label
from txf_continuous_data_pipeline_spark.plans.pipeline import weekly_settle_config

BASE = dt.datetime(2024, 3, 4)  # a Monday -> day 5 starts week 2


def _fixture(spark, n_days: int, *, truncate_last_night_at: int | None = None):
    """Close-stamped 1-min bars: day 08:46-13:45 value 100+m, night
    15:01-05:00 value 200+m; optionally cut the last night session short
    to leave an in-progress trailing session."""
    rows = []
    for d in range(n_days):
        day0 = BASE + dt.timedelta(days=d)
        for m in range(300):
            rows.append(Row(ts=day0 + dt.timedelta(hours=8, minutes=46 + m),
                            value=100.0 + m))
        n_night = 840
        if d == n_days - 1 and truncate_last_night_at is not None:
            n_night = truncate_last_night_at
        for m in range(n_night):
            rows.append(Row(ts=day0 + dt.timedelta(hours=15, minutes=1 + m),
                            value=200.0 + m))
    return spark.createDataFrame(rows)


def _run_pipeline(spark, events):
    bars = tumbling_ohlcv(
        events, ts_col="ts", price_col="value", width="5 minutes",
        closed="right", out_ts="bar_ts",
    ).drop("n_rows")
    labeled = split_and_label(bars, "bar_ts")
    cfg = weekly_settle_config(events)
    adjusted = backadjust(labeled, cfg, ts_col="bar_ts", end_inclusive=False)
    return drop_open_session(
        adjusted, EXPECTED_5MIN, session_col="session_id", ts_col="bar_ts"
    )


def test_golden_bars(spark):
    events = _fixture(spark, 8, truncate_last_night_at=100)
    out = _run_pipeline(spark, events)
    rows = {r["bar_ts"]: r for r in out.collect()}

    # --- closed-right bucketing: bar 08:45 of day 1 holds stamps
    # 08:46..08:50 (values 100..104), labeled by its open time
    b = rows[BASE + dt.timedelta(hours=8, minutes=45)]
    assert (b["open"], b["high"], b["low"], b["close"], b["volume"]) == (
        100.0, 104.0, 100.0, 104.0, 5)
    assert b["date_market_type"] == "240304D"
    assert b["session_id"] == "2024-03-04_D"
    assert b["accumulated_contract_diff"] == 0.0  # week 1: no prior roll

    # --- last day bar of day session: 13:40 holds 13:41..13:45
    # (values 395..399)
    b = rows[BASE + dt.timedelta(hours=13, minutes=40)]
    assert (b["open"], b["close"]) == (395.0, 399.0)

    # --- midnight wrap + prev-day labeling: day 1's night session bar
    # at 04:55 (day 2 clock) belongs to 2024-03-04_N
    b = rows[BASE + dt.timedelta(days=1, hours=4, minutes=55)]
    assert b["session_id"] == "2024-03-04_N"
    assert b["date_market_type"] == "240304N"
    # night values: stamps 04:56..05:00 are minutes 835..839 after 15:01
    # -> values 1035..1039
    assert (b["open"], b["close"]) == (1035.0, 1039.0)

    # --- J1/A7: bars in ISO week 2 (from Monday 2024-03-11) carry the
    # accumulated gap of week 1 (weekly_settle_config: +10 per prior week)
    week2_day = BASE + dt.timedelta(days=7)  # Monday of week 2
    b = rows[week2_day + dt.timedelta(hours=8, minutes=45)]
    assert b["accumulated_contract_diff"] == 10.0
    assert (b["open"], b["close"]) == (110.0, 114.0)  # raw 100..104 + 10

    # --- F7: the truncated trailing night session (100 of 840 minutes ->
    # 20 of 168 bars) is dropped entirely
    last_night_id = f"2024-03-{4 + 7:02d}_N"
    assert last_night_id not in {r["session_id"] for r in rows.values()}

    # --- session census: 8 complete day sessions + 7 complete nights
    sessions = out.groupBy("session_id").count().collect()
    counts = {r["session_id"]: r["count"] for r in sessions}
    assert len([s for s in counts if s.endswith("_D")]) == 8
    assert len([s for s in counts if s.endswith("_N")]) == 7
    assert all(
        c == (EXPECTED_5MIN["D"] if s.endswith("_D") else EXPECTED_5MIN["N"])
        for s, c in counts.items()
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    from txf_continuous_data_pipeline_spark.operators.relational import salted_join
    from txf_continuous_data_pipeline_spark.sources import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(orders, "l_orderkey").collect()
    salted = salted_join(
        li, orders, "l_orderkey", salt_src="l_linenumber", n_salts=4
    ).collect()
    key = lambda r: (r["l_orderkey"], r["l_linenumber"])
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))
