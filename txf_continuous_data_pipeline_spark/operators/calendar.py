"""Contract-calendar math (SURVEY.md 2.2 P7-P10, 2.5 A6, 2.6 O3).

Reference (calculate_next_contract, main.py:191-224): take the latest
config row, step to the next contract month (+31 days from month start,
main.py:196-198), settle at the third Wednesday 13:25 (main.py:201-206),
start 5 minutes after the previous settle (main.py:207), roll the
accumulated gap forward (main.py:210), and append the predicted row.

All pure column expressions (third_wednesday is in functions/timefn.py),
so the whole prediction stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import third_wednesday


def settlement_schedule(months: DataFrame, month_col: str = "month_start") -> DataFrame:
    """For a table of month-start dates, derive each contract's settlement
    calendar: contract_year_month, settle_k (3rd Wednesday 13:25), and
    start_k (previous settle + 5 minutes, main.py:206-207).

    The lag window runs over the whole (small) month dimension - this is
    calendar metadata, never fact-scale.
    """
    m = F.col(month_col)
    settle = F.to_timestamp(third_wednesday(m)) + F.expr(
        "INTERVAL 13 HOURS 25 MINUTES"
    )
    w = Window.orderBy(month_col)
    return (
        months.select(
            F.date_format(m, "yyyyMM").alias("contract_year_month"),
            m.alias(month_col),
            settle.alias("settle_k"),
        )
        .withColumn(
            "start_k",
            F.lag("settle_k").over(w) + F.expr("INTERVAL 5 MINUTES"),
        )
    )


def predict_next_contract(cfg: DataFrame) -> DataFrame:
    """One predicted row for the month after the latest config row
    (main.py:193-222): next yyyyMM via +31 days from month start, settle
    3rd Wed 13:25, start = last settle + 5 min, accumulated gap rolled
    forward. Returns a 1-row DataFrame unionable onto cfg (O3)."""
    last = (
        cfg.orderBy(F.desc("settle_k")).limit(1)  # A6: latest config row
    )
    next_month = F.trunc(
        F.date_add(F.trunc(F.to_date(F.col("contract_year_month"), "yyyyMM"), "month"), 31),
        "month",
    )
    settle = F.to_timestamp(third_wednesday(next_month)) + F.expr(
        "INTERVAL 13 HOURS 25 MINUTES"
    )
    return last.select(
        F.date_format(next_month, "yyyyMM").alias("contract_year_month"),
        F.lit(0.0).alias("next_contract_diff"),
        (
            F.col("accumulated_contract_diff") + F.col("next_contract_diff")
        ).alias("accumulated_contract_diff"),
        (F.col("settle_k") + F.expr("INTERVAL 5 MINUTES")).alias("start_k"),
        settle.alias("settle_k"),
    )


def with_predicted_contract(cfg: DataFrame) -> DataFrame:
    """O3: config + the predicted next-contract row (main.py:216-222)."""
    return cfg.unionByName(predict_next_contract(cfg).select(*cfg.columns))


def settlement_halfday_calendar(
    df: DataFrame,
    *,
    session_col: str = "session_id",
    halfday_expected: int = 30,
) -> DataFrame:
    """Exchange-calendar dimension for the calendar-aware Gate 1 (r11
    verdict #5): one (session_id, expected_override) row per
    settlement-day DAY session - each month's third Wednesday, the
    day TAIFEX expires the front contract - carrying the early-close
    expected bar count. The reference's gate is deliberately strict
    (a constant per kind, main.py:331-334); this dimension is the
    OPT-IN refinement completeness_violations accepts so a half-day
    session does not trip a false abort. Derived from the frame's own
    distinct session dates (dimension-sized: one row per session),
    settlement days via the same third_wednesday column expression
    the contract calendar uses (P9) - so the whole dimension stays
    oracle-checkable."""
    sess_date = F.to_date(F.substring_index(F.col(session_col), "_", 1))
    return (
        df.select(session_col)
        .distinct()
        .where(
            (F.substring_index(F.col(session_col), "_", -1) == "D")
            & (sess_date == third_wednesday(sess_date))
        )
        .select(
            F.col(session_col),
            F.lit(int(halfday_expected))
            .cast("long")
            .alias("expected_override"),
        )
    )
