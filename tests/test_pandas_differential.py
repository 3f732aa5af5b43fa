"""Differential tests against pandas itself - the reference's actual
execution engine (main.py is pandas end to end). DuckDB oracle SQL
re-implements the semantics; pandas here WITNESSES them: resample
closed='right'/label='left' (A1, main.py:263), between_time inclusive
bounds incl. the midnight wrap (F3/F4, main.py:268-269), and the
prev-day night label (P11, main.py:281-291) are each checked against
the genuine pandas behavior on boundary-heavy data."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.functions import third_wednesday
from txf_continuous_data_pipeline_spark.operators.resample import (
    tumbling_ohlcv,
)
from txf_continuous_data_pipeline_spark.operators.sessions import (
    day_session,
    night_session,
    with_session_labels,
)


def _boundary_minutes():
    """1-min-ish bars crossing every boundary the reference cares
    about: bucket edges (xx:x0:00 exactly), the 08:45/13:45 day-session
    bounds, the 15:00/05:00 night bounds, and midnight."""
    base = dt.datetime(2024, 1, 10, 0, 0, 0)
    stamps = []
    # full half-days of 1-min bars around the interesting edges
    for start, minutes in [
        (dt.datetime(2024, 1, 10, 8, 40), 20),   # day-session open edge
        (dt.datetime(2024, 1, 10, 13, 40), 20),  # day-session close edge
        (dt.datetime(2024, 1, 10, 14, 55), 20),  # night open edge
        (dt.datetime(2024, 1, 10, 23, 50), 30),  # midnight wrap
        (dt.datetime(2024, 1, 11, 4, 50), 25),   # night close edge 05:00
    ]:
        stamps += [start + dt.timedelta(minutes=i) for i in range(minutes)]
    # plus exact second/microsecond boundary probes
    stamps += [
        dt.datetime(2024, 1, 10, 9, 0, 0),
        dt.datetime(2024, 1, 10, 9, 0, 0, 1),
        dt.datetime(2024, 1, 10, 9, 4, 59, 999999),
        dt.datetime(2024, 1, 10, 9, 5, 0),
        dt.datetime(2024, 1, 11, 5, 0, 0),          # included in night
        dt.datetime(2024, 1, 11, 5, 0, 0, 1),       # excluded
        dt.datetime(2024, 1, 10, 8, 45, 0),          # day open inclusive
        dt.datetime(2024, 1, 10, 13, 45, 0),         # day close inclusive
    ]
    stamps = sorted(set(stamps))
    return pd.DataFrame(
        {"ts": stamps, "value": [float(i % 97) for i in range(len(stamps))]}
    )


@pytest.fixture(scope="module")
def pdf():
    return _boundary_minutes()


@pytest.fixture()
def sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def test_ohlcv_matches_pandas_resample(spark, pdf, sdf):
    # Reference semantics exactly as written at main.py:263-265.
    ref = (
        pdf.set_index("ts")["value"]
        .resample("5min", label="left", closed="right")
        .agg(["first", "max", "min", "last", "count"])
        .dropna()
    )
    got = {
        r["bar_ts"]: r
        for r in tumbling_ohlcv(
            sdf, ts_col="ts", price_col="value", width="5 minutes",
            closed="right", out_ts="bar_ts",
        ).collect()
    }
    assert set(got) == set(ref.index.to_pydatetime())
    for ts, row in ref.iterrows():
        g = got[ts.to_pydatetime()]
        assert g["open"] == row["first"], ts
        assert g["high"] == row["max"], ts
        assert g["low"] == row["min"], ts
        assert g["close"] == row["last"], ts
        assert g["volume"] == row["count"], ts


def test_session_filters_match_pandas_between_time(pdf, sdf):
    idx = pdf.set_index("ts")
    ref_day = set(idx.between_time("08:45", "13:45").index.to_pydatetime())
    ref_night = set(idx.between_time("15:00", "05:00").index.to_pydatetime())
    got_day = {r["ts"] for r in day_session(sdf, "ts").collect()}
    got_night = {r["ts"] for r in night_session(sdf, "ts").collect()}
    assert got_day == ref_day
    assert got_night == ref_night


def test_night_label_matches_reference_rule(pdf, sdf):
    # get_market_date_str (main.py:281-291): night bars before 05:00
    # are stamped with the PREVIOUS day; D/N by time-of-day.
    def ref_label(ts):
        if 8 <= ts.hour <= 13:
            kind, d = "D", ts.date()
        elif ts.hour >= 15 or ts.hour < 5:
            kind, d = "N", (ts - dt.timedelta(days=1)).date() if ts.hour < 5 else ts.date()
        else:
            return None
        return d.strftime("%y%m%d") + kind

    got = {
        r["ts"]: r["date_market_type"]
        for r in with_session_labels(sdf, "ts").collect()
    }
    for ts in pdf["ts"]:
        want = ref_label(ts)
        if want is not None:
            assert got[ts] == want, ts


def test_third_wednesday_properties(spark):
    # P9 (main.py:201-204): result is a Wednesday, in days 15-21 of the
    # SAME month - for every month across leap and non-leap years.
    months = [
        dt.date(y, m, 1) for y in (2023, 2024, 2025, 2028) for m in range(1, 13)
    ]
    df = spark.createDataFrame([(d,) for d in months], "m date")
    rows = df.select("m", third_wednesday(F.col("m")).alias("w")).collect()
    for r in rows:
        w = r["w"]
        assert w.weekday() == 2, r
        assert 15 <= w.day <= 21, r
        assert (w.year, w.month) == (r["m"].year, r["m"].month), r
