"""Pure column-expression time/session helpers.

These replace the reference's three row-wise Python lambdas
(get_market_date_str main.py:281-291, get_group_id main.py:341-345 and its
duplicate :380-385) with codegen-friendly Spark column expressions - no
Python UDFs (SURVEY.md section 2.8). The reference defines get_group_id
twice, identically; this engine defines it once.

Session model (main.py:68-71): day session 08:45-13:45, night session
15:00-05:00(+1 day). Bars in the night session before 05:00 belong to the
PREVIOUS calendar day's session (main.py:285).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_DAY = 86_400 * 1_000_000


def _hm_micros(hm: str) -> int:
    """'08:45' or '08:45:30' -> microseconds since midnight."""
    parts = [int(p) for p in hm.split(":")]
    while len(parts) < 3:
        parts.append(0)
    h, m, s = parts
    return ((h * 60 + m) * 60 + s) * 1_000_000


def micros_of_day(ts: Column) -> Column:
    """Full-precision time-of-day in microseconds (keeps sub-second
    precision, unlike an HH:mm string compare).

    NTZ-polymorphic: unix_micros rejects TIMESTAMP_NTZ at analysis time,
    so cast first - a Catalyst no-op for TIMESTAMP input and a
    value-preserving reinterpretation for NTZ under the UTC-pinned
    session (session.get_spark). Sources normalize already
    (sources/io._normalize_timestamps); this keeps the helper safe for
    ad-hoc callers too."""
    return F.unix_micros(ts.cast("timestamp")) % F.lit(MICROS_PER_DAY)


def tod_between(ts: Column, start: str, end: str) -> Column:
    """pandas between_time(start, end) semantics: both boundaries
    inclusive; when start > end the interval wraps midnight and means
    tod >= start OR tod <= end (main.py:268-269; the 15:00-05:00 night
    wrap is F4 in SURVEY.md section 2.3)."""
    tod = micros_of_day(ts)
    lo, hi = _hm_micros(start), _hm_micros(end)
    if lo <= hi:
        return (tod >= F.lit(lo)) & (tod <= F.lit(hi))
    return (tod >= F.lit(lo)) | (tod <= F.lit(hi))


def session_kind(ts: Column) -> Column:
    """'D' | 'N' | 'UNKNOWN' by hour, exactly the reference's get_group_id
    buckets (main.py:341-345): 8<=h<=13 -> D; h>=15 or h<5 -> N."""
    h = F.hour(ts)
    return (
        F.when((h >= 8) & (h <= 13), F.lit("D"))
        .when((h >= 15) | (h < 5), F.lit("N"))
        .otherwise(F.lit("UNKNOWN"))
    )


def _session_date(ts: Column) -> Column:
    """Calendar date a bar belongs to: night bars before 05:00 roll back
    one day (main.py:285, :344)."""
    return F.when(
        F.hour(ts) < 5, F.to_date(ts - F.expr("INTERVAL 1 DAY"))
    ).otherwise(F.to_date(ts))


def date_market_type(ts: Column) -> Column:
    """P11 (main.py:281-291): 'yymmdd' + 'D'/'N'. Bars outside both
    sessions get the day label, matching the reference, which only ever
    applies this after the session split."""
    kind = session_kind(ts)
    suffix = F.when(kind == "N", F.lit("N")).otherwise(F.lit("D"))
    return F.concat(F.date_format(_session_date(ts), "yyMMdd"), suffix)


def session_id(ts: Column) -> Column:
    """P12 (main.py:341-345): 'YYYY-MM-DD_D' / 'YYYY-MM-DD_N' / 'UNKNOWN'."""
    kind = session_kind(ts)
    return F.when(kind == "UNKNOWN", F.lit("UNKNOWN")).otherwise(
        F.concat(F.date_format(_session_date(ts), "yyyy-MM-dd"), F.lit("_"), kind)
    )


def third_wednesday(any_day_in_month: Column) -> Column:
    """P9 (main.py:201-204): the futures settlement date - third Wednesday
    of the month of `any_day_in_month` - as a pure column expression.

    first_of_month + ((2 - dayofweek0 + 7) % 7) days reaches the first
    Wednesday (dayofweek0: Monday=0 ... Sunday=6), then +14 days.
    """
    first = F.trunc(any_day_in_month, "month")
    # Spark dayofweek: Sunday=1..Saturday=7 -> Monday0 = (dayofweek+5) % 7
    monday0 = (F.dayofweek(first) + F.lit(5)) % F.lit(7)
    to_first_wed = (F.lit(2) - monday0 + F.lit(7)) % F.lit(7)
    return F.date_add(first, F.lit(14) + to_first_wed)
