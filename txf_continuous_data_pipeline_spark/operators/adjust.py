"""Back-adjustment: point-in-interval join + roll-gap offset
(SURVEY.md 2.4 J1, 2.5 A7/A8) - the heart of the reference pipeline.

Reference (main.py:301-318): for each bar at time t, find the config row
with start_k <= t <= settle_k, add its accumulated_contract_diff to
O/H/L/C, stamp contract_year_month; unmatched bars keep diff=0 and an
empty contract label (main.py:298-299). The reference executes this as a
row-wise nested loop via df.apply(axis=1) - O(bars x configs) in Python.

Spark-first replacements, in order of scale:

  backadjust()          broadcast range join. The config table is tiny
                        (one row per contract month), so Catalyst plans a
                        BroadcastNestedLoopJoin: each task streams its
                        bars against the in-memory config - no shuffle of
                        the fact side at all. Right plan up to thousands
                        of config rows.

  backadjust_bucketed() the 100-TB path: explode each config interval
                        into the calendar buckets (months) it overlaps,
                        then EQUI-join bars on their bucket and filter the
                        range residual. Turns the nested-loop predicate
                        into a hash join on (bucket) that AQE can plan as
                        broadcast-hash or shuffle-hash; bars never move
                        unless the join itself requires it.

derive_accumulated_gap() re-derives accumulated_contract_diff as the
exclusive prefix sum of next_contract_diff (the invariant at main.py:210)
instead of trusting stored state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRICE_COLS = ("open", "high", "low", "close")


def derive_accumulated_gap(
    cfg: DataFrame, order_col: str = "contract_year_month"
) -> DataFrame:
    """A7: accumulated_contract_diff[i] = sum of next_contract_diff[0..i-1].

    Single unbounded-preceding window over the (small) config dimension;
    runs in one partition by design - config is a dimension table.
    """
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return cfg.withColumn(
        "accumulated_contract_diff",
        F.coalesce(F.sum("next_contract_diff").over(w), F.lit(0.0)),
    )


def backadjust(
    bars: DataFrame,
    cfg: DataFrame,
    *,
    ts_col: str = "ts",
    price_cols: tuple[str, ...] = PRICE_COLS,
    start_col: str = "start_k",
    end_col: str = "settle_k",
    end_inclusive: bool = True,
) -> DataFrame:
    """J1: broadcast point-in-interval left join + price shift.

    Config intervals are non-overlapping by invariant (SURVEY.md 1.3), so
    a plain left join yields at most one match per bar (A8's first-match
    pick is unnecessary); unmatched bars get diff=0 / empty contract
    (main.py:298-299, :307).
    """
    ts = bars[ts_col]
    upper = ts <= cfg[end_col] if end_inclusive else ts < cfg[end_col]
    joined = bars.join(F.broadcast(cfg), (ts >= cfg[start_col]) & upper, "left")
    return _apply_shift(joined, bars, cfg, price_cols, start_col, end_col)


def backadjust_bucketed(
    bars: DataFrame,
    cfg: DataFrame,
    *,
    ts_col: str = "ts",
    price_cols: tuple[str, ...] = PRICE_COLS,
    start_col: str = "start_k",
    end_col: str = "settle_k",
    bucket: str = "month",
    end_inclusive: bool = True,
) -> DataFrame:
    """J1 at 100-TB scale: interval join rewritten as an equi-join.

    Each config interval is exploded to one row per calendar `bucket` it
    overlaps (months: a contract window spans at most 2); bars join on
    trunc(ts, bucket) with the exact range check as a residual filter.
    The join key is an equi-key, so Catalyst plans a hash join (broadcast
    for a small config) instead of a nested loop, and the same rewrite
    keeps working when the config side grows too big to broadcast.
    """
    # Explicit step: sequence() over dates defaults to a 1-DAY stride,
    # which would explode ~30 rows per month-bucket instead of 1.
    from .relational import _BUCKET_STEP

    step = _BUCKET_STEP[bucket]
    cfg_b = cfg.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(bucket, F.col(end_col)),
                F.expr(f"INTERVAL {step}"),
            )
        ),
    )
    ts = bars[ts_col]
    upper = ts <= cfg_b[end_col] if end_inclusive else ts < cfg_b[end_col]
    joined = bars.join(
        F.broadcast(cfg_b),
        (F.date_trunc(bucket, ts) == cfg_b["_bucket"])
        & (ts >= cfg_b[start_col])
        & upper,
        "left",
    ).drop("_bucket")
    return _apply_shift(joined, bars, cfg, price_cols, start_col, end_col)


def _apply_shift(joined, bars, cfg, price_cols, start_col, end_col):
    diff = F.coalesce(F.col("accumulated_contract_diff"), F.lit(0.0))
    out = joined
    for c in price_cols:
        out = out.withColumn(c, bars[c] + diff)
    return (
        out.withColumn("accumulated_contract_diff", diff)
        .withColumn(
            "contract_year_month",
            F.coalesce(F.col("contract_year_month"), F.lit("")),
        )
        .drop(start_col, end_col, "next_contract_diff")
    )
