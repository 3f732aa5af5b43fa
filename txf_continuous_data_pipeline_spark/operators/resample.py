"""Tumbling-window OHLCV resampling (SURVEY.md section 2.5, A1/A2).

Reference semantics (main.py:263-278):
  5-min:  resample('5min', label='left', closed='right')
          .agg(Open first, High max, Low min, Close last, Volume sum)
  60-min: day session resample('60min', offset='45min'); night session
          resample('60min'); both default closed='left', label='left'.

Spark mapping: F.window(ts, width, startTime=offset) is a [start, end)
bucket labeled by start == pandas closed='left', label='left'. The
closed='right' variant buckets on (ts - 1 microsecond), which moves
boundary-stamped rows into the preceding bucket while keeping the left
label - exactly pandas' (start, end] with label='left' (SURVEY.md 1.4).

first/last are order-sensitive: implemented as min_by/max_by over the
timestamp, never F.first/F.last (nondeterministic after shuffle).

Scale: the groupBy(window) aggregation partial-aggregates map-side before
one hash shuffle on the window key; with date-partitioned sources the
shuffle is the only exchange. No Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_start(
    ts: Column, width: str, *, offset: str = "0 seconds", closed: str = "left"
) -> Column:
    """Window-start label for a tumbling bucket, as a plain timestamp."""
    src = ts - F.expr("INTERVAL 1 MICROSECOND") if closed == "right" else ts
    return F.window(src, width, startTime=offset)["start"]


_UNIT_US = {
    "second": 1_000_000,
    "seconds": 1_000_000,
    "minute": 60_000_000,
    "minutes": 60_000_000,
    "hour": 3_600_000_000,
    "hours": 3_600_000_000,
    "day": 86_400_000_000,
    "days": 86_400_000_000,
}


def _interval_us(spec: str) -> int:
    """'60 minutes' -> microseconds (the subset of interval syntax the
    resample operators accept)."""
    value, unit = spec.split()
    return int(value) * _UNIT_US[unit.lower()]


def rollup_ohlcv(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    width: str = "60 minutes",
    offset: str = "0 seconds",
    closed: str = "left",
    out_ts: str = "bar_ts",
) -> DataFrame:
    """A2 as a hypertable-style rollup: coarser OHLCV bars from finer
    OHLCV bars (open = first open, high = max high, low = min low,
    close = last close, volume = sum) - the reference builds its 60-min
    bars from the already-split 5-min stream (main.py:272-278).

    Rolling up from bars instead of re-scanning raw ticks is the
    100-TB move: the 60-min layer reads ~1/5th the rows and reuses the
    5-min layer's shuffle partitioning (same key derivation, so AQE can
    often plan it exchange-free after the first agg)."""
    ts = F.col(ts_col)
    return bars.groupBy(
        bucket_start(ts, width, offset=offset, closed=closed).alias(out_ts)
    ).agg(*_rollup_aggs(ts))


def _rollup_aggs(ts: Column):
    """The bars-from-bars OHLCV aggregate list, shared by rollup_ohlcv
    and rollup_ohlcv_sessions so the two 60-min paths cannot drift."""
    return (
        F.min_by("open", ts).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts).alias("close"),
        F.sum("volume").cast("long").alias("volume"),
        F.count("*").alias("n_bars"),
    )


def tumbling_ohlcv(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    price_col: str = "value",
    volume_col: str | None = None,
    width: str = "5 minutes",
    offset: str = "0 seconds",
    closed: str = "right",
    out_ts: str = "bar_ts",
) -> DataFrame:
    """A1/A2: OHLCV bars over a tumbling window.

    Output: out_ts, open, high, low, close, volume (sum of volume_col, or
    row count when volume_col is None), n_rows. Empty buckets are simply
    absent, which matches the reference's .dropna() after resample
    (main.py:265 - F2 is a no-op here by construction).
    """
    ts, price = F.col(ts_col), F.col(price_col)
    vol = F.sum(volume_col) if volume_col else F.count("*")
    return (
        df.groupBy(
            bucket_start(ts, width, offset=offset, closed=closed).alias(out_ts)
        )
        .agg(
            F.min_by(price, ts).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, ts).alias("close"),
            vol.cast("long").alias("volume"),
            F.count("*").alias("n_rows"),
        )
    )


def rollup_ohlcv_sessions(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    width: str = "60 minutes",
    day_offset: str = "45 minutes",
    out_ts: str = "bar_ts",
) -> DataFrame:
    """A2 single-pass form: the day/night 60-min rollup as ONE scan and
    ONE aggregation. The two-branch form (day_session -> rollup UNION
    night_session -> rollup) derives the 5-min bar subplan twice; here
    the session filter is one disjunction and the phase offset is a
    conditional bucket expression (day buckets 45-min shifted, night
    hour-aligned, main.py:272-278). Day/night time-of-day ranges are
    disjoint, so the result is row-identical to the union of the two
    separate rollups."""
    from ..functions import tod_between
    from .sessions import DAY_END, DAY_START, NIGHT_END, NIGHT_START

    ts = F.col(ts_col)
    is_day = tod_between(ts, DAY_START, DAY_END)
    is_night = tod_between(ts, NIGHT_START, NIGHT_END)
    # Arithmetic bucket floor instead of F.window: Spark rejects two
    # window expressions in one aggregation ("cartesian product of
    # rows"), and the branch needs a per-row choice of phase offset.
    width_us = _interval_us(width)
    day_off_us = _interval_us(day_offset)
    # cast: NTZ-polymorphic (no-op for TIMESTAMP; value-preserving for
    # TIMESTAMP_NTZ under the UTC-pinned session) - and timestamp_micros
    # below always emits TIMESTAMP, so the output type is consistent.
    us = F.unix_micros(ts.cast("timestamp"))
    off = F.when(is_day, F.lit(day_off_us)).otherwise(F.lit(0))
    bucket = F.timestamp_micros(
        ((us - off) - F.pmod(us - off, F.lit(width_us))) + off
    )
    return (
        bars.where(is_day | is_night)
        .groupBy(bucket.alias(out_ts))
        .agg(*_rollup_aggs(ts))
    )


def volume_clock_bars(
    bars: DataFrame,
    *,
    target_buckets: int = 200,
    bucket_volume: int | None = None,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    volume_col: str = "volume",
) -> DataFrame:
    """Information-driven resampling on the VOLUME clock (de Prado's
    volume bars): cut the time-ordered bar stream every time total
    traded volume advances by one bucket's worth, instead of every N
    minutes. Quiet stretches collapse into few rows, bursts expand
    into many - the sampling that keeps per-bar information content
    roughly constant, which is why volume bars feed training sets
    where wall-clock bars would over-represent dead hours. Bucket
    size derives from the stream itself: ceil(total / target_buckets),
    so the operator is scale-invariant across corpus sizes.

    Scale shape: the defining cumulative volume is a GLOBAL prefix sum
    - the one-task window anti-pattern at 100 TB - so it is decomposed
    exactly like continuous_log_returns' lag: an intra-session
    exclusive prefix sum (partitioned window, parallel across
    sessions) plus a session-level exclusive offset computed on the
    DIMENSION-SIZED session summary and broadcast back. Sessions are
    time-disjoint, so the sum of the two IS the global prefix sum.
    The bucket id is integer DIV on BIGINTs end to end - no double
    participates, so there is nothing to drift at 2^53-scale volumes.
    The final per-bucket OHLCV is one map-side-combined aggregate
    (min_by/max_by on the timestamp, the A1 discipline).

    Output: one row per volume bucket (vbar_seq, first_ts, last_ts,
    open, high, low, close, volume, n_bars).

    bucket_volume: pass a FIXED bucket size instead of deriving it
    from the total - the streaming form (a live feed cannot know the
    final total, and a fixed threshold is what makes completed-bucket
    boundaries append-only: a prefix sum only ever grows, so a sunk
    bucket's membership can never be restated).
    """
    return _weight_clock_bars(
        bars,
        F.col(volume_col).cast("long"),
        seq_name="vbar_seq",
        target_buckets=target_buckets,
        bucket_size=bucket_volume,
        ts_col=ts_col,
        session_col=session_col,
        volume_col=volume_col,
    )


def dollar_clock_bars(
    bars: DataFrame,
    *,
    target_buckets: int = 200,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    volume_col: str = "volume",
    price_col: str = "close",
    offset_col: str = "accumulated_contract_diff",
) -> DataFrame:
    """The DOLLAR clock (de Prado's dollar bars): cut on cumulative
    traded NOTIONAL instead of contract count, so the sampling is
    invariant to price level - a decade of history samples evenly
    even after the underlying doubled, where the volume clock would
    over-sample the cheap years. Weight = floor(raw_price * 1e4) *
    volume, an exact BIGINT per bar: the RAW (exchange) price - the
    back-adjustment offset subtracted out, since adjusted closes can
    go non-positive after a large shift and notional is a property of
    the trade, not the splice - quantized at 1e4 (well under tick
    size) so the prefix sum stays integer end to end and nothing can
    drift at scale; the floor(double) is a single identical IEEE op
    on both engines. Same decomposed prefix-sum machinery as
    volume_clock_bars (_weight_clock_bars).

    Output: one row per dollar bucket (dbar_seq, first_ts, last_ts,
    open, high, low, close, volume, n_bars) - OHLC stay ADJUSTED
    (the continuous series a consumer charts); only the clock runs on
    raw notional.
    """
    weight = (
        F.floor(
            (F.col(price_col) - F.col(offset_col)) * F.lit(10000.0)
        ).cast("long")
        * F.col(volume_col).cast("long")
    )
    return _weight_clock_bars(
        bars,
        weight,
        seq_name="dbar_seq",
        target_buckets=target_buckets,
        ts_col=ts_col,
        session_col=session_col,
        volume_col=volume_col,
    )


def _weight_clock_bars(
    bars: DataFrame,
    weight,
    *,
    seq_name: str,
    target_buckets: int,
    ts_col: str,
    session_col: str,
    volume_col: str,
    bucket_size: int | None = None,
) -> DataFrame:
    """Shared engine of the information-driven clocks: exclusive
    prefix sum of an exact BIGINT per-bar weight, decomposed into an
    intra-session partitioned window + a dimension-sized session
    offset broadcast back (sessions are time-disjoint, so the sum of
    the two IS the global prefix sum), bucket id via exact integral
    DIV, one map-side-combined OHLCV aggregate.

    The per-bar weight is BIGINT, but the PREFIX SUMS ride
    DECIMAL(38,0): a corpus-wide cumulative notional at production
    prices (~2e8 weight-units per contract) exceeds BIGINT well
    inside the 100-TB design range and would silently wrap under
    non-ANSI mode (the Kyle/Roll review-wave lesson applied here).
    Spark's IntegralDivide is exact on DECIMAL operands; the oracles
    ride DuckDB's HUGEINT, whose // is exact (its DECIMAL // rounds
    before flooring - see the liquidity oracle note)."""
    ts = F.col(ts_col)
    w_in = (
        Window.partitionBy(session_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    weighted = bars.withColumn(
        "_w", weight.cast("decimal(20,0)")
    )
    intra = weighted.withColumn(
        "_intra_cum",
        F.coalesce(F.sum("_w").over(w_in), F.lit(0)).cast(
            "decimal(38,0)"
        ),
    )
    sess = weighted.groupBy(session_col).agg(
        F.min(ts_col).alias("_first_ts"),
        F.sum("_w").cast("decimal(38,0)").alias("_sess_w"),
    )
    w_s = (
        Window.orderBy("_first_ts")  # dimension-sized: one row/session
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sess.select(
        session_col,
        F.coalesce(F.sum("_sess_w").over(w_s), F.lit(0))
        .cast("decimal(38,0)")
        .alias("_sess_offset"),
    )
    # the global total is the sum of the dimension-sized session
    # summary the operator already builds - re-aggregating the
    # fact-scale bars frame for it would be a redundant third
    # scan+exchange per invocation (review finding). Integer sums
    # associate, so sum(_sess_w) == sum(weight) exactly.
    cum = intra.join(F.broadcast(offsets), session_col)
    if bucket_size is not None and int(bucket_size) <= 0:
        # fail fast: under non-ANSI mode a DIV 0 silently NULLs every
        # bucket id and downstream consumers see an empty feed forever
        # (review finding)
        raise ValueError(
            f"bucket size must be positive, got {bucket_size}"
        )
    if bucket_size is None:
        # total -> double -> ceil: identical ops on both engines; the
        # double rounds identically past 2^53, and the threshold
        # itself sits orders of magnitude under BIGINT. greatest(.,1)
        # guards the zero-total-weight degenerate (all-zero volume):
        # without it _vbucket = 0 and non-ANSI DIV 0 silently NULLs
        # every bucket id, collapsing output into one null-keyed row
        # (review finding, the bucket_size<=0 guard's derived twin).
        # With it, a zero total puts every row in bucket 0 -- the only
        # case greatest changes, since ceil of any positive total is
        # already >= 1.
        thr = sess.agg(
            F.greatest(
                F.ceil(
                    F.sum("_sess_w").cast("double")
                    / F.lit(float(target_buckets))
                ).cast("long"),
                F.lit(1).cast("long"),
            ).alias("_vbucket")
        )
        cum = cum.crossJoin(F.broadcast(thr))  # 1-row scalar frame
        div = "(_sess_offset + _intra_cum) DIV _vbucket"
    else:
        # fixed threshold (the streaming form): a plain literal, no
        # scalar frame needed
        div = (
            f"(_sess_offset + _intra_cum) DIV {int(bucket_size)}L"
        )
    cum = cum.withColumn(seq_name, F.expr(div))
    return cum.groupBy(seq_name).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        F.min_by("open", ts).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts).alias("close"),
        F.sum(volume_col).cast("long").alias("volume"),
        F.count("*").alias("n_bars"),
    )


def tick_imbalance_bars(
    bars: DataFrame,
    *,
    target_cuts: int = 800,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    volume_col: str = "volume",
) -> DataFrame:
    """Information-driven resampling on the IMBALANCE clock (de
    Prado's tick-imbalance bars, fixed-threshold form): accumulate
    tick-rule SIGNED volume and cut a bar whenever the running
    imbalance |theta| reaches the threshold, then reset - so one-sided
    bursts (informed-flow footprints) produce many short bars and
    balanced churn produces few long ones. The cut rule is genuinely
    SEQUENTIAL (every cut depends on all prior bars through the
    reset), which no window function expresses - but the accumulator
    is SESSION-SCOPED by design (an overnight gap is an auction, not
    order flow), and a session is PHYSICALLY BOUNDED (<= 168 5-min
    bars), so the irreducible sequential fold is an applyInPandas
    over session groups: parallel across sessions, O(session) integer
    arithmetic within one Arrow batch per group, output already
    aggregated to bucket grain inside the UDF so only bucket rows
    leave Python. Threshold = ceil(total volume / target_cuts) -
    scale-invariant, and exact BIGINT end to end (signs from
    operators/returns.tick_signs, shared with order_flow_imbalance),
    so Python and any SQL engine fold to identical cuts.

    Output: one row per (session_id, ibar_seq): first_ts, last_ts,
    open, high, low, close, volume, signed_volume (theta contribution
    of the bucket), n_bars. The tripping bar closes its bucket
    (inclusive), and a session's unfinished tail bucket is emitted
    as-is (the stream is historical; there is nothing to wait for).
    """
    import pandas as pd

    from .returns import tick_signs

    signed = tick_signs(
        bars, ts_col=ts_col, session_col=session_col
    ).select(
        session_col,
        F.col(ts_col).alias("bar_ts"),
        "open",
        "high",
        "low",
        "close",
        F.col(volume_col).cast("long").alias("volume"),
        "_sign",
    )
    thr_frame = bars.agg(
        F.ceil(F.sum(volume_col).cast("long") / F.lit(target_cuts))
        .cast("long")
        .alias("_thr")
    )
    with_thr = signed.crossJoin(F.broadcast(thr_frame))

    schema = (
        f"{session_col} string, ibar_seq long, first_ts timestamp,"
        " last_ts timestamp, open double, high double, low double,"
        " close double, volume long, signed_volume long, n_bars long"
    )

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bar_ts", kind="mergesort")
        thr = int(pdf["_thr"].iloc[0])
        theta = 0
        seq = 0
        seqs = []
        for sign, vol in zip(pdf["_sign"], pdf["volume"]):
            seqs.append(seq)
            theta += int(sign) * int(vol)
            if abs(theta) >= thr:
                seq += 1
                theta = 0
        pdf = pdf.assign(_seq=seqs, _sv=pdf["_sign"] * pdf["volume"])
        g = pdf.groupby("_seq", sort=True)
        out = pd.DataFrame(
            {
                session_col: g[session_col].first(),
                "ibar_seq": g["_seq"].first(),
                "first_ts": g["bar_ts"].min(),
                "last_ts": g["bar_ts"].max(),
                "open": g["open"].first(),
                "high": g["high"].max(),
                "low": g["low"].min(),
                "close": g["close"].last(),
                "volume": g["volume"].sum(),
                "signed_volume": g["_sv"].sum(),
                "n_bars": g["volume"].count(),
            }
        )
        return out.reset_index(drop=True)

    return with_thr.groupBy(session_col).applyInPandas(_fold, schema)
