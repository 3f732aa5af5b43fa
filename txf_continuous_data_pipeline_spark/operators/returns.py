"""Continuous-series returns + realized-volatility aggregates over the
back-adjusted bar stream - THE consumer back-adjustment exists for
(raw closes gap at every contract roll; the accumulated offset removes
exactly that gap, so a return computed across a roll measures the
market, not the roll; reference invariant at main.py:210).

Factored out of queries/timeseries (r11) so the streaming monitor
(streaming/incremental.realized_vol_ingest_run) and the batch queries
(continuous_returns / session_realized_vol) share ONE definition - the
stream==batch pytest is then an identity over the same frame, not two
parallel implementations that could drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def continuous_log_returns(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    close_col: str = "close",
) -> DataFrame:
    """Bar-over-bar log returns on the continuous adjusted series.

    Scale shape (vs a single global lag, the one-task anti-pattern at
    100 TB): intra-session returns use a SESSION-PARTITIONED lag
    (parallel across sessions); each session's first bar closes against
    the previous session's last close via a DIMENSION-SIZED session
    summary (one row per session) lagged on the session level and
    broadcast back. Value-identical to the global lag because sessions
    are time-disjoint. Guarded ln: a non-positive ratio yields NULL.

    Output: (ts_col, session_col, adj_close, log_return) with the same
    rounding the oracle pins (close 4dp, return 6dp).
    """
    bars = bars.select(ts_col, session_col, close_col)
    w_in = Window.partitionBy(session_col).orderBy(ts_col)
    intra = bars.withColumn(
        "prev_close", F.lag(close_col).over(w_in)
    )
    ts = F.col(ts_col)
    sess = bars.groupBy(session_col).agg(
        F.min(ts_col).alias("first_ts"),
        F.max_by(close_col, ts).alias("last_close"),
    )
    w_s = Window.orderBy("first_ts")  # dimension-sized: one row/session
    prev_sess = sess.select(
        session_col,
        F.lag("last_close").over(w_s).alias("prev_sess_close"),
        "first_ts",
    )
    out = intra.join(F.broadcast(prev_sess), session_col).withColumn(
        "prev_close",
        F.when(
            F.col(ts_col) == F.col("first_ts"),
            F.col("prev_sess_close"),
        ).otherwise(F.col("prev_close")),
    )
    ratio = F.col(close_col) / F.col("prev_close")
    return out.select(
        ts_col,
        session_col,
        F.round(close_col, 4).alias("adj_close"),
        F.when(
            F.col("prev_close").isNotNull() & (ratio > 0),
            F.round(F.log(ratio), 6),
        ).alias("log_return"),
    )


def session_vwap(
    bars: DataFrame,
    *,
    session_col: str = "session_id",
    close_col: str = "close",
    volume_col: str = "volume",
    extra_group_cols: tuple = (),
) -> DataFrame:
    """Per-session volume-weighted average price + volume + notional
    over the adjusted series - the execution benchmark. ONE definition
    shared by the batch query (queries/timeseries.session_vwap_q) and
    the streaming monitor (r11 review wave 3: it had been hand-copied
    in three places - the drift mode the realized-vol factoring
    exists to prevent). One map-side-combined aggregate.

    EXACT-ARITHMETIC DISCIPLINE (r11 verify flake, two review waves):
    a parallel double sum's merge order is task-arrival order, so a
    vwap whose true quotient sits exactly on a 6dp rounding half
    (observed: 74.0578125) flipped its last digit between runs; and
    round(double) itself diverges between engines on such halves
    (Spark HALF_UPs the double's shortest decimal repr, DuckDB rounds
    the binary value). So NO double participates before the final
    constant division: the product sums in DECIMAL (exact at <= 6dp
    prices), and the 6dp half-away-from-zero rounding of pv/volume
    runs in INTEGER micro-units - (2|A| + V) DIV (2V) - identical by
    construction on both engines; notional rounds the exact DECIMAL
    sum before its double cast for the same reason. Micro-unit bound:
    |session pv| < ~9.2e12 fits BIGINT at 1e6 scale - price-domain
    safe by orders of magnitude. The oracle mirrors the same
    arithmetic."""
    pv = F.col(close_col).cast("decimal(15,6)") * F.col(
        volume_col
    ).cast("decimal(12,0)")
    agged = bars.groupBy(session_col, *extra_group_cols).agg(
        F.sum(pv).alias("_pv"),
        F.sum(volume_col).cast("long").alias("volume"),
    )
    half_away = F.expr(
        "(2 * abs(CAST(_pv * 1000000 AS BIGINT)) + volume)"
        " DIV (2 * volume)"
    )
    return agged.select(
        session_col,
        *extra_group_cols,
        (
            F.signum(F.col("_pv").cast("double"))
            * half_away
            / F.lit(1000000.0)
        ).alias("vwap"),
        "volume",
        F.round(F.col("_pv"), 4).cast("double").alias("notional"),
    )


def session_realized_vol(
    returns: DataFrame,
    *,
    session_col: str = "session_id",
    return_col: str = "log_return",
) -> DataFrame:
    """Per-session realized volatility (sqrt of the sum of squared log
    returns - the standard realized-variance estimator) plus the
    largest absolute bar return. One map-side-combined aggregate."""
    lr = F.col(return_col)
    return (
        returns.where(lr.isNotNull())
        .groupBy(session_col)
        .agg(
            F.count("*").cast("long").alias("n_returns"),
            F.round(F.sqrt(F.sum(lr * lr)), 6).alias("realized_vol"),
            F.round(F.max(F.abs(lr)), 6).alias("max_abs_return"),
        )
    )


def session_ohlc_summary(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
) -> DataFrame:
    """One OHLC row per session off the adjusted bar stream - the
    DIMENSION-SIZED frame every session-level risk operator below
    windows over. The rollup is the scale move: a corpus of bars
    reduces map-side to one row per session, after which a GLOBAL
    ordered window is a few thousand rows per decade of trading, not
    a single-task scan of the fact table (the continuous_log_returns
    session-summary discipline). min_by/max_by on the bar timestamp,
    never first/last."""
    ts = F.col(ts_col)
    return bars.groupBy(session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.min_by("open", ts).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts).alias("close"),
        F.sum("volume").cast("long").alias("volume"),
    )


def session_atr(
    bars: DataFrame,
    *,
    n: int = 14,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session True Range + simple-moving-average ATR(n) over the
    back-adjusted session series (Wilder's range components; SMA
    smoothing, whose fixed window the SQL oracle reproduces exactly -
    Wilder's recursive EMA would re-open the accumulation-order
    problem the unigram trainer documents). TR needs the PREVIOUS
    session's close, so it is only roll-jump-free on the ADJUSTED
    series - on raw closes every contract roll would print a fake
    range spike, the same artifact continuous_log_returns exists to
    remove. First session (no previous close): TR = high - low, the
    standard convention. The lag/rolling windows run on the
    session_ohlc_summary frame - dimension-sized, one row per
    session."""
    s = session_ohlc_summary(bars, ts_col=ts_col, session_col=session_col)
    w = Window.orderBy("session_start")
    prev_close = F.lag("close").over(w)
    tr = F.when(
        prev_close.isNull(), F.col("high") - F.col("low")
    ).otherwise(
        F.greatest(
            F.col("high") - F.col("low"),
            F.abs(F.col("high") - prev_close),
            F.abs(F.col("low") - prev_close),
        )
    )
    with_tr = s.select(
        session_col, "session_start", tr.alias("_tr")
    )
    w_n = Window.orderBy("session_start").rowsBetween(-(n - 1), 0)
    return with_tr.select(
        session_col,
        "session_start",
        F.round("_tr", 6).alias("true_range"),
        F.round(F.avg("_tr").over(w_n), 6).alias(f"atr_{n}"),
        F.count("*").over(w_n).cast("long").alias("n_in_window"),
    )


def overnight_gap_returns(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Session-open-vs-previous-session-close log gap on the adjusted
    continuous series: the risk continuous_log_returns does NOT
    measure (its first-bar return closes the first bar's CLOSE
    against the previous close; the gap a desk marks overnight risk
    with is the session OPEN against that close). The transition
    label (D->N / N->D) separates the afternoon break from the true
    overnight. Same guarded-ln convention as every return operator:
    a non-positive adjusted ratio yields NULL. Windows run on the
    dimension-sized session summary only."""
    s = session_ohlc_summary(bars, ts_col=ts_col, session_col=session_col)
    w = Window.orderBy("session_start")
    lagged = s.select(
        session_col,
        "session_start",
        "open",
        F.lag(session_col).over(w).alias("prev_session_id"),
        F.lag("close").over(w).alias("prev_close"),
    ).where(F.col("prev_session_id").isNotNull())
    # nullif guard: a back-shift can push an adjusted close to exactly
    # 0.0, where Spark's non-ANSI division NULLs but DuckDB's IEEE
    # division yields inf -- null the denominator in BOTH engines so
    # the (ratio > 0) branch agrees (same discipline as
    # price_limit_report).
    ratio = F.col("open") / F.nullif(F.col("prev_close"), F.lit(0.0))
    return lagged.select(
        session_col,
        "prev_session_id",
        F.concat(
            F.substring(F.col("prev_session_id"), -1, 1),
            F.lit("->"),
            F.substring(F.col(session_col), -1, 1),
        ).alias("transition"),
        F.round("open", 4).alias("session_open"),
        F.round("prev_close", 4).alias("prev_close"),
        F.when(ratio > 0, F.round(F.log(ratio), 6)).alias("gap_return"),
    )


def session_contract_summary(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
) -> DataFrame:
    """One row per (session, contract window) with RAW-price OHLC
    extremes - the per-bar accumulated offset subtracted back out, so
    within one contract window the numbers are the exchange's own.
    The frame for anything applying an EXCHANGE rule (price limits
    key off the previous settlement of the SAME contract; a
    cross-contract percent move is meaningless). A session can
    legitimately straddle two contract windows (settlement lands
    mid-day-session), hence the two-column key. Dimension-sized."""
    acc = F.col("accumulated_contract_diff")
    ts = F.col(ts_col)
    return (
        bars.where(F.col("contract_year_month") != "")
        .groupBy(session_col, "contract_year_month")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(F.col("high") - acc).alias("raw_high"),
            F.min(F.col("low") - acc).alias("raw_low"),
            F.max_by(F.col("close") - acc, ts).alias("raw_close"),
            F.sum("volume").cast("long").alias("volume"),
        )
    )


def price_limit_report(
    bars: DataFrame,
    *,
    band: float = 0.10,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Exchange price-limit surveillance (TAIFEX futures halt at
    +/-band of the previous session close): per (session, contract),
    the extreme up/down excursion vs the previous close of the SAME
    contract, with touch flags at the band. The lag partitions by
    contract window so a roll never fabricates a cross-contract move;
    flags test the ROUNDED percent (the 6dp round absorbs engine ulp
    differences; the threshold must not re-expose them). ONE
    definition shared by the batch query (price_limit_days) and the
    streaming monitor's limits feed. All windows on the
    dimension-sized (session, contract) summary."""
    sc = session_contract_summary(
        bars, ts_col=ts_col, session_col=session_col
    )
    w = Window.partitionBy("contract_year_month").orderBy(
        "session_start"
    )
    lagged = sc.select(
        session_col,
        "contract_year_month",
        "raw_high",
        "raw_low",
        F.lag("raw_close").over(w).alias("prev_close"),
    ).where(F.col("prev_close").isNotNull())
    denom = F.nullif(F.col("prev_close"), F.lit(0.0))
    up = F.round((F.col("raw_high") - F.col("prev_close")) / denom, 6)
    dn = F.round((F.col("raw_low") - F.col("prev_close")) / denom, 6)
    return lagged.select(
        session_col,
        "contract_year_month",
        F.round("prev_close", 4).alias("prev_close"),
        up.alias("max_up_pct"),
        dn.alias("max_down_pct"),
        F.coalesce(up >= band, F.lit(False)).alias("limit_up_touch"),
        F.coalesce(dn <= -band, F.lit(False)).alias(
            "limit_down_touch"
        ),
    )


def tick_signs(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    close_col: str = "close",
    out_col: str = "_sign",
) -> DataFrame:
    """Tick-rule trade signs (Lee-Ready without quotes): +1 on an
    uptick, -1 on a downtick, an unchanged close CARRIES the last
    known sign (last_value ignore-nulls over the session-partitioned
    preceding frame), and a session's opening run stays 0 until the
    first intra-session move - the overnight gap is an auction, not a
    tick. ONE definition shared by order_flow_imbalance and
    tick_imbalance_bars. Close comparisons are engine-identical
    because each close is one deterministic value plus the adjustment
    offset - no order-sensitive sum participates. Two windows sharing
    one session sort; embarrassingly parallel across sessions."""
    w = Window.partitionBy(session_col).orderBy(ts_col)
    prev = F.lag(close_col).over(w)
    raw = F.when(F.col(close_col) > prev, F.lit(1)).when(
        F.col(close_col) < prev, F.lit(-1)
    )
    carried = F.coalesce(
        F.last(raw, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
        F.lit(0),
    )
    return bars.withColumn(out_col, carried)


def order_flow_imbalance(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    close_col: str = "close",
    volume_col: str = "volume",
) -> DataFrame:
    """Per-session order-flow imbalance via the TICK RULE (Lee-Ready
    without quotes, the standard when only trades are visible): a bar
    is buyer-initiated (+1) on an uptick, seller-initiated (-1) on a
    downtick, and an unchanged close CARRIES the last known sign -
    realized as last_value(ignore nulls) over the session-partitioned
    preceding frame. Signs are scoped WITHIN a session by design: the
    overnight gap is a different auction, not a tick, so a session's
    opening bars stay neutral until the first intra-session price
    move (documented choice; the cross-session chain would borrow a
    sign across a halt). Close comparisons are engine-identical
    because each close is one deterministic value plus the adjustment
    offset - no order-sensitive sum participates.

    flow_imbalance = (buy - sell) / (buy + sell), rounded to 6dp in
    INTEGER micro-units ((2|num| + den) DIV (2 den), the session_vwap
    half-away-from-zero discipline) so the quotient cannot straddle a
    rounding half differently across engines. Micro-unit bound: these
    sums are SESSION-bounded, never corpus-bounded, so
    2|buy - sell| * 1e6 fits BIGINT up to ~4.6e12 contracts per
    session - the session_vwap acceptance, orders of magnitude over
    any real session (the corpus-bounded lanes - the clocks' prefix
    sums, Kyle/Roll's products - ride DECIMAL/HUGEINT instead). NULL
    when no bar ever got a sign. Everything is session-partitioned windows (tick_signs,
    shared with tick_imbalance_bars) plus one map-side-combined
    aggregate - embarrassingly parallel, nothing global, nothing
    driver-side.
    """
    signed = tick_signs(
        bars,
        ts_col=ts_col,
        session_col=session_col,
        close_col=close_col,
    )
    vol = F.col(volume_col)
    agged = signed.groupBy(session_col).agg(
        F.sum(F.when(F.col("_sign") == 1, vol).otherwise(F.lit(0)))
        .cast("long")
        .alias("buy_volume"),
        F.sum(F.when(F.col("_sign") == -1, vol).otherwise(F.lit(0)))
        .cast("long")
        .alias("sell_volume"),
        F.sum(F.when(F.col("_sign") == 0, vol).otherwise(F.lit(0)))
        .cast("long")
        .alias("neutral_volume"),
        F.count("*").alias("n_bars"),
    )
    num = F.col("buy_volume") - F.col("sell_volume")
    den = F.col("buy_volume") + F.col("sell_volume")
    magnitude = F.expr(
        "(2 * abs(buy_volume - sell_volume) * 1000000"
        " + (buy_volume + sell_volume))"
        " DIV (2 * (buy_volume + sell_volume))"
    )
    return agged.select(
        session_col,
        "buy_volume",
        "sell_volume",
        "neutral_volume",
        F.when(
            den > 0, F.signum(num) * magnitude / F.lit(1000000.0)
        ).alias("flow_imbalance"),
        "n_bars",
    )


def session_liquidity_metrics(
    bars: DataFrame,
    *,
    ts_col: str = "bar_ts",
    session_col: str = "session_id",
    close_col: str = "close",
    volume_col: str = "volume",
    offset_col: str = "accumulated_contract_diff",
) -> DataFrame:
    """The classic microstructure liquidity triple, per session, from
    the shared tick-signs frame:

      amihud_1e6   - Amihud (2002) illiquidity: mean |price change| per
                     unit notional, x1e6 (price impact of a dollar).
                     Notional uses the RAW (exchange) price - the
                     adjustment offset subtracted out, the
                     dollar_clock_bars rationale: notional is a
                     property of the trade, not the splice, and an
                     adjusted close can go non-positive after a large
                     back-shift (review finding; |dp| itself is
                     splice-invariant, so it stays on the adjusted
                     series).
      kyle_lambda  - Kyle (1985) lambda via the OLS slope of price
                     change on tick-rule SIGNED volume:
                     sum(dp*sv) / sum(sv^2) - how much one signed
                     contract moves price. Exact BIGINT end to end
                     (see the discipline paragraph below).
      roll_spread  - Roll (1984) implied effective spread:
                     2*sqrt(-serial-cov of price changes), defined only
                     when the rounded covariance is negative (bid-ask
                     bounce makes adjacent changes anti-correlated; a
                     positive-cov session has no Roll estimate).

    Price changes are intra-session lags (the session-partitioned
    parallel shape; an overnight gap is an auction, not bounce or
    impact). Cross-engine discipline, two tiers: Kyle and Roll are
    DYADIC-RATIONAL quotients (integer-grained price diffs over
    integer denominators - the exact structure that put session_vwap
    on a 6dp rounding half), so they compute in EXACT integer
    micro-units end to end: price diffs as DECIMAL(15,6) differences
    cast to BIGINT micros; Kyle's quotient rounds half-away-from-zero
    via (2|n| + d) DIV (2d) with the product sum carried in
    DECIMAL(38,0) (at production futures prices ~2e4 with 6dp grain,
    |dpm| reaches ~2e8 and a BIGINT sum of dpm*dpm products would
    silently wrap under non-ANSI mode - wrong sign, wrong branch);
    Roll's covariance numerator m*s_xy - s_x*s_y is likewise exact
    DECIMAL, its cov<0 branch tests the exact value, and only the
    MAGNITUDE crosses to double - bit-identical on both engines
    because the numerator is exact and the denominator m^2 * 1e12
    (< 2^53) is exactly representable. Amihud's terms, by contrast,
    divide by (raw_close * volume) - non-dyadic denominators whose
    mean has no half structure to hit - so it follows the
    realized_vol discipline instead: double sum, 6dp round absorbing
    engine ulp. One window stack sharing one session sort + one
    map-side-combined aggregate.
    """
    w = Window.partitionBy(session_col).orderBy(ts_col)
    signed = tick_signs(
        bars,
        ts_col=ts_col,
        session_col=session_col,
        close_col=close_col,
    ).select(
        session_col,
        ts_col,
        close_col,
        (F.col(close_col) - F.col(offset_col)).alias("_raw_close"),
        F.col(volume_col).cast("long").alias("_vol"),
        "_sign",
    )
    close_dec = F.col(close_col).cast("decimal(15,6)")
    frame = (
        signed.withColumn("_close_dec", close_dec)
        .withColumn(
            "_dpm",
            (
                (F.col("_close_dec") - F.lag("_close_dec").over(w))
                * F.lit(1000000)
            ).cast("long"),
        )
        .withColumn("_dpm_lag", F.lag("_dpm").over(w))
        .withColumn("_sv", F.col("_sign").cast("long") * F.col("_vol"))
    )
    dpm = F.col("_dpm")
    pair = dpm.isNotNull() & F.col("_dpm_lag").isNotNull()
    notional = F.col("_raw_close") * F.col("_vol")
    agged = frame.groupBy(session_col).agg(
        F.count("_dpm").alias("n_price_changes"),
        F.avg(
            F.when(
                dpm.isNotNull() & (notional > 0),
                F.abs(dpm) / F.lit(1000000.0) / notional,
            )
        ).alias("_amihud_raw"),
        F.sum(
            F.when(
                dpm.isNotNull(),
                dpm.cast("decimal(19,0)") * F.col("_sv"),
            )
        ).alias("_kyle_num"),
        F.sum(
            F.when(
                dpm.isNotNull(), F.col("_sv") * F.col("_sv")
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("_kyle_den"),
        F.sum(
            F.when(
                pair,
                dpm.cast("decimal(19,0)") * F.col("_dpm_lag"),
            )
        ).alias("_s_xy"),
        F.sum(F.when(pair, dpm)).cast("long").alias("_s_x"),
        F.sum(F.when(pair, F.col("_dpm_lag")))
        .cast("long")
        .alias("_s_y"),
        F.count(F.when(pair, F.lit(1))).alias("_m"),
    )
    # kyle in 1e-6 units: _kyle_num is already micro-scaled, so
    # num/den IS the micro value; half-away integral divide - Spark's
    # IntegralDivide accepts DECIMAL operands and returns LONG, and
    # both operands are non-negative so floor == truncate on both
    # engines
    kyle_micro = F.expr(
        "(2 * abs(_kyle_num) + _kyle_den) DIV (2 * _kyle_den)"
    )
    # cov numerator, exact DECIMAL: sign drives the branch; only the
    # magnitude crosses to double, divided by the exactly-
    # representable m^2 * 1e12
    cov_n = F.expr(
        "CAST(_m AS DECIMAL(19,0)) * _s_xy"
        " - CAST(_s_x AS DECIMAL(19,0)) * _s_y"
    )
    cov_d = F.when(
        F.col("_m") > 0,
        cov_n.cast("double")
        / (
            (F.col("_m") * F.col("_m")).cast("double")
            * F.lit(1e12)
        ),
    )
    return agged.select(
        session_col,
        "n_price_changes",
        F.round(F.lit(1000000.0) * F.col("_amihud_raw"), 6).alias(
            "amihud_1e6"
        ),
        F.when(
            F.col("_kyle_den") > 0,
            F.signum(F.col("_kyle_num")).cast("long")
            * kyle_micro
            / F.lit(1000000.0),
        ).alias("kyle_lambda"),
        F.when(
            cov_d < 0,
            F.round(F.lit(2.0) * F.sqrt(-cov_d), 6),
        ).alias("roll_spread"),
    )
