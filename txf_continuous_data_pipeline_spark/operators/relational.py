"""Relational building blocks over the star schema (SURVEY.md 2.9).

The reference contains a single range join and no other relational
algebra; these are the extension operators the engine adds so a user of
the reference's data could run warehouse-style queries at 100-TB scale.
All expressed with built-in DataFrame ops so Catalyst keeps predicate
pushdown / join reordering / broadcast decisions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a deterministic order.

    The order_by columns MUST form a total order (include a unique
    tie-breaker) or the result is nondeterministic under shuffle. Scale:
    one hash shuffle on group_cols; with AQE, skewed groups split.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def star_join(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, Column | str]]
) -> DataFrame:
    """Join a fact table against small dimensions, broadcasting each dim.

    Catalyst would usually pick broadcast joins on its own via size
    stats; the explicit hint pins the plan so a mis-estimated dimension
    can never trigger a fact-side shuffle."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out


def exists_filter(
    left: DataFrame, right: DataFrame, on: Column | str, negate: bool = False
) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi / left-anti joins - the shuffle
    only moves join keys, never payload columns of the right side."""
    return left.join(right, on, "left_anti" if negate else "left_semi")


ASOF_BUCKETED_THRESHOLD = 64


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_ts: str = "ts",
    dim_ts: str = "start_k",
    strictness: str = "<=",
    keep: Sequence[str] = (),
    bucketed_threshold: int = ASOF_BUCKETED_THRESHOLD,
    bucket: str = "month",
) -> DataFrame:
    """As-of (backward) join: each fact row picks the dim row with the
    LARGEST dim_ts satisfying dim_ts <= fact_ts (or < for strict) - the
    time-series operator Spark lacks natively (SURVEY.md "custom
    operators": composition of existing ops, no UDF).

    Two plans, picked by dim-version count (one cheap dimension-side
    count at build time):

    - few versions (<= bucketed_threshold): broadcast inequality join +
      one max_by fold per fact row. Candidate rows are
      O(facts x versions), so this form is only safe while the version
      count is small - a years-long versioned dim would explode it.
      Requirement: `facts` must contain a unique key among its columns
      (the fold groups by all fact columns).

    - many versions: asof_join_bucketed() - version i's validity
      interval [dim_ts_i, dim_ts_{i+1}) is derived with lead(), the
      non-overlapping intervals are exploded to calendar buckets, and
      facts EQUI-join on trunc(fact_ts, bucket) with the exact range
      check as a residual. At most one match per fact by construction,
      so no fold, no candidate blowup, no unique-key requirement - the
      same rewrite as operators/adjust.backadjust_bucketed.
    """
    if dim.count() > bucketed_threshold:
        return asof_join_bucketed(
            facts, dim, fact_ts=fact_ts, dim_ts=dim_ts,
            strictness=strictness, keep=keep, bucket=bucket,
        )
    cmp = (
        F.col(f"_d.{dim_ts}") <= F.col(f"_f.{fact_ts}")
        if strictness == "<="
        else F.col(f"_d.{dim_ts}") < F.col(f"_f.{fact_ts}")
    )
    f_side, d_side = facts.alias("_f"), dim.alias("_d")
    joined = f_side.join(F.broadcast(d_side), cmp, "left")
    fact_cols = [F.col(f"_f.{c}") for c in facts.columns]
    keep = list(keep) or [c for c in dim.columns if c != dim_ts]
    picked = F.max_by(
        F.struct(*[F.col(f"_d.{c}").alias(c) for c in [dim_ts, *keep]]),
        F.col(f"_d.{dim_ts}"),
    ).alias("_dim")
    grouped = joined.groupBy(*fact_cols).agg(picked)
    return grouped.select(
        *[F.col(c) for c in facts.columns],
        *[F.col(f"_dim.{c}").alias(c) for c in [dim_ts, *keep]],
    )


def asof_join_bucketed(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_ts: str = "ts",
    dim_ts: str = "start_k",
    strictness: str = "<=",
    keep: Sequence[str] = (),
    bucket: str = "month",
) -> DataFrame:
    """The scale form of asof_join (see its docstring): derive validity
    intervals, explode to calendar buckets, equi-join + residual filter.

    The open-ended last interval is capped at max(fact_ts) - one scalar
    aggregate on the fact side, answered from parquet footer stats on a
    raw scan (the same cost class as the watermark read, S4)."""
    keep = list(keep) or [c for c in dim.columns if c != dim_ts]
    row = facts.agg(F.max(fact_ts).alias("m")).collect()[0]
    if row["m"] is None:  # empty fact side: nothing to join
        empty_dim = [F.lit(None).cast(dim.schema[c].dataType).alias(c)
                     for c in [dim_ts, *keep]]
        return facts.select("*", *empty_dim)
    w = Window.orderBy(dim_ts)
    intervals = dim.select(dim_ts, *keep).withColumn(
        "_end", F.lead(dim_ts).over(w)
    )
    cfg_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.trunc(F.col(dim_ts), bucket),
                F.trunc(F.coalesce(F.col("_end"), F.lit(row["m"])), bucket),
            )
        ),
    )
    ts = facts[fact_ts]
    if strictness == "<=":
        # version i owns [dim_ts_i, dim_ts_{i+1})
        residual = (ts >= cfg_b[dim_ts]) & (
            cfg_b["_end"].isNull() | (ts < cfg_b["_end"])
        )
    else:
        # strict <: version i owns (dim_ts_i, dim_ts_{i+1}]
        residual = (ts > cfg_b[dim_ts]) & (
            cfg_b["_end"].isNull() | (ts <= cfg_b["_end"])
        )
    joined = facts.join(
        cfg_b,
        (F.trunc(ts, bucket) == cfg_b["_bucket"]) & residual,
        "left",
    )
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[cfg_b[c] for c in [dim_ts, *keep]],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skew: the big side's hot keys are
    split across `n_salts` synthetic sub-keys (hash of `salt_src`, any
    column uncorrelated with the join key - a unique id works), and the
    small side is replicated n_salts times so every sub-key finds its
    match. Result is row-identical to the plain join; the shuffle spreads
    a hot key over n_salts reducers instead of one straggler.

    AQE's skew-join handles the sort-merge case automatically at runtime;
    this explicit form is for plans AQE cannot split (e.g. a skewed
    aggregate feeding the join, or pre-AQE engines) and as the documented
    recipe for the 100-TB case.
    """
    big_s = big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def sessionize(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization (the batch twin of F.session_window):
    rows of one key belong to the same session until a silence longer
    than `gap`. Classic gaps-and-islands: lag + cumulative sum of
    new-session flags inside one window partition per key - a single
    shuffle on key_col, no UDF, fully codegen'd.

    The streaming variant is F.session_window(ts, gap) in a watermarked
    agg; this batch form exists so results are oracle-checkable.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    is_new = (
        prev.isNull()
        | (F.col(ts_col) > prev + F.expr(f"INTERVAL {gap}"))
    ).cast("long")
    return df.withColumn("_new", is_new).withColumn(
        "session_seq",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).drop("_new")


def session_stats(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session aggregate over sessionize(): bounds, length, events.
    Reuses the sessionize shuffle partitioning (same key prefix), so the
    second aggregate is exchange-free under AQE."""
    s = sessionize(df, key_col=key_col, ts_col=ts_col, gap=gap)
    return s.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )
