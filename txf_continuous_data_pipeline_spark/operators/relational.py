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


def _asof_intervals(dim, dim_ts, keep, direction="backward"):
    """Versioned dim -> non-overlapping validity intervals. backward:
    version i owns [dim_ts_i, dim_ts_{i+1}) (lead gives the exclusive
    end). forward: version i owns (dim_ts_{i-1}, dim_ts_i] (lag gives
    the exclusive start; stored in the same `_end` column, read by the
    matching residual). Strictness shifts are applied in the residual
    predicate. Single window over the small dimension."""
    w = Window.orderBy(dim_ts)
    edge = F.lead(dim_ts) if direction == "backward" else F.lag(dim_ts)
    return dim.select(dim_ts, *keep).withColumn("_end", edge.over(w))


def _asof_residual(ts, intervals, dim_ts, strictness,
                   direction="backward"):
    if direction == "backward":
        if strictness == "<=":
            # version i owns [dim_ts_i, dim_ts_{i+1})
            return (ts >= intervals[dim_ts]) & (
                intervals["_end"].isNull() | (ts < intervals["_end"])
            )
        # strict <: version i owns (dim_ts_i, dim_ts_{i+1}]
        return (ts > intervals[dim_ts]) & (
            intervals["_end"].isNull() | (ts <= intervals["_end"])
        )
    # forward: `_end` holds the PREVIOUS version's ts (exclusive start)
    if strictness == "<=":
        # fact matches the earliest version with dim_ts >= ts:
        # version i owns (dim_ts_{i-1}, dim_ts_i]
        return (ts <= intervals[dim_ts]) & (
            intervals["_end"].isNull() | (ts > intervals["_end"])
        )
    # strict >: version i owns [dim_ts_{i-1}, dim_ts_i)
    return (ts < intervals[dim_ts]) & (
        intervals["_end"].isNull() | (ts >= intervals["_end"])
    )


def asof_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_ts: str = "ts",
    dim_ts: str = "start_k",
    strictness: str = "<=",
    keep: Sequence[str] = (),
    plan: str = "auto",
    bucketed_threshold: int = ASOF_BUCKETED_THRESHOLD,
    bucket: str = "month",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: direction='backward' (default) picks the dim row
    with the LARGEST dim_ts satisfying dim_ts <= fact_ts (or < for
    strict); direction='forward' the SMALLEST dim_ts with
    dim_ts >= fact_ts (or >) - the next-scheduled-event lookup. The
    time-series operator Spark lacks natively (SURVEY.md "custom
    operators": composition of existing ops, no UDF).

    Both plans first derive each version's validity interval with a
    lead() window, turning the as-of semantics into a non-overlapping
    point-in-interval join: at most ONE match per fact row by
    construction, so there is no fold, no candidate blowup, and
    duplicate fact rows are preserved identically by every plan.

    plan='broadcast': interval table broadcasts; facts stream against
    it (nested-loop on the residual predicate). Right while the version
    count is small.

    plan='bucketed': asof_join_bucketed - intervals explode to calendar
    buckets and facts EQUI-join on their (clamped) bucket with the
    range check as a residual; works when the dim outgrows a broadcast.
    Pick `bucket` near the version spacing (a 'month' bucket over
    6-hourly versions still enumerates every same-month version per
    fact before the residual keeps one).

    plan='auto' (default): one dimension-side count() at build time
    picks broadcast below `bucketed_threshold` versions. Pass an
    explicit plan to keep plan construction fully lazy.
    """
    if plan not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown asof_join plan: {plan!r}")
    if strictness not in ("<=", "<"):
        raise ValueError(f"unknown asof_join strictness: {strictness!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof_join direction: {direction!r}")
    keep = list(keep) or [c for c in dim.columns if c != dim_ts]
    if plan == "auto":
        plan = (
            "broadcast" if dim.count() <= bucketed_threshold else "bucketed"
        )
    if plan == "bucketed":
        return asof_join_bucketed(
            facts, dim, fact_ts=fact_ts, dim_ts=dim_ts,
            strictness=strictness, keep=keep, bucket=bucket,
            direction=direction,
        )
    intervals = _asof_intervals(dim, dim_ts, keep, direction)
    ts = facts[fact_ts]
    joined = facts.join(
        F.broadcast(intervals),
        _asof_residual(ts, intervals, dim_ts, strictness, direction),
        "left",
    )
    return joined.select(
        *[facts[c] for c in facts.columns],
        *[intervals[c] for c in [dim_ts, *keep]],
    )


_BUCKET_STEP = {"day": "1 day", "week": "1 week", "month": "1 month",
                "year": "1 year"}


def asof_join_bucketed(
    facts: DataFrame,
    dim: DataFrame,
    *,
    fact_ts: str = "ts",
    dim_ts: str = "start_k",
    strictness: str = "<=",
    keep: Sequence[str] = (),
    bucket: str = "month",
    direction: str = "backward",
) -> DataFrame:
    """The scale form of asof_join (see its docstring): derive validity
    intervals, explode to calendar buckets, equi-join + residual
    filter.

    One interval per direction is open-ended (the last backward, the
    first forward), so instead of enumerating buckets to some fact-side
    extreme (which would need an eager job), the FACT's bucket key is
    clamped to the latest (backward) / earliest (forward) dim bucket:
    every fact beyond that bucket belongs to the open-ended version by
    definition, and the extreme-bucket scalar joins in as a broadcast
    1-row frame, keeping plan construction fully lazy."""
    keep = list(keep) or [c for c in dim.columns if c != dim_ts]
    step = F.expr(f"INTERVAL {_BUCKET_STEP[bucket]}")
    intervals = _asof_intervals(dim, dim_ts, keep, direction)
    # Rename the dim-side columns: max_bucket below also derives from
    # `dim`, and two lineages of the same source make unqualified dim
    # columns ambiguous in the final select.
    # interval endpoints in time order: backward intervals run
    # dim_ts -> _end (lead), forward intervals _end (lag) -> dim_ts
    lo = (
        F.col(dim_ts)
        if direction == "backward"
        else F.coalesce(F.col("_end"), F.col(dim_ts))
    )
    hi = (
        F.coalesce(F.col("_end"), F.col(dim_ts))
        if direction == "backward"
        else F.col(dim_ts)
    )
    cfg_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, lo),
                F.date_trunc(bucket, hi),
                step,
            )
        ),
    ).select(
        F.col(dim_ts).alias("_dim_ts"),
        F.col("_end"),
        F.col("_bucket"),
        *[F.col(c).alias(f"_keep_{c}") for c in keep],
    )
    extreme = dim.agg(
        (
            F.max(F.date_trunc(bucket, F.col(dim_ts)))
            if direction == "backward"
            else F.min(F.date_trunc(bucket, F.col(dim_ts)))
        ).alias("_ext_bucket")
    )
    ts = facts[fact_ts]
    f = facts.join(F.broadcast(extreme))
    clamp = F.least if direction == "backward" else F.greatest
    fact_bucket = clamp(F.date_trunc(bucket, ts), f["_ext_bucket"])
    joined = f.join(
        cfg_b,
        (fact_bucket == cfg_b["_bucket"])
        & _asof_residual(ts, cfg_b, "_dim_ts", strictness, direction),
        "left",
    )
    return joined.select(
        *[facts[c] for c in facts.columns],
        cfg_b["_dim_ts"].alias(dim_ts),
        *[cfg_b[f"_keep_{c}"].alias(c) for c in keep],
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

    Supported hows: inner and left (big-side preserving) - both
    row-identical to the plain join. right/full would emit each
    UNMATCHED small-side row once per salt replica (n_salts copies
    instead of one null-padded row), so they are rejected rather than
    silently wrong.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full outer would duplicate unmatched small-side "
            "rows once per salt replica"
        )
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


def funnel_counts(
    df: DataFrame,
    steps: tuple,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel analysis: how many users reached step k, where a
    user advances from step k to k+1 on their first step-(k+1) event
    with ts STRICTLY GREATER than their step-k event's ts (the standard
    product-analytics funnel, greedy first-match semantics; strict-ts
    advancement matches the relational min-after-join formulation the
    oracle runs, so same-timestamp events of consecutive steps do NOT
    chain - they are simultaneous, not ordered).

    Shape: ONE shuffle total - per-user time-sorted event list (only
    events whose type appears in the funnel are collected), then a pure
    JVM fold advances a step cursor per user; counts come off a
    broadcast-sized per-user frame. The k-way sequential min-after-join
    formulation (the relational route, used by the oracle SQL) costs
    k-1 extra shuffles at fact scale. Events are ordered by (ts, id) so
    the fold is deterministic even under timestamp ties. Steps nobody
    reaches emit no row (matching the oracle's HAVING)."""
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        df.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("_evs")
        )
    )
    zero = F.struct(
        F.lit(0).alias("idx"),
        F.lit(None).cast("timestamp").alias("last_t"),
    )
    reached = per_user.select(
        F.aggregate(
            F.col("_evs"),
            zero,
            lambda acc, ev: F.when(
                (acc["idx"] < F.lit(len(steps)))
                & (ev["e"] == F.element_at(steps_arr, acc["idx"] + 1))
                & (acc["last_t"].isNull() | (ev["t"] > acc["last_t"])),
                F.struct(
                    (acc["idx"] + 1).alias("idx"), ev["t"].alias("last_t")
                ),
            ).otherwise(acc),
        )["idx"].alias("_reached")
    )
    level = F.explode(
        F.sequence(F.lit(1), F.col("_reached"))
    ).alias("step_idx")
    return (
        reached.where(F.col("_reached") >= 1)
        .select(level)
        .groupBy("step_idx")
        .agg(F.count("*").alias("users"))
        .select(
            F.element_at(steps_arr, F.col("step_idx")).alias("step"),
            "step_idx",
            "users",
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the ISO week of
    their first event; each (cohort_week, week_offset) cell counts the
    cohort's users active in that later week - the standard retention
    triangle.

    Shape: activity is first reduced to distinct (user, week) pairs
    (the fact-scale shuffle, and the LAST time row volume matters) and
    PERSISTED - the cohort aggregate and the retention join both
    consume it, and without materialization the broadcast join side
    re-derives the whole fact-scale distinct (the same
    double-compute pathology as the LSH band self-joins). Everything
    after the persist is user-dimension sized."""
    wk = F.to_date(F.date_trunc("week", F.col(ts_col)))
    # lazy localCheckpoint (GC lifecycle) rather than persist: repeated
    # calls must not accumulate CacheManager entries
    active = (
        df.select(F.col(user_col).alias("u"), wk.alias("wk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cohorts = active.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    return (
        active.join(cohorts, "u")
        .select(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("users"))
        .orderBy("cohort_week", "week_offset")
    )


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition counts between consecutive events of the
    same user (the Markov-chain summary behind path/flow analysis):
    (from_type, to_type, n) over per-user (ts, id)-ordered streams.

    One shuffle on user for the lead() window (deterministic order via
    the id tie-break), then a map-side-combinable count on the tiny
    type-pair key."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    return (
        df.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
        .orderBy("from_type", "to_type")
    )


def funnel_step_times(
    df: DataFrame,
    steps: tuple,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user step-advance times for the ordered funnel (the batch
    twin of streaming/stateful.stateful_funnel_stream): one row per
    (user, step_idx) actually reached, with the timestamp of the event
    that advanced the cursor. Same single-shuffle sorted-fold shape as
    funnel_counts, with the accumulator additionally carrying the
    advance list."""
    steps_arr = F.array(*[F.lit(s) for s in steps])
    per_user = (
        df.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(type_col).alias("e"),
                    )
                )
            ).alias("_evs")
        )
    )
    zero = F.struct(
        F.lit(0).alias("idx"),
        F.array().cast("array<struct<i:int,t:timestamp>>").alias("adv"),
    )

    def _last_t(acc):
        return F.element_at(acc["adv"], -1)["t"]

    folded = per_user.select(
        F.col(user_col),
        F.aggregate(
            F.col("_evs"),
            zero,
            lambda acc, ev: F.when(
                (acc["idx"] < F.lit(len(steps)))
                & (ev["e"] == F.element_at(steps_arr, acc["idx"] + 1))
                & ((acc["idx"] == 0) | (ev["t"] > _last_t(acc))),
                F.struct(
                    (acc["idx"] + 1).alias("idx"),
                    F.concat(
                        acc["adv"],
                        F.array(
                            F.struct(
                                (acc["idx"] + 1)
                                .cast("int")
                                .alias("i"),
                                ev["t"].alias("t"),
                            )
                        ),
                    ).alias("adv"),
                ),
            ).otherwise(acc),
        )["adv"].alias("_adv"),
    )
    return (
        folded.select(user_col, F.explode("_adv").alias("_a"))
        .select(
            F.col(user_col),
            F.col("_a.i").alias("step_idx"),
            F.element_at(steps_arr, F.col("_a.i")).alias("step"),
            F.col("_a.t").alias("ts"),
        )
    )

