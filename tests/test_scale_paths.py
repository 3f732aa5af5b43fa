"""The advertised 100-TB rewrites must be row-identical to their
reference forms: backadjust_bucketed == backadjust, and
asof_join's bucketed plan == the broadcast+fold plan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.adjust import (
    backadjust,
    backadjust_bucketed,
)
from txf_continuous_data_pipeline_spark.operators.relational import (
    asof_join,
    asof_join_bucketed,
)
from txf_continuous_data_pipeline_spark.plans.pipeline import (
    weekly_settle_config,
)
from txf_continuous_data_pipeline_spark.sources import (
    read_settle_config,
    read_table,
)

CFG_PATH = "/root/repo/tests/fixtures/settle_config.csv"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.collect()]
    )


def test_backadjust_bucketed_equals_backadjust_weekly(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    bars = events.select(
        "event_id", "ts", F.col("value").alias("close")
    )
    cfg = weekly_settle_config(events)
    plain = backadjust(
        bars, cfg, ts_col="ts", price_cols=("close",), end_inclusive=False
    )
    bucketed = backadjust_bucketed(
        bars, cfg, ts_col="ts", price_cols=("close",), end_inclusive=False
    )
    assert plain.columns == bucketed.columns
    assert _rows(plain) == _rows(bucketed)


def test_backadjust_bucketed_equals_backadjust_cfgfile(spark, sf_dir):
    # File config: 13:25/13:30 interval bounds cross month boundaries
    # (202401 starts 2023-12-20), exercising the multi-bucket explode.
    events = read_table(spark, sf_dir, "events")
    bars = events.select("event_id", "ts", F.col("value").alias("close"))
    cfg = read_settle_config(spark, CFG_PATH)
    plain = backadjust(
        bars, cfg, ts_col="ts", price_cols=("close",), end_inclusive=True
    )
    bucketed = backadjust_bucketed(
        bars, cfg, ts_col="ts", price_cols=("close",), end_inclusive=True
    )
    assert _rows(plain) == _rows(bucketed)


def _versioned_dim(spark, n):
    # n versions, 6-hourly starts from Jan 1 - spans month boundaries
    # when n > 124.
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(hours=6 * i), f"v{i}", float(i)) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "start_k timestamp, version string, rate double"
    )


def test_asof_bucketed_equals_broadcast(spark, sf_dir):
    facts = read_table(spark, sf_dir, "events").select("event_id", "ts")
    dim = _versioned_dim(spark, 140)
    for strictness in ("<=", "<"):
        bcast = asof_join(
            facts, dim, fact_ts="ts", dim_ts="start_k",
            strictness=strictness, plan="broadcast",
        )
        bucketed = asof_join_bucketed(
            facts, dim, fact_ts="ts", dim_ts="start_k",
            strictness=strictness,
        )
        assert bcast.columns == bucketed.columns
        assert _rows(bcast) == _rows(bucketed)


def test_asof_auto_switches_to_bucketed_plan(spark, sf_dir):
    facts = read_table(spark, sf_dir, "events").select("event_id", "ts")
    dim = _versioned_dim(spark, 140)  # > ASOF_BUCKETED_THRESHOLD
    auto = asof_join(facts, dim, fact_ts="ts", dim_ts="start_k")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    # bucketed = KEYED join on the clamped bucket (hash or sort-merge,
    # Catalyst's pick by stats) - never a nested loop over the residual
    # predicate; the only nested-loop allowed is the 1-row max-bucket
    # scalar cross join.
    keyed = (
        "SortMergeJoin" in plan
        or "BroadcastHashJoin" in plan
        or "ShuffledHashJoin" in plan
    )
    assert keyed, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    explicit = asof_join_bucketed(facts, dim, fact_ts="ts", dim_ts="start_k")
    assert _rows(auto) == _rows(explicit)


def test_asof_preserves_duplicate_fact_rows_in_both_plans(spark):
    # Exact-duplicate fact rows must survive every plan identically
    # (the old broadcast+fold form silently merged them).
    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2, 12, 0))] * 2
        + [(2, dt.datetime(2024, 1, 3, 12, 0))],
        "event_id long, ts timestamp",
    )
    dim = _versioned_dim(spark, 3)
    for plan in ("broadcast", "bucketed"):
        out = asof_join(
            facts, dim, fact_ts="ts", dim_ts="start_k", plan=plan
        )
        assert out.count() == 3, plan


def test_asof_bucketed_fact_after_last_version_matches_it(spark):
    # The open-ended last interval: a fact months past the last
    # version's bucket must still match it (clamped bucket key).
    facts = spark.createDataFrame(
        [(1, dt.datetime(2024, 9, 15, 3, 0))], "event_id long, ts timestamp"
    )
    dim = _versioned_dim(spark, 3)  # versions on 2024-01-01 .. +12h
    row = asof_join_bucketed(
        facts, dim, fact_ts="ts", dim_ts="start_k"
    ).collect()[0]
    assert row["version"] == "v2" and row["rate"] == 2.0


def test_asof_bucketed_facts_before_first_version_get_nulls(spark):
    facts = spark.createDataFrame(
        [(1, dt.datetime(2023, 12, 31, 23, 0))], "event_id long, ts timestamp"
    )
    dim = _versioned_dim(spark, 3)
    out = asof_join_bucketed(facts, dim, fact_ts="ts", dim_ts="start_k")
    row = out.collect()[0]
    assert row["version"] is None and row["rate"] is None


def test_asof_forward_broadcast_and_bucketed_identical(spark):
    import datetime as dt

    from txf_continuous_data_pipeline_spark.operators.relational import (
        asof_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [(t0 + dt.timedelta(days=7 * i), f"v{i}") for i in range(8)],
        "start_k timestamp, tag string",
    )
    facts = spark.createDataFrame(
        [
            (i, t0 + dt.timedelta(days=i * 1.37 - 3))
            for i in range(60)
        ],
        "fact_id long, ts timestamp",
    )

    def rows(plan):
        return sorted(
            (r["fact_id"], r["start_k"], r["tag"])
            for r in asof_join(
                facts, dim, fact_ts="ts", dim_ts="start_k",
                keep=("tag",), plan=plan, direction="forward",
                bucket="week",
            ).collect()
        )

    bc, bk = rows("broadcast"), rows("bucketed")
    assert bc == bk

    # naive reference: earliest dim >= ts; facts past the last version
    # match nothing, facts before the first match it
    dim_rows = sorted((r["start_k"], r["tag"]) for r in dim.collect())
    want = []
    for r in facts.collect():
        nxt = next(
            ((k, tag) for k, tag in dim_rows if k >= r["ts"]), (None, None)
        )
        want.append((r["fact_id"], nxt[0], nxt[1]))
    assert bc == sorted(want)
