"""External settlement-config ingestion (S3 faithful): typed coercion,
null-key drop, and strict up-front validation."""

from __future__ import annotations

import pytest

from txf_continuous_data_pipeline_spark.sources import read_settle_config

CFG_PATH = "/root/repo/tests/fixtures/settle_config.csv"


def test_null_key_rows_dropped_and_bad_values_coerced(spark):
    cfg = read_settle_config(spark, CFG_PATH)
    rows = {r["contract_year_month"]: r for r in cfg.collect()}
    # 7 file rows -> 6 kept (the empty-key row is dropped, F1)
    assert len(rows) == 6 and "" not in rows
    # 'n/a' diff and empty accumulated coerce to null, row kept (P4)
    dirty = rows["202412"]
    assert dirty["next_contract_diff"] is None
    assert dirty["accumulated_contract_diff"] is None
    # clean rows fully typed (P4/P5)
    clean = rows["202402"]
    assert clean["next_contract_diff"] == 15.0
    assert clean["start_k"].isoformat() == "2024-01-03T13:30:00"


def test_strict_mode_rejects_unparseable_rows(spark):
    with pytest.raises(ValueError, match="unparseable"):
        read_settle_config(spark, CFG_PATH, strict=True)


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "cfg.parquet")
    read_settle_config(spark, CFG_PATH).write.parquet(p)
    again = read_settle_config(spark, p)
    assert again.count() == 6


def test_strict_mode_rejects_overlapping_intervals(spark, tmp_path):
    p = tmp_path / "overlap.csv"
    p.write_text(
        "contract_year_month,next_contract_diff,accumulated_contract_diff,start_k,settle_k\n"
        "202401,1,0,2024-01-01 00:00:00,2024-01-20 00:00:00\n"
        "202402,2,1,2024-01-15 00:00:00,2024-02-20 00:00:00\n"
    )
    with pytest.raises(ValueError, match="overlap"):
        read_settle_config(spark, str(p), strict=True)


def test_strict_mode_accepts_clean_config(spark, tmp_path):
    p = tmp_path / "clean.csv"
    p.write_text(
        "contract_year_month,next_contract_diff,accumulated_contract_diff,start_k,settle_k\n"
        "202401,1,0,2024-01-01 00:00:00,2024-01-20 00:00:00\n"
        "202402,2,1,2024-01-20 00:05:00,2024-02-20 00:00:00\n"
    )
    assert read_settle_config(spark, str(p), strict=True).count() == 2


def test_upsert_date_partitioned_merge_semantics(spark, tmp_path):
    """Latest-per-key merge: updates win over sink rows, re-running the
    same batch changes nothing, untouched partitions stay untouched."""
    import datetime as dt

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import (
        upsert_date_partitioned,
    )

    path = str(tmp_path / "sink")
    t0 = dt.datetime(2024, 1, 1, 10)
    t1 = dt.datetime(2024, 1, 2, 10)
    base = spark.createDataFrame(
        [(1, t0, 10.0), (2, t0, 20.0), (3, t1, 30.0)],
        "event_id long, ts timestamp, value double",
    )
    assert upsert_date_partitioned(base, path) == 3

    # update key 1 (newer ts), insert key 4; day-2 partition untouched
    upd = spark.createDataFrame(
        [(1, t0.replace(hour=12), 11.0), (4, t0, 40.0)],
        "event_id long, ts timestamp, value double",
    )
    upsert_date_partitioned(upd, path)
    got = {
        r.event_id: (r.value, r.ts)
        for r in spark.read.parquet(path).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1][0] == 11.0 and got[2][0] == 20.0 and got[3][0] == 30.0

    # idempotent re-run: same winners, same row count
    upsert_date_partitioned(upd, path)
    again = {
        r.event_id: r.value for r in spark.read.parquet(path).collect()
    }
    assert again == {1: 11.0, 2: 20.0, 3: 30.0, 4: 40.0}

    # same-version conflict: incoming row wins (source rank tie-break)
    conflict = spark.createDataFrame(
        [(2, t0, 21.0)], "event_id long, ts timestamp, value double"
    )
    upsert_date_partitioned(conflict, path)
    final = {r.event_id: r.value for r in spark.read.parquet(path).collect()}
    assert final[2] == 21.0


def test_upsert_key_moves_partitions(spark, tmp_path):
    """key_moves_partitions=True: a key whose new version lands on a
    DIFFERENT date leaves exactly one winner (the old partition's twin
    is removed, even when that empties the partition), and a stale
    incoming row loses to a newer version in another partition."""
    import datetime as dt

    from txf_continuous_data_pipeline_spark.sources.io import (
        upsert_date_partitioned,
    )

    path = str(tmp_path / "sink")
    d1 = dt.datetime(2024, 1, 1, 10)
    d2 = dt.datetime(2024, 1, 2, 10)
    d3 = dt.datetime(2024, 1, 3, 10)
    base = spark.createDataFrame(
        [(1, d1, 10.0), (2, d2, 20.0)],
        "event_id long, ts timestamp, value double",
    )
    upsert_date_partitioned(base, path, key_moves_partitions=True)

    # key 1 moves day1 -> day3 (day1 partition becomes empty)
    upsert_date_partitioned(
        spark.createDataFrame(
            [(1, d3, 11.0)], "event_id long, ts timestamp, value double"
        ),
        path,
        key_moves_partitions=True,
    )
    rows = spark.read.parquet(path).collect()
    got = {(r.event_id, r.ts, r.value) for r in rows}
    assert got == {(1, d3, 11.0), (2, d2, 20.0)}, got

    # stale incoming for key 1 (ts before the d3 version): loses even
    # though it lands on a partition that holds no newer twin
    upsert_date_partitioned(
        spark.createDataFrame(
            [(1, d1, 9.0)], "event_id long, ts timestamp, value double"
        ),
        path,
        key_moves_partitions=True,
    )
    rows = spark.read.parquet(path).collect()
    got = {(r.event_id, r.ts, r.value) for r in rows}
    assert got == {(1, d3, 11.0), (2, d2, 20.0)}, got

    # documented default-contract failure shape: without the flag the
    # pruned merge cannot see the other partition, so the moved key
    # gains a duplicate - the reason the contract exists
    upsert_date_partitioned(
        spark.createDataFrame(
            [(2, d1, 22.0)], "event_id long, ts timestamp, value double"
        ),
        path,
    )
    ids = [r.event_id for r in spark.read.parquet(path).collect()]
    assert sorted(ids) == [1, 2, 2]


def test_upsert_key_moves_random_differential(spark, tmp_path):
    """Sequential randomized differential: four batches of (key, ts,
    value) with keys freely moving between dates, applied with
    key_moves_partitions=True, must end exactly at a dict fold's
    latest-wins state (max ts per key; on an exact ts tie the incoming
    row wins)."""
    import datetime as dt
    import random

    from txf_continuous_data_pipeline_spark.sources.io import (
        upsert_date_partitioned,
    )

    rng = random.Random(11)
    days = [dt.datetime(2024, 1, d, 12) for d in (1, 2, 3, 4)]
    path = str(tmp_path / "sink")
    expect: dict = {}
    for batch_i in range(4):
        rows = []
        seen = set()
        for _ in range(rng.randint(5, 15)):
            k = rng.randint(0, 9)
            if k in seen:  # one row per key per batch keeps the
                continue  # reference fold order-independent
            seen.add(k)
            ts = rng.choice(days) + dt.timedelta(
                minutes=rng.randint(0, 5)
            )
            v = round(rng.random() * 100, 2)
            rows.append((k, ts, v))
            cur = expect.get(k)
            if cur is None or ts >= cur[0]:  # tie -> incoming wins
                expect[k] = (ts, v)
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        )
        upsert_date_partitioned(df, path, key_moves_partitions=True)

    got = {
        r.event_id: (r.ts, r.value)
        for r in spark.read.parquet(path).collect()
    }
    assert got == expect


def test_merge_aggregate_sink_matches_full_recompute(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import (
        merge_aggregate_sink,
    )

    path = str(tmp_path / "agg_sink")
    rng = random.Random(5)
    batches = [
        [
            (rng.randrange(40), rng.choice("xyz"), rng.uniform(0, 10))
            for _ in range(200)
        ]
        for _ in range(3)
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "k long, g string, v double")
        merge_aggregate_sink(
            df, path, keys=("k", "g"), sum_cols=("v",), batch_id=i
        )

    got = {
        (r["k"], r["g"]): (r["_cnt"], round(r["_sum_v"], 9))
        for r in spark.read.parquet(path).collect()
    }
    all_rows = [r for b in batches for r in b]
    full = (
        spark.createDataFrame(all_rows, "k long, g string, v double")
        .groupBy("k", "g")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("v").alias("s"))
    )
    want = {
        (r["k"], r["g"]): (r["c"], round(r["s"], 9)) for r in full.collect()
    }
    assert got == want


def test_merge_aggregate_sink_replay_is_noop(spark, tmp_path):
    from txf_continuous_data_pipeline_spark.sources.io import (
        merge_aggregate_sink,
    )

    path = str(tmp_path / "agg_sink2")
    df1 = spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 5.0)], "k long, v double"
    )
    df2 = spark.createDataFrame([(1, 10.0)], "k long, v double")
    assert merge_aggregate_sink(
        df1, path, keys=("k",), sum_cols=("v",), batch_id=0
    ) > 0
    assert merge_aggregate_sink(
        df2, path, keys=("k",), sum_cols=("v",), batch_id=1
    ) > 0
    snapshot = sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("k", "_cnt", "_sum_v").collect()
    )
    # at-least-once replay of batch 1: every touched bucket is at
    # watermark already -> zero buckets merged, sink unchanged
    assert merge_aggregate_sink(
        df2, path, keys=("k",), sum_cols=("v",), batch_id=1
    ) == 0
    assert sorted(
        tuple(r) for r in spark.read.parquet(path)
        .select("k", "_cnt", "_sum_v").collect()
    ) == snapshot
    assert snapshot == [(1, 3, 15.0), (2, 1, 5.0)]


def test_merge_aggregate_sink_untouched_buckets_not_rewritten(
    spark, tmp_path
):
    import glob
    import os

    from txf_continuous_data_pipeline_spark.sources.io import (
        merge_aggregate_sink,
    )

    path = str(tmp_path / "agg_sink3")
    big = spark.createDataFrame(
        [(k, float(k)) for k in range(200)], "k long, v double"
    )
    merge_aggregate_sink(big, path, keys=("k",), sum_cols=("v",),
                         batch_id=0, n_buckets=8)
    mtimes = {
        d: os.path.getmtime(d)
        for d in glob.glob(os.path.join(path, "_bucket=*"))
    }
    import time as _t

    _t.sleep(1.1)
    one = spark.createDataFrame([(7, 1.0)], "k long, v double")
    merged = merge_aggregate_sink(one, path, keys=("k",), sum_cols=("v",),
                                  batch_id=1, n_buckets=8)
    assert merged == 1
    changed = [
        d
        for d in glob.glob(os.path.join(path, "_bucket=*"))
        if os.path.getmtime(d) != mtimes.get(d)
    ]
    assert len(changed) == 1, changed


def test_merge_aggregate_sink_count_only(spark, tmp_path):
    from txf_continuous_data_pipeline_spark.sources.io import (
        merge_aggregate_sink,
    )

    path = str(tmp_path / "agg_counts")
    merge_aggregate_sink(
        spark.createDataFrame([(1,), (1,), (2,)], "k long"),
        path, keys=("k",), batch_id=0,
    )
    merge_aggregate_sink(
        spark.createDataFrame([(1,)], "k long"),
        path, keys=("k",), batch_id=1,
    )
    got = sorted(
        (r["k"], r["_cnt"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [(1, 3), (2, 1)]
