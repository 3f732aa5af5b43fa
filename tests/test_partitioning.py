"""Date-partitioned layout: a date predicate must prune partitions at
plan time (PartitionFilters), not filter rows after a full scan - the
property the 7-day-lookback incremental read depends on at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.sources.io import write_date_partitioned


def test_date_partition_pruning(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_date")
    events = read_table(spark, sf_dir, "events")
    write_date_partitioned(events, path, ts_col="ts")

    lookback = spark.read.parquet(path).where(
        F.col("_date") >= "2024-01-10"
    )
    plan = lookback._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must be in PartitionFilters, not a
    # post-scan Filter: row counts agree with the unpartitioned source
    expected = events.where(F.to_date("ts") >= "2024-01-10").count()
    assert lookback.count() == expected
    # and fewer files are read than exist (pruning actually happened)
    import glob
    import os

    n_dirs = len(glob.glob(os.path.join(path, "_date=*")))
    kept_dirs = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(path, "_date=*"))
        if p.split("=")[-1] >= "2024-01-10"
    }
    assert 0 < len(kept_dirs) < n_dirs


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path):
    """The bucketing claim made real: two tables bucketed on the join
    key at write time join with ZERO Exchange nodes - the shuffle was
    paid once in the layout."""
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources import read_table
    from txf_continuous_data_pipeline_spark.sources.io import write_bucketed

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", bucket_col="o_orderkey", n_buckets=8,
        sort_col="o_orderkey",
    )
    write_bucketed(
        lineitem, "lineitem_b", bucket_col="l_orderkey", n_buckets=8,
        sort_col="l_orderkey",
    )
    try:
        o_b = spark.table("orders_b")
        l_b = spark.table("lineitem_b")
        # disable broadcast so the join would otherwise shuffle both sides
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = o_b.join(
                l_b, o_b["o_orderkey"] == l_b["l_orderkey"]
            ).groupBy("o_orderpriority").agg(F.count("*").alias("n"))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join itself must carry no exchange; the only exchange
            # allowed is the final single-key aggregate's
            join_part = plan[plan.index("SortMergeJoin"):]
            assert "Exchange" not in join_part, join_part
            # and values match the unbucketed plan
            want = {
                tuple(r)
                for r in orders.join(
                    lineitem,
                    orders["o_orderkey"] == lineitem["l_orderkey"],
                )
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            got = {tuple(r) for r in joined.collect()}
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_compact_date_partitioned(spark, sf_dir, tmp_path):
    """Small-file compaction: a sink left with many per-batch files per
    partition collapses to the byte-target file count, content
    unchanged, already-compact partitions untouched, re-run a no-op."""
    import glob
    import os

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources import read_table
    from txf_continuous_data_pipeline_spark.sources.io import (
        compact_date_partitioned,
        write_date_partitioned,
    )

    path = str(tmp_path / "sink")
    events = read_table(spark, sf_dir, "events")
    # simulate many tiny per-batch appends: 8 files per partition
    write_date_partitioned(events.repartition(8), path)
    before = sorted(
        r for r in spark.read.parquet(path).collect()
    )
    parts = glob.glob(os.path.join(path, "_date=*"))
    files_per_part = {
        p: len(glob.glob(os.path.join(p, "part-*"))) for p in parts
    }
    assert all(n > 1 for n in files_per_part.values()), files_per_part

    stats = compact_date_partitioned(spark, path)
    assert stats["partitions_compacted"] == len(parts)
    assert stats["files_after"] == len(parts)  # tiny data -> 1 file each
    for p in parts:
        assert len(glob.glob(os.path.join(p, "part-*"))) == 1, p
        assert not glob.glob(os.path.join(os.path.dirname(p), "._date=*"))
    after = sorted(r for r in spark.read.parquet(path).collect())
    assert after == before

    # idempotent: nothing left to compact
    again = compact_date_partitioned(spark, path)
    assert again["partitions_compacted"] == 0
    assert again["files_before"] == again["files_after"] == len(parts)


def test_date_partitioned_row_groups_are_time_clustered(
    spark, sf_dir, tmp_path
):
    """sort_within: with row groups forced small, each parquet file's
    groups must carry non-overlapping, ascending ts min/max stats -
    the footer evidence that an intra-day time predicate prunes row
    groups instead of decoding the partition."""
    import glob
    import os

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import (
        write_date_partitioned,
    )

    path = str(tmp_path / "sorted_sink")
    # one calendar day, 200k rows in SHUFFLED ts order - big enough
    # that a 64KB block size forces several row groups per file, and
    # disordered enough that only sortWithinPartitions can produce
    # clustered stats
    events = (
        spark.range(200_000)
        .select(
            F.timestamp_micros(
                F.lit(1704067200000000)  # 2024-01-01 00:00:00 UTC
                + (F.col("id") * 37 % 86_400_000) * 1000
            ).alias("ts"),
            F.col("id").cast("double").alias("value"),
        )
    )
    # runtime spark.conf hadoop keys do not reach in-flight writers;
    # set the hadoop conf directly and restore after
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    # INT96 (the default parquet timestamp encoding) carries no
    # min/max statistics at all - micros is also what a stats-pruning
    # production layout must write
    prev_ts = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        write_date_partitioned(events.repartition(2), path)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev_ts)
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    files = glob.glob(os.path.join(path, "_date=*", "part-*"))
    assert files
    multi_group = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ts_idx = next(
            i for i in range(len(md.schema)) if md.schema.column(i).name == "ts"
        )
        ranges = []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ts_idx).statistics
            ranges.append((st.min, st.max))
        if len(ranges) > 1:
            multi_group += 1
        for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b, (f, ranges)  # sorted, non-overlapping
    assert multi_group, "block size override produced no multi-group file"
    # content unchanged by the sort
    assert (
        spark.read.parquet(path).count() == events.count()
    )


def test_compaction_crash_recovery(spark, sf_dir, tmp_path):
    """The startup recovery pass heals every crash point: a partition
    stranded as '.<part>.old' (crash mid-swap) is restored, stray
    '.compacting' and post-swap '.old' dirs are dropped, and no rows
    are lost."""
    import glob
    import os
    import shutil

    from txf_continuous_data_pipeline_spark.sources import read_table
    from txf_continuous_data_pipeline_spark.sources.io import (
        compact_date_partitioned,
        write_date_partitioned,
    )

    path = str(tmp_path / "sink")
    events = read_table(spark, sf_dir, "events")
    write_date_partitioned(events.repartition(4), path)
    before = spark.read.parquet(path).count()
    parts = sorted(glob.glob(os.path.join(path, "_date=*")))

    # crash mid-swap: partition exists only as hidden .old
    victim = parts[0]
    vname = os.path.basename(victim)
    os.rename(victim, os.path.join(path, f".{vname}.old"))
    # crash mid-rewrite elsewhere: leftover .compacting junk
    junk = os.path.join(path, f".{os.path.basename(parts[1])}.compacting")
    os.makedirs(junk)
    # crash after swap: .old twin alongside a live partition
    shutil.copytree(parts[2], os.path.join(path, f".{os.path.basename(parts[2])}.old"))

    stats = compact_date_partitioned(spark, path)
    assert not glob.glob(os.path.join(path, ".*old"))
    assert not glob.glob(os.path.join(path, ".*compacting"))
    assert sorted(glob.glob(os.path.join(path, "_date=*"))) == parts
    assert spark.read.parquet(path).count() == before
    assert stats["partitions_compacted"] == len(parts)


def test_compaction_preserves_time_clustering(spark, sf_dir, tmp_path):
    """Compacting a time-clustered sink must keep row-group ts stats
    sorted and non-overlapping (the compactor re-sorts and pins
    TIMESTAMP_MICROS - a naive concat-rewrite would interleave runs
    and drop the stats tier)."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import (
        compact_date_partitioned,
        write_date_partitioned,
    )

    path = str(tmp_path / "sink")
    events = (
        spark.range(120_000)
        .select(
            F.timestamp_micros(
                F.lit(1704067200000000)
                + (F.col("id") * 37 % 86_400_000) * 1000
            ).alias("ts"),
            F.col("id").cast("double").alias("value"),
        )
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        # 6 small files in the one partition -> compaction will rewrite.
        # No session timestamp-type pin here: the point is that the
        # COMPACTOR pins TIMESTAMP_MICROS itself for the rewrite.
        write_date_partitioned(events.repartition(6), path)
        stats = compact_date_partitioned(
            spark, path, target_file_bytes=1 << 30
        )
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)
    assert stats["partitions_compacted"] == 1
    files = glob.glob(os.path.join(path, "_date=*", "part-*"))
    assert len(files) == 1
    md = pq.ParquetFile(files[0]).metadata
    ts_idx = next(
        i for i in range(len(md.schema)) if md.schema.column(i).name == "ts"
    )
    ranges = [
        (
            md.row_group(g).column(ts_idx).statistics.min,
            md.row_group(g).column(ts_idx).statistics.max,
        )
        for g in range(md.num_row_groups)
    ]
    assert len(ranges) > 1, "need multiple row groups to prove clustering"
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, ranges
    assert spark.read.parquet(path).count() == 120_000


def test_zorder_tightens_both_dimensions(spark, tmp_path):
    """Z-ordering by (x, y) must shrink the summed per-row-group
    min/max extent of BOTH columns versus an unclustered write - the
    footer-stats evidence that selective predicates on either column
    skip most groups. Deterministic data: a 256x256 grid in shuffled
    order."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import write_zordered

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            ((F.col("id") * 2654435761) % 256).alias("y"),  # shuffled
            F.col("id").alias("payload"),
        )
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev = hconf.get("parquet.block.size")
    hconf.set("parquet.block.size", str(64 * 1024))
    try:
        plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
        grid.repartition(4).write.parquet(plain)
        write_zordered(grid, zord, cols=["x", "y"], n_files=4)
    finally:
        if prev is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev)

    def extent(path, col):
        total = groups = 0
        for f in glob.glob(os.path.join(path, "part-*")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i
                for i in range(len(md.schema))
                if md.schema.column(i).name == col
            )
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += st.max - st.min
                groups += 1
        return total / groups, groups

    x_plain, gp = extent(plain, "x")
    y_plain, _ = extent(plain, "y")
    x_z, gz = extent(zord, "x")
    y_z, _ = extent(zord, "y")
    assert gp > 1 and gz > 1, (gp, gz)
    # both dimensions tighten substantially (a single-column sort would
    # tighten one and leave the other at full range)
    assert x_z < x_plain * 0.5, (x_z, x_plain)
    assert y_z < y_plain * 0.5, (y_z, y_plain)
    # content preserved
    assert (
        spark.read.parquet(zord).count() == 256 * 256
    )


def test_zorder_guards(spark):
    import pytest
    from pyspark.sql import functions as F

    from txf_continuous_data_pipeline_spark.sources.io import zorder_key

    df = spark.range(10).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    )
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="63"):
        zorder_key(df, ["a", "b"], bits=32)
