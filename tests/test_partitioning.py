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
