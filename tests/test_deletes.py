"""Right-to-be-forgotten propagation: deleting keys from the
date-partitioned sink and decrementing the stored span index must be
EXACTLY equivalent to rebuilding each artifact from the surviving
rows - including the emptied-partition edge dynamic overwrite cannot
express."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.dedup import (
    build_span_index,
)
from txf_continuous_data_pipeline_spark.sources import read_table
from txf_continuous_data_pipeline_spark.sources.io import (
    decrement_span_index_sink,
    delete_from_date_partitioned,
    upsert_date_partitioned,
    write_span_index_sink,
)


def test_delete_from_date_partitioned_matches_rebuild(spark, sf_dir, tmp_path):
    sink = str(tmp_path / "events_sink")
    events = read_table(spark, sf_dir, "events").limit(2000)
    upsert_date_partitioned(events, sink, key_cols=("event_id",))

    # doom every event of ONE full date (the emptied-partition edge)
    # plus a scattered id sample
    one_date = events.select(F.to_date("ts").alias("d")).head()["d"]
    doomed = (
        events.where(F.to_date("ts") == F.lit(one_date))
        .select("event_id")
        .union(events.where(F.col("event_id") % 97 == 0).select("event_id"))
        .distinct()
    )
    n_doomed = (
        events.join(doomed, "event_id", "left_semi").count()
    )
    removed = delete_from_date_partitioned(
        spark, sink, doomed, key_cols=("event_id",)
    )
    assert removed == n_doomed > 0

    left = spark.read.parquet(sink)
    want = events.join(doomed, "event_id", "left_anti")
    assert left.count() == want.count()
    assert (
        left.select("event_id")
        .exceptAll(want.select("event_id"))
        .count()
        == 0
    )
    # the emptied date's directory is GONE, not just unlisted
    import glob
    import os

    assert not glob.glob(os.path.join(sink, f"_date={one_date}"))
    # idempotent: deleting the same keys again removes nothing
    assert delete_from_date_partitioned(spark, sink, doomed) == 0


def test_decrement_span_index_matches_rebuild(spark, sf_dir, tmp_path):
    path = str(tmp_path / "span_index")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    write_span_index_sink(build_span_index(docs), path)

    doomed = docs.where(F.col("doc_id") % 7 == 0)
    survivors = docs.where(F.col("doc_id") % 7 != 0)
    touched = decrement_span_index_sink(spark, path, doomed)
    assert touched > 0

    got = (
        spark.read.parquet(path).select("shingle", "df").collect()
    )
    want = {
        (r["shingle"], r["df"])
        for r in build_span_index(survivors, persist=False).collect()
    }
    assert {(r["shingle"], r["df"]) for r in got} == want
