"""SparkSession factory.

The reference pins all wall-clock logic to UTC+8 naive timestamps
(/root/reference/main.py:236, :350). Here timestamps are kept *naive*:
the session timezone is pinned to UTC so that parquet timestamp values
round-trip bit-identically and match the DuckDB oracle (DuckDB reads
parquet timestamps as naive). All session/window logic in this engine is
pure wall-clock arithmetic on the stored values, so the pinned zone only
needs to be *consistent*, not Taipei-local.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "txf_pipeline_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine.

    Defaults follow the scale guidance: AQE on (runtime re-plan, skew-join,
    partition coalescing), shuffle partitions sized to cores for local mode,
    Arrow enabled for the few pandas-UDF operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # explicit pin of the Spark default: pooled python workers
        # persist across pandas-UDF/mapInPandas stages, so the
        # ~3s worker spawn + numpy import is paid once per session,
        # not once per python-heavy query (r12 A/B,
        # BENCH_DETAIL.json video_phash_neardup_r12)
        .config("spark.python.worker.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # propagate the numpy-THP default (set in the package __init__)
        # to cluster executors; in local mode workers inherit it from
        # this process's environment directly
        .config(
            "spark.executorEnv.NUMPY_MADVISE_HUGEPAGE",
            os.environ.get("NUMPY_MADVISE_HUGEPAGE", "0"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
