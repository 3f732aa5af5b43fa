from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def q(name: str, sql: str | None):
    """Register a driver-contract query with its DuckDB oracle SQL
    (None -> rows-only check)."""

    def deco(fn: QueryFn):
        assert name not in REGISTRY, f"duplicate query name {name}"
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def corpus_key(spark: SparkSession, sf_dir: str, table: str) -> tuple:
    """THE session-cache key for per-corpus derived artifacts
    (shingle indexes, trained merges, memoized pipeline frames):
    applicationId (a new session rebuilds instead of erroring on gone
    blocks) + the source file's mtime/size (a rewritten corpus
    invalidates). One definition - the review-wave finding was three
    hand-copied implementations of this stamp drifting independently."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    stamp = (os.path.getmtime(path), os.path.getsize(path))
    return (spark.sparkContext.applicationId, sf_dir, stamp)
