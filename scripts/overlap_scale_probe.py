"""Bucket-granularity sweep for the binned interval-overlap join -
the measurement behind SCALE.md's session_overlap_stats row.

For each bucket granularity: bucket rows per interval (explode factor),
bucket-join candidate count, emitted true pairs, and the residual keep
ratio. The claim it backs: candidate mass tracks the true-pair output
(the irreducible lower bound for an overlap join), and bucket width ~
median interval length minimizes the constant.

Usage: python scripts/overlap_scale_probe.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.relational import (
    session_stats,
)
from txf_continuous_data_pipeline_spark.session import get_spark
from txf_continuous_data_pipeline_spark.sources import read_table

STEP = {"minute": "1 minute", "hour": "1 hour"}


def probe(spark, sf_dir: str, gran: str) -> dict:
    events = read_table(spark, sf_dir, "events").select("user_id", "ts")
    sess = session_stats(
        events, key_col="user_id", ts_col="ts", gap="30 minutes"
    )
    binned = sess.select(
        "user_id",
        "session_seq",
        F.col("session_start").alias("s"),
        F.col("session_end").alias("e"),
        F.explode(
            F.sequence(
                F.date_trunc(gran, "session_start"),
                F.date_trunc(gran, "session_end"),
                F.expr(f"INTERVAL {STEP[gran]}"),
            )
        ).alias("b"),
    ).localCheckpoint(eager=True)
    n_sessions = sess.count()
    n_rows = binned.count()
    a, b = binned.alias("a"), binned.alias("b")
    t0 = time.perf_counter()
    candidates = a.join(
        b,
        (F.col("a.b") == F.col("b.b"))
        & (F.col("a.user_id") < F.col("b.user_id")),
    ).count()
    pairs = (
        a.join(
            b,
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select("a.user_id", "a.session_seq", "b.user_id", "b.session_seq")
        .distinct()
        .count()
    )
    return {
        "sf_dir": sf_dir,
        "bucket": gran,
        "sessions": n_sessions,
        "binned_rows": n_rows,
        "rows_per_interval": (
            round(n_rows / n_sessions, 2) if n_sessions else None
        ),
        "candidates": candidates,
        "true_pairs": pairs,
        "residual_keep": (
            round(pairs / candidates, 4) if candidates else None
        ),
        "sec": round(time.perf_counter() - t0, 1),
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark("overlap_probe")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in sf_dirs:
        for gran in ("hour", "minute"):
            print(json.dumps(probe(spark, sf_dir, gran)))


if __name__ == "__main__":
    main()
