"""Entity-resolution / record-linkage operators.

The reference pipeline joins rows on exact keys only (contract codes,
`main.py:553`-style config lookups); a training-data pipeline also needs
FUZZY matching — the same product/entity spelled slightly differently
across sources. The classic scale recipe (Fellegi-Sunter era onward) is
blocking: candidate pairs come from cheap equi-joins on one or more
blocking keys, and only candidates pay the expensive string-distance
verify. All-pairs comparison is O(n²) and never runs.

Also here: the interval-overlap self-join (which entities were active at
the same time) via the standard time-bucket binning that turns an
inequality join into an equi-join + residual filter — the same move
`asof_join_bucketed` uses for as-of semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_STEP = {
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
    "week": "1 week",
    "month": "1 month",
}


def blocked_fuzzy_pairs(
    df: DataFrame,
    *,
    name_col: str,
    max_distance: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Fuzzy-duplicate name pairs via token blocking + edit-distance
    verify.

    Semantics (what the oracle checks): over the DISTINCT values of
    `name_col`, every unordered pair that (a) shares its first OR last
    whitespace token and (b) has Levenshtein distance <= max_distance.
    The token share is part of the declared contract, not a lossy
    shortcut hidden from the caller — production blocking always is
    (a pair sharing no block key is by definition not a candidate).
    tests/test_linkage.py additionally measures blocking recall against
    the unblocked ground truth on testdata (100% there).

    Scale shape: names are deduplicated before anything else (distinct
    names ≪ rows for catalog-like columns), then each name emits its
    block keys via explode and candidates come from one equi-join on
    (block_kind, block_key). A pair sharing both keys appears twice, so
    pairs are made distinct BEFORE the Levenshtein verify — the verify
    runs once per candidate. No cross join anywhere; a hot block costs
    O(block²) which is the irreducible candidate mass for that key.
    `max_block_size` (opt-in) is the hot-key mitigation for corpora
    where one token dominates (the fuzzy twin of the dedup stack's
    stop_shingle_filter): blocks larger than the cap are DROPPED, a
    declared recall trade documented to the caller, bounding any
    block's pair mass at cap².
    """
    names = df.select(F.col(name_col).alias("_name")).distinct()
    # Block keys come from a whitespace-NORMALIZED form (trim + collapse
    # runs to one space) split on a single literal space — the exact
    # splitter the DuckDB oracle uses. Tokenizing the raw name with \s+
    # while the oracle split on ' ' made consecutive/leading whitespace
    # produce different block keys per engine (ADVICE r5). Pairs are
    # still reported with the ORIGINAL names.
    norm = F.trim(F.regexp_replace(F.col("_name"), r"\s+", " "))
    keyed = names.select(
        "_name",
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("_kind"),
                    F.element_at(F.split(norm, " "), 1).alias("_key"),
                ),
                F.struct(
                    F.lit("last").alias("_kind"),
                    F.element_at(F.split(norm, " "), -1).alias("_key"),
                ),
            )
        ).alias("_bk"),
    ).select("_name", "_bk._kind", "_bk._key")
    if max_block_size is not None:
        sizes = keyed.groupBy("_kind", "_key").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        keyed = (
            keyed.join(F.broadcast(sizes), ["_kind", "_key"])
            .where(F.col("_bn") <= max_block_size)
            .drop("_bn")
        )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._kind") == F.col("b._kind"))
            & (F.col("a._key") == F.col("b._key"))
            & (F.col("a._name") < F.col("b._name")),
        )
        .select(
            F.col("a._name").alias("name_a"),
            F.col("b._name").alias("name_b"),
        )
        .distinct()
    )
    return cand.withColumn(
        "edit_dist", F.levenshtein("name_a", "name_b")
    ).where(F.col("edit_dist") <= max_distance)


def interval_overlap_pairs(
    intervals: DataFrame,
    *,
    entity_col: str,
    seq_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Pairs of intervals belonging to DIFFERENT entities that overlap
    in time (inclusive ends: a.start <= b.end AND b.start <= a.end).

    The naive plan is an inequality self-join — a cartesian product at
    scale. Binning restores an equi-join: each interval explodes to the
    calendar buckets it touches, candidates come from equal bucket keys,
    and the true overlap predicate runs as a residual filter. Two
    overlapping intervals share the bucket of any instant inside the
    overlap, so binning is lossless; a pair can share several buckets,
    so pairs are made distinct after the residual. Cost is
    O(sum buckets-per-interval) join input — pick `bucket` ≈ the median
    interval length so most intervals emit 1–2 rows.

    Output: (entity_a, seq_a, entity_b, seq_b, overlap_us) with
    entity_a < entity_b and overlap_us the overlap length in exact
    integer microseconds (identical-instant touch = 0) — integer math
    end-to-end, so the oracle comparison is FP-free.
    """
    step = F.expr(f"INTERVAL {_BUCKET_STEP[bucket]}")
    binned = intervals.select(
        F.col(entity_col).alias("_ent"),
        F.col(seq_col).alias("_seq"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(bucket, F.col(end_col)),
                step,
            )
        ).alias("_bucket"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    return (
        a.join(
            b,
            (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._ent") < F.col("b._ent"))
            & (F.col("a._s") <= F.col("b._e"))
            & (F.col("b._s") <= F.col("a._e")),
        )
        .select(
            F.col("a._ent").alias("entity_a"),
            F.col("a._seq").alias("seq_a"),
            F.col("b._ent").alias("entity_b"),
            F.col("b._seq").alias("seq_b"),
            (
                F.unix_micros(F.least(F.col("a._e"), F.col("b._e")))
                - F.unix_micros(F.greatest(F.col("a._s"), F.col("b._s")))
            ).alias("overlap_us"),
        )
        .distinct()
    )


def scd2_build(
    changes: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change feed.

    Collapses consecutive rows of one key with the SAME attribute value
    into a single validity interval (the SCD2 run-length contract), then
    closes each interval at the next run's start:

      (key, attr, valid_from, valid_to, is_current)

    valid_to is NULL on the live row. Deterministic under timestamp
    collisions via `tiebreak_col` in the ordering. One shuffle on
    key_col; both window passes reuse the same partitioning, so Catalyst
    plans a single Exchange. The streaming twin of this shape is
    applyInPandasWithState keyed on key_col (streaming/stateful.py);
    this batch form is the oracle-checkable one.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    # Null-safe change detection: `prev != attr` is NULL (not true) for
    # a change TO null, and `prev IS NULL` cannot distinguish "first
    # row" from "previous value was null" - so a lag over a constant
    # marks the first row, and eqNullSafe treats null as an ordinary
    # distinct value (matching the streaming twin's Python `!=`).
    first = F.lag(F.lit(1)).over(w).isNull()
    runs = (
        changes.withColumn(
            "_chg",
            (first | ~prev.eqNullSafe(F.col(attr_col))).cast("int"),
        )
        .where(F.col("_chg") == 1)
        .drop("_chg")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return runs.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
