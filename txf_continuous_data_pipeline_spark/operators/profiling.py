"""Data-profiling / data-quality operators.

A pipeline feeding model training needs to SEE its data before trusting
it: per-column null rates and cardinalities (schema-drift and
join-key-health checks), and distributional outlier flags on metric
columns. The reference pipeline hard-codes its quality gates
(`main.py` completeness checks); these operators are the generic,
any-table form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    *,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """One-pass column profile: (column, n_nulls, n_distinct, min_num,
    max_num) per profiled column, min/max as DOUBLE for numeric columns
    and NULL otherwise.

    All metrics for all columns are computed in a SINGLE aggregate over
    one scan — the per-column rows come from exploding a literal
    metric-struct array afterwards (driver-free unpivot), not from N
    scans. With exact_distinct=True Spark plans the multi-column
    count(DISTINCT) via Expand (input × n_cols rows into the partial
    aggregate) — exact, and what the DuckDB oracle can reproduce. At
    100 TB set exact_distinct=False: approx_count_distinct keeps the
    pass at one Expand-free scan with HLL partials, the right profiling
    answer at scale (cardinality estimates don't need exactness).
    """
    cols = list(columns) if columns is not None else df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    distinct_fn = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    aggs = []
    for c in cols:
        aggs.append(
            F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"_nn_{c}")
        )
        aggs.append(distinct_fn(F.col(c)).alias(f"_nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("long").alias("n_distinct"),
                (
                    F.col(f"_mn_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"_mx_{c}")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("_m"))
        .select("_m.*")
    )


def group_zscore_outliers(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_cols: Sequence[str],
    threshold: float = 3.0,
) -> DataFrame:
    """Rows whose `value_col` deviates more than `threshold` sample
    standard deviations from their group's mean.

    Plan: group stats via groupBy (map-side partial aggregation, tiny
    result) broadcast-joined back onto the facts — NOT a window over
    the whole fact table, which would shuffle every row by group_col
    and sort it just to attach two scalars. The stats frame has one row
    per group, so the join side is always broadcastable; the fact side
    never shuffles at all. Output z rounded to 4 for hash stability.
    """
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_m"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    # try_divide: a constant group has sd == 0 -> z undefined (NULL,
    # never flagged) instead of an ANSI DIVIDE_BY_ZERO error.
    z = F.try_divide(F.col(value_col) - F.col("_m"), F.col("_sd"))
    return (
        df.join(F.broadcast(stats), group_col)
        .withColumn("zscore", F.round(z, 4))
        .where(F.abs(z) > F.lit(threshold))
        .select(*id_cols, group_col, value_col, "zscore")
    )
