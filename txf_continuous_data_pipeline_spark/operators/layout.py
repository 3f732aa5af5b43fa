"""Multi-dimensional data layout: Z-order (Morton) clustering.

The 100-TB problem this solves: a date-partitioned/sorted table prunes
beautifully on date and not at all on any second column - every file
spans the full customer/key range, so a 2-D predicate still reads every
file in the date slice. Interleaving the bits of both dimensions'
normalized ranks (the Morton curve) gives files whose min/max envelope
is TIGHT in every interleaved dimension at once; engines that keep
per-file column stats (parquet footers, Delta/Iceberg manifests) then
prune on all of them. Same idea as Delta OPTIMIZE ZORDER BY / Iceberg's
sort-order rewrite, expressed as plain Spark column arithmetic:
min-max scale each dimension to `bits` bits (tiny aggregate broadcast),
interleave JVM-side (shift/or chain - whole-stage codegen, no UDF),
range-partition on the Morton value, sort within partitions, write.

Relation to `sources/io.zorder_key` / `write_zordered` (the write-path
twin): that tier normalizes by RANK (approxQuantile sketch + Arrow
searchsorted) - robust to skew, the right default for writing real
data. This tier normalizes by MIN-MAX as pure column expressions, so
the key is ANSI-SQL-expressible (the `zorder_layout` oracle re-derives
it bit for bit) and the per-file pruning envelopes become a
value-checked report. Same curve, two normalizations, each carrying
the property the other can't: skew robustness vs oracle checkability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_value", "zorder_file_stats"]


def _scaled(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Min-max scale a numeric column to an integer in [0, 2^bits):
    floor((x - lo) / (hi - lo) * 2^bits), clamped so x = hi lands on
    the top cell instead of 2^bits. Degenerate ranges (hi == lo)
    collapse to 0 - the dimension carries no information."""
    span = (hi - lo).cast("double")
    cell = F.when(
        span > 0,
        F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (c.cast("double") - lo.cast("double"))
                / span
                * F.lit(float(1 << bits))
            ),
        ),
    ).otherwise(F.lit(0))
    return cell.cast("long")


def zorder_value(
    dims: list[tuple[Column, Column, Column]], *, bits: int = 16
) -> Column:
    """Morton interleave of pre-scaled dimensions: `dims` is a list of
    (column, lo, hi) triples (lo/hi as broadcast scalar columns - the
    caller crossJoins the 1-row min/max aggregate); bit i of dimension
    d lands at position i * n_dims + d. Pure shift/and/or column
    arithmetic - stays in whole-stage codegen, no UDF, and the same
    expression is directly writable in ANSI SQL for the oracle."""
    n = len(dims)
    scaled = [_scaled(c, lo, hi, bits) for c, lo, hi in dims]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, s in enumerate(scaled):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return z


def zorder_file_stats(
    df: DataFrame,
    dim_cols: list[str],
    *,
    bits: int = 16,
    rows_per_file: int = 1000,
    order_col: Column | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Simulate the layout an engine would write and report each
    file's pruning envelope: rank rows by `order_col` (default: the
    Morton value over `dim_cols`), cut into `rows_per_file` buckets
    (= files), and emit per-file min/max of every dimension - exactly
    the footer/manifest stats a scan prunes on. The demonstration
    artifact for "z-order tightens every dimension's envelope at
    once"; the pytest compares these spans against a single-column
    sort's.

    The ranking window is intentionally global (one sort shuffle) -
    at scale this is repartitionByRange(zval) + files written per
    range, identical stats, no global window; the global form keeps
    the output deterministic and SQL-checkable row for row."""
    from pyspark.sql import Window

    aggs = []
    for c in dim_cols:
        aggs += [
            F.min(c).alias(f"_lo_{c}"),
            F.max(c).alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    with_bounds = df.crossJoin(F.broadcast(bounds))
    z = order_col if order_col is not None else zorder_value(
        [
            (
                F.col(c),
                F.col(f"_lo_{c}"),
                F.col(f"_hi_{c}"),
            )
            for c in dim_cols
        ],
        bits=bits,
    )
    ranked = with_bounds.withColumn("_z", z).withColumn(
        "_rn",
        F.row_number().over(
            Window.orderBy(
                F.col("_z"),
                *[F.col(c) for c in dim_cols],
                *[F.col(c) for c in (tiebreak_cols or [])],
            )
        ),
    )
    out_aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in dim_cols:
        out_aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return (
        ranked.withColumn(
            "file_id",
            F.floor((F.col("_rn") - 1) / F.lit(rows_per_file)).cast(
                "long"
            ),
        )
        .groupBy("file_id")
        .agg(*out_aggs)
    )
