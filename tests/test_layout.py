"""Z-order layout invariants: the Morton curve must tighten the
SECOND dimension's per-file envelope vs a single-column sort (which
leaves it spanning ~the full range in every file), while files stay
exactly rows_per_file and cover every row once."""

from __future__ import annotations

from pyspark.sql import functions as F

from txf_continuous_data_pipeline_spark.operators.layout import (
    zorder_file_stats,
    zorder_value,
)
from txf_continuous_data_pipeline_spark.sources import read_table


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        )
        .cast("long")
        .alias("d_day"),
    )


def test_zorder_files_partition_the_table(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    total = orders.count()
    stats = zorder_file_stats(
        orders,
        ["d_day", "o_custkey"],
        rows_per_file=200,
        tiebreak_cols=["o_orderkey"],
    ).collect()
    assert sum(r["n_rows"] for r in stats) == total
    full = [r for r in stats if r["file_id"] < (total // 200)]
    assert all(r["n_rows"] == 200 for r in full)


def test_zorder_tightens_second_dimension_vs_single_sort(spark, sf_dir):
    orders = _orders(spark, sf_dir)
    z = zorder_file_stats(
        orders,
        ["d_day", "o_custkey"],
        rows_per_file=200,
        tiebreak_cols=["o_orderkey"],
    ).collect()
    by_day = zorder_file_stats(
        orders,
        ["d_day", "o_custkey"],
        rows_per_file=200,
        order_col=F.col("d_day"),
        tiebreak_cols=["o_orderkey"],
    ).collect()

    def mean_span(rows, col):
        spans = [r[f"max_{col}"] - r[f"min_{col}"] for r in rows]
        return sum(spans) / len(spans)

    # A date-only sort leaves every file spanning ~the whole customer
    # range; z-order must cut the mean customer envelope hard (the
    # whole point of the curve), at a bounded cost in date envelope.
    assert mean_span(z, "o_custkey") < 0.5 * mean_span(by_day, "o_custkey")


def test_zorder_value_is_monotone_in_each_dim_locally(spark):
    # Interleave sanity on exact cells: with lo=0, hi=2^bits-1 the
    # scaling is identity-ish; doubling one dim's cell must raise the
    # Morton value when the other dim is held at zero.
    df = spark.range(1).select(
        *[
            zorder_value(
                [(F.lit(x), F.lit(0), F.lit(3)), (F.lit(y), F.lit(0), F.lit(3))],
                bits=2,
            ).alias(f"z_{x}_{y}")
            for x, y in [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3)]
        ]
    ).head()
    # bits interleave as (y1 x1 y0 x0) for dims [x, y]
    assert df["z_0_0"] == 0
    assert df["z_1_0"] == 1  # x bit 0 -> position 0
    assert df["z_0_1"] == 2  # y bit 0 -> position 1
    assert df["z_1_1"] == 3
    assert df["z_3_3"] == 15
