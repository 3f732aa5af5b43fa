"""Relational building blocks over the star schema (SURVEY.md 2.9).

The reference contains a single range join and no other relational
algebra; these are the extension operators the engine adds so a user of
the reference's data could run warehouse-style queries at 100-TB scale.
All expressed with built-in DataFrame ops so Catalyst keeps predicate
pushdown / join reordering / broadcast decisions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number over a deterministic order.

    The order_by columns MUST form a total order (include a unique
    tie-breaker) or the result is nondeterministic under shuffle. Scale:
    one hash shuffle on group_cols; with AQE, skewed groups split.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def star_join(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, Column | str]]
) -> DataFrame:
    """Join a fact table against small dimensions, broadcasting each dim.

    Catalyst would usually pick broadcast joins on its own via size
    stats; the explicit hint pins the plan so a mis-estimated dimension
    can never trigger a fact-side shuffle."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out


def exists_filter(
    left: DataFrame, right: DataFrame, on: Column | str, negate: bool = False
) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi / left-anti joins - the shuffle
    only moves join keys, never payload columns of the right side."""
    return left.join(right, on, "left_anti" if negate else "left_semi")
