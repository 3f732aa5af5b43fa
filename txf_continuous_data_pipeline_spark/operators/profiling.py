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
        # backtick-quoted refs: a literal column name containing dots
        # must not be re-parsed as a nested-field path (df[c] parses
        # dots too, so quoting is the only safe form).
        src = F.col(f"`{c}`")
        aggs.append(
            F.count(F.when(src.isNull(), F.lit(1))).alias(f"_nn_{c}")
        )
        aggs.append(distinct_fn(src).alias(f"_nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            aggs.append(F.min(src).cast("double").alias(f"_mn_{c}"))
            aggs.append(F.max(src).cast("double").alias(f"_mx_{c}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                # backtick-quoted: an alias built from a dotted column
                # name must not be re-parsed as a struct-field path
                F.lit(c).alias("column"),
                F.col(f"`_nn_{c}`").cast("long").alias("n_nulls"),
                F.col(f"`_nd_{c}`").cast("long").alias("n_distinct"),
                (
                    F.col(f"`_mn_{c}`")
                    if isinstance(fields[c], _NUMERIC)
                    else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    F.col(f"`_mx_{c}`")
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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC-style diff of two table snapshots: one row per key that was
    added, removed, or changed (any compare_col differs, null-safe),
    tagged with change_type in {'added','removed','changed'}. Unchanged
    keys are dropped - the output is the delta a downstream incremental
    consumer applies.

    Plan: one full outer join on the key columns (the single shuffle
    both sides need anyway), change classification as a pure column
    expression over the joined row - no second pass, no driver-side
    diffing. At 100 TB both snapshots bucket/partition by the same key,
    making the join exchange-free on bucketed sinks.
    """
    keys = list(key_cols)
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = None
    for c in keys:
        eq = F.col(f"_o_{c}") == F.col(f"_n_{c}")
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"_o_{keys[0]}").isNotNull()
    in_new = F.col(f"_n_{keys[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(in_new & ~in_old, F.lit("added"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"_n_{c}"), F.col(f"_o_{c}")).alias(c)
                for c in keys
            ],
            "change_type",
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )


def expect(
    df: DataFrame,
    rules: Sequence[tuple],
) -> DataFrame:
    """Declarative single-pass expectation suite: rules are
    (rule_name, violation_condition Column) pairs; output is one row
    per rule — (rule, n_violations, n_rows, pass_rate) — computed in
    ONE aggregate over ONE scan however many rules there are (each rule
    is a conditional-count aggregate; the per-rule rows come from the
    same literal-struct unpivot as profile_table).

    A uniqueness rule can't be a row predicate; use expect_unique_key
    for that. Rule conditions are VIOLATION predicates (true = bad row),
    so `F.col("x").isNull()` means "expect x non-null".
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, (_name, cond) in enumerate(rules):
        aggs.append(F.count(F.when(cond, F.lit(1))).alias(f"_v_{i}"))
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v_{i}").cast("long").alias("n_violations"),
                F.col("_total").cast("long").alias("n_rows"),
                F.round(
                    F.coalesce(
                        F.lit(1.0)
                        - F.try_divide(F.col(f"_v_{i}"), F.col("_total")),
                        F.lit(1.0),
                    ),
                    6,
                ).alias("pass_rate"),
            )
            for i, (name, _cond) in enumerate(rules)
        ]
    )
    return wide.select(F.explode(rows).alias("_r")).select("_r.*")


def expect_unique_key(
    df: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Key-uniqueness expectation: (rule, n_violations, n_rows,
    pass_rate) where n_violations counts ROWS participating in a
    duplicated key (0 = key is unique). One groupBy on the key — the
    shuffle any duplicate detection needs — then a two-value fold."""
    keys = list(key_cols)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    agg = per_key.agg(
        F.coalesce(
            F.sum(F.when(F.col("_n") > 1, F.col("_n"))), F.lit(0)
        ).alias("_viol"),
        F.coalesce(F.sum("_n"), F.lit(0)).alias("_total"),
    )
    return agg.select(
        F.lit("unique_key:" + ",".join(keys)).alias("rule"),
        F.col("_viol").cast("long").alias("n_violations"),
        F.col("_total").cast("long").alias("n_rows"),
        F.round(
            F.coalesce(
                F.lit(1.0) - F.try_divide(F.col("_viol"), F.col("_total")),
                F.lit(1.0),
            ),
            6,
        ).alias("pass_rate"),
    )


def expect_referential(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fk: str,
    pk: str,
) -> DataFrame:
    """Referential-integrity expectation: fact rows whose `fk` has no
    matching `pk` in the dimension are violations (NULL fks are not -
    use a non-null rule in expect() to forbid them separately). One
    broadcast left join + one aggregate, fully lazy; output shape
    matches expect()/expect_unique_key for unionByName composition
    into one suite."""
    keys = dim.select(F.col(pk).alias("_pk")).distinct()
    j = fact.join(
        F.broadcast(keys), F.col(fk) == F.col("_pk"), "left"
    )
    viol = F.count(
        F.when(F.col(fk).isNotNull() & F.col("_pk").isNull(), F.lit(1))
    )
    return j.agg(
        viol.cast("long").alias("_viol"),
        F.count(F.lit(1)).cast("long").alias("_total"),
    ).select(
        F.lit(f"referential:{fk}->{pk}").alias("rule"),
        F.col("_viol").alias("n_violations"),
        F.col("_total").alias("n_rows"),
        F.round(
            F.coalesce(
                F.lit(1.0) - F.try_divide(F.col("_viol"), F.col("_total")),
                F.lit(1.0),
            ),
            6,
        ).alias("pass_rate"),
    )


def population_stability_index(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value_col: str,
    n_buckets: int = 10,
    lo: float,
    hi: float,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    sample of `value_col`: fixed equal-width buckets over [lo, hi]
    (edge buckets absorb the tails), PSI = sum((p-q)*ln(p/q)) with
    eps-smoothed shares. The standard drift gate: < 0.1 stable,
    0.1-0.25 drifting, > 0.25 shifted.

    Fixed LITERAL bucket edges (caller supplies the range, e.g. from a
    stored profile) keep the whole computation two aggregates + a
    broadcast-size join of 10-row bucket tables — data-derived
    quantile edges would need an extra pass and make the metric
    definition drift with the data it is supposed to judge.

    Output: one row (psi double, n_ref long, n_cur long).
    """
    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("int")

    def shares(df, side):
        counts = df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count(F.lit(1)).alias(f"_n_{side}")
        )
        total = df.agg(F.count(F.lit(1)).alias(f"_t_{side}"))
        return counts, total

    rc, rt = shares(ref, "r")
    cc, ct = shares(cur, "c")
    all_buckets = ref.sparkSession.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    j = (
        all_buckets.join(F.broadcast(rc), "bucket", "left")
        .join(F.broadcast(cc), "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(ct))
    )
    p = F.coalesce("_n_r", F.lit(0)) / F.col("_t_r") + F.lit(eps)
    q = F.coalesce("_n_c", F.lit(0)) / F.col("_t_c") + F.lit(eps)
    return j.agg(
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        F.first("_t_r").cast("long").alias("n_ref"),
        F.first("_t_c").cast("long").alias("n_cur"),
    )


def profile_by_group(
    df: DataFrame,
    *,
    group_col: str,
    columns: Sequence[str],
) -> DataFrame:
    """Per-group column profile: (group, column, n_nulls, n_distinct)
    for each profiled column within each group value — the
    segment-level drift/health view (per source, per language, per
    day) the whole-table profile_table can't give. Same single-pass
    design: one groupBy(group) aggregate computing every column's
    metrics, unpivoted by exploding a literal struct array. Exact
    multi-distinct costs one Expand (input × n_cols) like
    profile_table's; group count only changes the number of OUTPUT
    rows."""
    cols = list(columns)
    aggs = []
    for c in cols:
        src = F.col(f"`{c}`")
        aggs.append(
            F.count(F.when(src.isNull(), F.lit(1))).alias(f"_nn_{c}")
        )
        aggs.append(F.count_distinct(src).alias(f"_nd_{c}"))
    wide = df.groupBy(F.col(f"`{group_col}`").alias("group")).agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"`_nn_{c}`").cast("long").alias("n_nulls"),
                F.col(f"`_nd_{c}`").cast("long").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(
        "group", F.explode(rows).alias("_m")
    ).select("group", "_m.*")
