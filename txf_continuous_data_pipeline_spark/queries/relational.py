"""Star-schema relational queries (SURVEY.md 2.9 extension set).

Float aggregates are rounded identically on both sides (round(x, 2) for
sums, round(x, 4) for averages) so the driver's value-hash is stable
against non-associative FP summation order."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.relational import (
    asof_join,
    exists_filter,
    session_stats,
    star_join,
    top_k_per_group,
)
from ..sources import read_table
from .registry import q


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                       AS sum_qty,
       round(sum(l_extendedprice), 2)                                  AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                       AS avg_qty,
       round(avg(l_extendedprice), 4)                                  AS avg_price,
       round(avg(l_discount), 4)                                       AS avg_disc,
       count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@q("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy two-key aggregate; Catalyst pushes the
    shipdate filter into the parquet scan, partial-aggregates map-side."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_SQL = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@q("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-10.
    customer and orders are broadcast; the only shuffle is the final
    aggregate on l_orderkey. ORDER BY includes l_orderkey so the limit
    is deterministic."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    joined = star_join(
        li,
        [
            (orders, F.col("l_orderkey") == F.col("o_orderkey")),
            (cust, F.col("o_custkey") == F.col("c_custkey")),
        ],
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


_Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@q("q5_region_revenue", _Q5_SQL)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 6-way star join, local-supplier condition
    (s_nationkey = c_nationkey), per-nation revenue. All dimensions
    broadcast; lineitem never shuffles before the final small agg."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(orders), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


_TOPK_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@q("topk_orders_per_priority", _TOPK_SQL)
def topk_orders_per_priority(spark, sf_dir):
    """Ranking window: top-3 orders by totalprice per priority, orderkey
    tie-break for determinism."""
    return top_k_per_group(
        _t(spark, sf_dir, "orders"),
        ["o_orderpriority"],
        [F.desc("o_totalprice"), F.col("o_orderkey")],
        3,
    ).select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")


_HAVING_SQL = """
SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_spent
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 3 AND sum(o_totalprice) > 300000
"""


@q("group_having", _HAVING_SQL)
def group_having(spark, sf_dir):
    """Aggregate + HAVING: high-value repeat customers."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("_total"),
        )
        .where((F.col("n_orders") >= 3) & (F.col("_total") > 300000))
        .select(
            "o_custkey", "n_orders", F.round("_total", 2).alias("total_spent")
        )
    )


@q(
    "semi_customers_with_orders",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
""",
)
def semi_customers_with_orders(spark, sf_dir):
    """EXISTS as a left-semi join (only keys shuffle)."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return exists_filter(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey"
    ).select("c_custkey", "c_name")


@q(
    "anti_customers_without_orders",
    """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def anti_customers_without_orders(spark, sf_dir):
    """NOT EXISTS as a left-anti join."""
    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return exists_filter(
        cust,
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        negate=True,
    ).select("c_custkey", "c_name")


@q(
    "setop_intersect_nations",
    """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
""",
)
def setop_intersect_nations(spark, sf_dir):
    """INTERSECT: nations that have both customers and suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "setop_except_nations",
    """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier
""",
)
def setop_except_nations(spark, sf_dir):
    """EXCEPT (set semantics): nations with customers but no suppliers."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


_ROLLUP_SQL = """
SELECT r_name, n_name, round(sum(c_acctbal), 2) AS total_bal, count(*) AS n_cust
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


@q("rollup_acctbal", _ROLLUP_SQL)
def rollup_acctbal(spark, sf_dir):
    """ROLLUP hierarchy subtotals region -> nation -> grand total."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey")
    ).join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        F.count("*").alias("n_cust"),
    )


_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@q("cube_order_counts", _CUBE_SQL)
def cube_order_counts(spark, sf_dir):
    """CUBE: counts over every (status, priority) subset."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


_PIVOT_SQL = """
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_O,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""


@q("pivot_qty_by_status", _PIVOT_SQL)
def pivot_qty_by_status(spark, sf_dir):
    """PIVOT lineitem quantity over linestatus (explicit value list so
    the plan needs no extra distinct-values job)."""
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
    )


_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n
FROM events
GROUP BY event_type
"""


@q("json_props_agg", _JSON_SQL)
def json_props_agg(spark, sf_dir):
    """P13 extension: JSON extraction from events.props
    (get_json_object stays JVM-side) + aggregate."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


@q("running_total_per_customer", _RUNNING_SQL)
def running_total_per_customer(spark, sf_dir):
    """A7 generalized: per-customer running spend (cumulative window)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


_ARGMAX_SQL = """
SELECT arg_max(n_name, total_bal) AS top_nation, round(max(total_bal), 2) AS top_bal
FROM (
  SELECT n_name, sum(s_acctbal) AS total_bal
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_name
)
"""


@q("argmax_nation_by_supplier_bal", _ARGMAX_SQL)
def argmax_nation_by_supplier_bal(spark, sf_dir):
    """max_by / arg_max (A6 last-row-lookup generalized): nation with the
    largest total supplier balance."""
    sup = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    totals = (
        sup.join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("s_acctbal").alias("total_bal"))
    )
    return totals.agg(
        F.max_by("n_name", "total_bal").alias("top_nation"),
        F.round(F.max("total_bal"), 2).alias("top_bal"),
    )


_ASOF_SQL = """
WITH weeks AS (
  SELECT DISTINCT date_trunc('week', ts)::TIMESTAMP AS start_k FROM events
),
cfg AS (
  SELECT start_k,
         strftime(start_k, '%Y%m%d') AS contract_year_month,
         row_number() OVER (ORDER BY start_k) * 10.0 AS next_contract_diff
  FROM weeks
)
SELECT e.event_id, e.ts, c.start_k, c.contract_year_month, c.next_contract_diff
FROM events e
ASOF LEFT JOIN cfg c ON e.ts >= c.start_k
"""


@q("asof_join_config", _ASOF_SQL)
def asof_join_config(spark, sf_dir):
    """As-of (backward) join: each event picks the latest config version
    with start_k <= ts. The oracle runs DuckDB's native ASOF JOIN - a
    genuinely independent algorithm against the engine's broadcast
    range-join + max_by fold."""
    events = read_table(spark, sf_dir, "events").select("event_id", "ts")
    w = Window.orderBy("start_k")
    cfg = (
        events.select(
            F.date_trunc("week", F.col("ts")).alias("start_k")
        )
        .distinct()
        .select(
            "start_k",
            F.date_format("start_k", "yyyyMMdd").alias("contract_year_month"),
            (F.row_number().over(w) * F.lit(10.0)).alias("next_contract_diff"),
        )
    )
    # plan='broadcast' explicitly: the weeks-of-events dim is
    # structurally tiny, and 'auto' would run an eager dim.count() job
    # at query-construction time (deriving the whole distinct-weeks
    # subplan once extra).
    return asof_join(
        events, cfg, fact_ts="ts", dim_ts="start_k",
        keep=("contract_year_month", "next_contract_diff"),
        plan="broadcast",
    )


_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_seq
"""


@q("user_sessions", _SESSIONS_SQL)
def user_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min silence splits a session) +
    per-session stats - the batch, oracle-checkable twin of
    F.session_window (SURVEY.md 2.7 ST4 extension)."""
    events = read_table(spark, sf_dir, "events").select("user_id", "ts")
    return session_stats(events, key_col="user_id", ts_col="ts", gap="30 minutes")


@q("approx_distinct_users", None)
def approx_distinct_users(spark, sf_dir):
    """approx_count_distinct (HLL++) per event_type. Rows-only check:
    DuckDB's approx_count_distinct uses a different sketch, so values
    need not match; the exact twin is distinct_customers_per_nation.

    Default rsd (0.05): rsd=0.01 forces a ~100x larger HLL++ register
    array per group and alone cost 17% of the round-1 bench; nothing
    downstream needs 1% error on a distinct-count estimate."""
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("approx_users"))
    )


_DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


@q("distinct_users", _DISTINCT_USERS_SQL)
def distinct_users(spark, sf_dir):
    """Exact distinct-user count per event_type - the oracle-checkable
    twin of approx_distinct_users (VERDICT r04 #4). Spark plans this as
    a two-stage aggregate (partial distinct per partition, then merge),
    so the shuffle carries only distinct (event_type, user_id) pairs,
    not raw events; at 100 TB cardinality of the pair set bounds the
    exchange. The HLL++ variant stays registered for the cases where
    that pair set itself is too large."""
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@q("grouping_sets_orders", _GROUPING_SETS_SQL)
def grouping_sets_orders(spark, sf_dir):
    """GROUPING SETS (the general form behind rollup/cube): per-status,
    per-priority, and grand-total aggregates in one pass over orders -
    Spark expands to a single expand+aggregate, no multi-scan union."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_FROM_JSON_SQL = """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k,
       CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS DOUBLE) > 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
FROM events
GROUP BY event_type
"""


@q("json_struct_agg", _FROM_JSON_SQL)
def json_struct_agg(spark, sf_dir):
    """P13 full form: from_json with a declared schema parses props ONCE
    into a typed struct (vs one get_json_object pass per field), then
    aggregates over the typed field."""
    events = read_table(spark, sf_dir, "events")
    parsed = events.withColumn("p", F.from_json("props", "k DOUBLE"))
    return parsed.groupBy("event_type").agg(
        F.round(F.avg(F.col("p.k")), 4).alias("avg_k"),
        F.sum(F.when(F.col("p.k") > 50, 1).otherwise(0)).alias("n_high_k"),
    )


_DISTINCT_SQL = """
SELECT n_name,
       count(DISTINCT c_custkey)       AS n_customers,
       round(avg(c_acctbal), 4)        AS avg_bal
FROM customer JOIN nation ON n_nationkey = c_nationkey
GROUP BY n_name
"""


@q("distinct_customers_per_nation", _DISTINCT_SQL)
def distinct_customers_per_nation(spark, sf_dir):
    """count(DISTINCT) + avg per nation."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


_PCT_SQL = """
SELECT l_returnflag,
       round(CAST(quantile_cont(l_extendedprice, 0.50) AS DOUBLE), 4) AS p50,
       round(CAST(quantile_cont(l_extendedprice, 0.90) AS DOUBLE), 4) AS p90,
       round(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 4) AS p99,
       round(avg(l_extendedprice), 4)                                 AS mean_price,
       round(stddev_samp(l_extendedprice), 4)                         AS sd_price,
       count(*)                                                       AS n
FROM lineitem
GROUP BY l_returnflag
"""


@q("percentile_price_stats", _PCT_SQL)
def percentile_price_stats(spark, sf_dir):
    """Exact interpolated percentiles (p50/p90/p99) + moments per return
    flag. Spark's `percentile` and DuckDB's `quantile_cont` share the
    p*(n-1) linear-interpolation definition, so the oracle matches to FP
    precision. All three percentiles are requested as ONE array-typed
    aggregate so the group's values are buffered and sorted once, not
    three times (measured ~2x at sf0.1); at 100-TB swap in
    approx_percentile (t-digest) for the same call shape with bounded
    memory."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    pcts = li.groupBy("l_returnflag").agg(
        F.percentile(price, F.array(F.lit(0.50), F.lit(0.90), F.lit(0.99))).alias(
            "_p"
        ),
        F.round(F.avg(price), 4).alias("mean_price"),
        F.round(F.stddev_samp(price), 4).alias("sd_price"),
        F.count("*").alias("n"),
    )
    return pcts.select(
        "l_returnflag",
        F.round(F.col("_p")[0], 4).alias("p50"),
        F.round(F.col("_p")[1], 4).alias("p90"),
        F.round(F.col("_p")[2], 4).alias("p99"),
        "mean_price",
        "sd_price",
        "n",
    )


_LAG_SQL = """
SELECT o_custkey, o_orderkey,
       round(o_totalprice
             - lag(o_totalprice) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
             2) AS delta_prev,
       ntile(4) OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice, o_orderkey) AS price_quartile
FROM orders
"""


@q("order_price_lag_quartile", _LAG_SQL)
def order_price_lag_quartile(spark, sf_dir):
    """lag() + ntile() ranking windows per customer. Both windows
    partition by o_custkey, so Catalyst plans ONE exchange feeding two
    WindowExec sorts; tie-breaks include o_orderkey so the frames are
    deterministic under any partitioning."""
    orders = _t(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w_time), 2
        ).alias("delta_prev"),
        F.ntile(4).over(w_price).alias("price_quartile"),
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@q("q6_forecast_revenue", _Q6_SQL)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan + conjunctive filter + scalar aggregate.
    All three predicates reach the parquet scan as PushedFilters, the
    projection prunes to 4 columns, and the whole plan is one
    WholeStageCodegen span with a map-side partial sum — the canonical
    'filter at the source' plan a 100-TB scan depends on."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1999-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


_Q12_SQL = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN l_shipdate >  o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS ontime_lines
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@q("q12_late_shipments", _Q12_SQL)
def q12_late_shipments(spark, sf_dir):
    """TPC-H Q12 shape: join + conditional aggregation (CASE inside
    sum). The per-branch counters fold into ONE aggregate pass — no
    self-join, no union of filtered branches."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_lines"),
            F.sum(F.when(~late, 1).otherwise(0)).alias("ontime_lines"),
        )
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
"""


@q("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: ratio of conditional sums over a fact/dim join.
    `part` is explicitly broadcast — the fact side never shuffles, and
    the date filter is pushed into the lineitem scan before the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0)
    return (
        li.where(
            (F.col("l_shipdate") >= "1998-01-01")
            & (F.col("l_shipdate") < "1998-04-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc_price), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN (SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_thresh
      FROM lineitem GROUP BY l_partkey) t
  ON l_partkey = pk
WHERE l_quantity < qty_thresh
"""


@q("q17_small_qty_revenue", _Q17_SQL)
def q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + self-join — the rewrite Catalyst
    itself applies to correlated subqueries. The per-part aggregate is
    small (one row per part) so AQE converts the join to broadcast at
    runtime."""
    li = _t(spark, sf_dir, "lineitem")
    thresh = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(thresh, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_ROLLING_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, round(sum(o_totalprice), 2) AS rev
  FROM orders GROUP BY 1
)
SELECT d,
       round(sum(rev) OVER (ORDER BY d
                            RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                      AND CURRENT ROW), 2) AS rev_7d,
       round(avg(rev) OVER (ORDER BY d
                            RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                      AND CURRENT ROW), 4) AS avg_7d
FROM daily
"""


@q("rolling_7d_revenue", _ROLLING_SQL)
def rolling_7d_revenue(spark, sf_dir):
    """Time-RANGE window frame: trailing 7-calendar-day revenue over the
    daily series. Distinct from the rows-based running total — the frame
    is defined by a time interval, so gaps in the calendar shrink the
    window instead of silently spanning them. Spark expresses it as
    rangeBetween on epoch seconds (-6 days, 0], inclusive both ends,
    matching DuckDB's RANGE INTERVAL frame. The daily sum is rounded
    BEFORE the window on both sides so the frame arithmetic starts from
    identical values."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("rev")
    )
    w = (
        Window.orderBy(F.col("d").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "d",
        F.round(F.sum("rev").over(w), 2).alias("rev_7d"),
        F.round(F.avg("rev").over(w), 4).alias("avg_7d"),
    )


_DENSE_RANK_SQL = """
SELECT p_brand, p_partkey, p_retailprice,
       dense_rank()   OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rk,
       round(percent_rank() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice, p_partkey), 6) AS pr
FROM part
QUALIFY rk <= 5
"""


@q("dense_rank_parts_by_price", _DENSE_RANK_SQL)
def dense_rank_parts_by_price(spark, sf_dir):
    """dense_rank + percent_rank: top-5 priciest parts per brand with
    their percentile position. Both windows share the p_brand
    partitioning, so Catalyst plans ONE exchange - but the opposite sort
    orders (DESC for rank, ASC for percentile) still need two sorted
    window passes over it. Tie-breaks include p_partkey for
    determinism."""
    part = _t(spark, sf_dir, "part")
    w_desc = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), "p_partkey"
    )
    w_asc = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.dense_rank().over(w_desc).alias("rk"),
            F.round(F.percent_rank().over(w_asc), 6).alias("pr"),
        )
        .where(F.col("rk") <= 5)
    )


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'signup' AS step, 1 AS step_idx, count(*) AS users FROM s1
  HAVING count(*) > 0
UNION ALL SELECT 'view', 2, count(*) FROM s2 HAVING count(*) > 0
UNION ALL SELECT 'click', 3, count(*) FROM s3 HAVING count(*) > 0
UNION ALL SELECT 'purchase', 4, count(*) FROM s4 HAVING count(*) > 0
"""


@q("funnel_counts", _FUNNEL_SQL)
def funnel_counts_q(spark, sf_dir):
    """signup -> view -> click -> purchase funnel over events: users
    reaching each step under greedy first-match ordering. The engine
    computes it with ONE shuffle (per-user sorted fold,
    operators/relational.funnel_counts); the oracle takes the k-way
    sequential min-after-join route - structurally different plans
    agreeing on values."""
    from ..operators.relational import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"),
        ("signup", "view", "click", "purchase"),
    )


_RETENTION_SQL = """
WITH active AS (
  SELECT DISTINCT user_id AS u,
         CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
),
cohorts AS (SELECT u, min(wk) AS cohort_week FROM active GROUP BY u)
SELECT c.cohort_week,
       CAST((a.wk - c.cohort_week) / 7 AS BIGINT) AS week_offset,
       count(*) AS users
FROM active a JOIN cohorts c USING (u)
GROUP BY c.cohort_week, week_offset
"""


@q("cohort_retention", _RETENTION_SQL)
def cohort_retention_q(spark, sf_dir):
    """Weekly cohort retention triangle over events (cohort = ISO week
    of first activity; cells = cohort users active at each later week).
    One fact-scale shuffle to distinct (user, week); everything after
    is user-dimension sized (operators/relational.cohort_retention)."""
    from ..operators.relational import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


_TRANSITIONS_SQL = """
SELECT from_type, to_type, count(*) AS n FROM (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
) WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


@q("event_transitions", _TRANSITIONS_SQL)
def event_transitions_q(spark, sf_dir):
    """First-order event-type transition matrix over per-user ordered
    event streams (operators/relational.event_transitions): one shuffle
    for the lead() window, then a 25-key count."""
    from ..operators.relational import event_transitions

    return event_transitions(_t(spark, sf_dir, "events"))


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


@q("q4_order_priority", _Q4_SQL)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (adapted to this schema: 'late' = shipped >60
    days after order date): EXISTS decorrelates to a left-semi join on
    orderkey - only keys shuffle, the lineitem payload never moves."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"])
        & (l["l_shipdate"] > F.date_add(o["o_orderdate"], 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01'
    AND l_shipdate < DATE '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@q("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: top supplier by quarterly revenue. The max-revenue
    scalar derives from the SAME aggregate (exchange reuse) and joins
    back as a broadcast single-row frame - no second lineitem scan."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1995-04-01")
    )
    revenue = l.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("_max"))
    s = _t(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("_max"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q18_SQL = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       CAST(big.sum_qty AS BIGINT) AS sum_qty
FROM orders o
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
) big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@q("q18_large_orders", _Q18_SQL)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders - nested aggregate (per-
    order quantity, having) joined back to orders + customer. The
    having-filtered aggregate is orderkey-partitioned like the join
    that consumes it, so AQE plans the join-back without a second
    fact exchange; customer broadcasts."""
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 180)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("sum_qty"),
        )
    )


_Q22_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                     WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= DATE '2001-01-01'
  )
GROUP BY c_mktsegment
"""


@q("q22_idle_customers", _Q22_SQL)
def q22_idle_customers(spark, sf_dir):
    """TPC-H Q22 shape: well-funded customers gone RECENTLY idle (no
    order in the final data year; every customer has some order, so
    the classic never-ordered form is vacuous here) - scalar-subquery
    threshold (broadcast single row) + anti-join on custkey against
    the date-pruned recent slice (only keys shuffle), then a segment
    rollup."""
    c = _t(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2001-01-01"
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# --- round-5 optimizer-shape extensions (TPC-H q7/q10/q13/q16/q19/q21
# shapes adapted to this testdata's columns; the SHAPE under test -
# join topology, outer/semi/anti structure, disjunctive pushdown - is
# the point, not the literal TPC-H text) ---

_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


@q("q7_volume_shipping", _Q7_SQL)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the fact joins two COPIES of the nation dim
    (supplier side and customer side) under a symmetric nation-pair
    disjunction, aggregated by year. Both nation copies and both
    mid-size dims broadcast; one fact-side shuffle for the final
    aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


_Q10_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@q("q10_returned_items", _Q10_SQL)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer over a date
    window, top-20. The returnflag and date predicates push into the
    scans; dims broadcast; the final top-k is a TakeOrdered, not a full
    sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@q("q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: LEFT OUTER join with an extra join-condition
    filter (non-urgent orders only), then a two-level aggregate -
    orders per customer, customers per order-count. Zero-order
    customers survive the outer join as c_count = 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q16_SQL = """
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND NOT EXISTS (
    SELECT 1 FROM supplier s
    WHERE s.s_acctbal < 0 AND s.s_suppkey = l.l_suppkey
  )
GROUP BY 1, 2, 3
"""


@q("q16_parts_supplier_counts", _Q16_SQL)
def q16_parts_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part group with a
    brand exclusion, an IN-list size filter, and a NOT EXISTS
    anti-join against a supplier blacklist (phrased NOT EXISTS rather
    than NOT IN on BOTH sides: anti-join == NOT EXISTS exactly, while
    NOT IN is null-hostile and would diverge if a key were ever
    NULL). The
    blacklist is dim-sized, so the anti-join broadcasts; the distinct
    aggregate shuffles once on the group key."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        l.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q19_SQL = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@q("q19_disjunctive_revenue", _Q19_SQL)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd conjunct groups spanning BOTH join
    sides. Catalyst extracts the common single-side conjuncts
    (brand IN ..., quantity <= 30) as pushable pre-join filters while
    the full disjunction evaluates post-join - the classic disjunctive
    pushdown test."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
    g1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    g2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    g3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return j.where(g1 | g2 | g3).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


_Q21_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
"""


@q("q21_waiting_supplier", _Q21_SQL)
def q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS chain on self-joined
    lineitem - the hardest classic optimizer shape (semi-join then
    anti-join against two differently-filtered copies of the fact).
    'Late' adapts to this schema as shipping >60 days after the order
    date. Both probe sides reduce to (orderkey, suppkey)-level frames
    before the semi/anti joins."""
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    late = l.join(o, l["l_orderkey"] == o["o_orderkey"]).where(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    l1 = late.select("l_orderkey", "l_suppkey")
    # another supplier contributed to the same order (semi)
    others = l.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    has_other = l1.join(
        others,
        (l1["l_orderkey"] == others["o_key"])
        & (l1["l_suppkey"] != others["o_supp"]),
        "left_semi",
    )
    # ...but no OTHER supplier was also late on that order (anti)
    late_others = late.select(
        F.col("l_orderkey").alias("a_key"), F.col("l_suppkey").alias("a_supp")
    )
    sole_late = has_other.join(
        late_others,
        (has_other["l_orderkey"] == late_others["a_key"])
        & (has_other["l_suppkey"] != late_others["a_supp"]),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


_Q8_SQL = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1
"""


@q("q8_market_share", _Q8_SQL)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: a conditional-sum / total-sum ratio per year
    (one nation's share of all shipped revenue) - both numerator and
    denominator come out of ONE aggregate pass via a CASE inside the
    sum, never two scans."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_3", rev).otherwise(0)
                )
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


_Q11_SQL = """
WITH grp AS (
  SELECT s.s_nationkey, l.l_partkey,
         sum(l.l_quantity) AS qty
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT s_nationkey, l_partkey, round(qty, 2) AS qty
FROM grp
WHERE qty > (SELECT sum(qty) * 0.0001 FROM grp)
"""


@q("q11_important_stock", _Q11_SQL)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: group aggregates filtered against a SCALAR
    derived from the SAME aggregate (a fraction of the global total).
    The grouped frame is checkpointed and consumed twice - once for
    the global scalar (1-row broadcast), once for the filter - so the
    fact join/aggregate runs exactly once."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    grp = (
        l.join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .localCheckpoint(eager=False)
    )
    threshold = grp.agg((F.sum("qty") * 0.0001).alias("_thr"))
    return (
        grp.crossJoin(F.broadcast(threshold))
        .where(F.col("qty") > F.col("_thr"))
        .select("s_nationkey", "l_partkey", F.round("qty", 2).alias("qty"))
    )


_Q20_SQL = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
  )
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 100
)
"""


@q("q20_heavy_shippers", _Q20_SQL)
def q20_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 shape: a nested semi-join chain with a correlated
    aggregate in the middle - suppliers who shipped >100 units of any
    matching-name part. Inner semi (parts by name) broadcasts; the
    per-(supplier, part) aggregate reduces the fact before the outer
    semi against the supplier dim."""
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    l = _t(spark, sf_dir, "lineitem")
    heavy = (
        l.join(
            F.broadcast(p.select("p_partkey")),
            l["l_partkey"] == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return s.join(heavy, "s_suppkey", "left_semi").select(
        "s_suppkey", "s_name"
    )


_UNPIVOT_SQL = """
SELECT s_suppkey, metric, round(val, 2) AS val
FROM (
  SELECT s_suppkey,
         unnest(['acctbal', 'nationkey']) AS metric,
         unnest([s_acctbal, CAST(s_nationkey AS DOUBLE)]) AS val
  FROM supplier
)
"""


@q("unpivot_supplier_metrics", _UNPIVOT_SQL)
def unpivot_supplier_metrics(spark, sf_dir):
    """UNPIVOT (melt): wide supplier columns to (key, metric, value)
    rows - the inverse of the pivot query, via Spark's native unpivot
    (STACK in codegen; zero shuffle, rows = cols x input rows)."""
    return (
        _t(spark, sf_dir, "supplier")
        .select(
            "s_suppkey",
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_nationkey").cast("double").alias("nationkey"),
        )
        .unpivot("s_suppkey", ["acctbal", "nationkey"], "metric", "_v")
        .select("s_suppkey", "metric", F.round("_v", 2).alias("val"))
    )


_HEAVY_SQL = """
WITH counts AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
tot AS (SELECT sum(n) AS total, count(*) AS n_keys FROM counts)
SELECT c.user_id, c.n,
       round(c.n / t.total, 6) AS share,
       round(c.n * t.n_keys / t.total, 4) AS skew_x
FROM counts c CROSS JOIN tot t
ORDER BY c.n DESC, c.user_id
LIMIT 15
"""


@q("heavy_hitter_users", _HEAVY_SQL)
def heavy_hitter_users(spark, sf_dir):
    """Skew diagnosis: the top-15 hottest keys with their share of all
    rows and their multiple of the mean key load (skew_x) - the first
    report to run before choosing salting / AQE skew-join handling for
    a key. One aggregate + a 1-row broadcast scalar + top-k."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            F.round(F.col("n") / F.col("_total"), 6).alias("share"),
            F.round(F.col("n") * F.col("_keys") / F.col("_total"), 4).alias(
                "skew_x"
            ),
        )
        .orderBy(F.desc("n"), "user_id")
        .limit(15)
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey AND p_name LIKE '%red%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN orders ON o_orderkey = l_orderkey
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
"""


@q("q9_product_profit_shape", _Q9_SQL)
def q9_product_profit_shape(spark, sf_dir):
    """TPC-H Q9's plan shape adapted to this schema (no partsupp table
    ships, so the supplycost term is dropped; the optimizer-relevant
    structure — a LIKE-filtered part dim pruning the fact, four
    broadcast dims, nation×year rollup — is intact). The substring
    filter lands on the part scan (pushed), shrinking the only
    fact-side join input."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue")
        )
    )


_WINSOR_SQL = """
WITH bounds AS (
  SELECT l_returnflag,
         CAST(quantile_cont(l_extendedprice, 0.05) AS DOUBLE) AS lo,
         CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       round(avg(least(greatest(l_extendedprice, lo), hi)), 4)
         AS winsorized_mean,
       round(avg(l_extendedprice), 4) AS raw_mean,
       CAST(count(CASE WHEN l_extendedprice < lo
                         OR l_extendedprice > hi THEN 1 END) AS BIGINT)
         AS n_clamped
FROM lineitem l JOIN bounds b USING (l_returnflag)
GROUP BY l.l_returnflag
"""


@q("winsorized_price_stats", _WINSOR_SQL)
def winsorized_price_stats(spark, sf_dir):
    """Robust (winsorized) mean per return flag: clamp to the group's
    [p05, p95] then average — the outlier-resistant twin of
    percentile_price_stats' raw moments. Two aggregates over the fact:
    the bounds frame is one row per group and broadcasts back; both
    percentile definitions interpolate identically (p*(n-1)), so values
    match the oracle to FP precision."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    price = F.col("l_extendedprice")
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile(price, F.array(F.lit(0.05), F.lit(0.95))).alias("_b")
    ).select(
        "l_returnflag",
        F.col("_b")[0].alias("_lo"),
        F.col("_b")[1].alias("_hi"),
    )
    clamped = F.least(F.greatest(price, F.col("_lo")), F.col("_hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg(clamped), 4).alias("winsorized_mean"),
            F.round(F.avg(price), 4).alias("raw_mean"),
            F.count(
                F.when(
                    (price < F.col("_lo")) | (price > F.col("_hi")),
                    F.lit(1),
                )
            ).alias("n_clamped"),
        )
    )


_Q2_SQL = """
WITH min_bal AS (
  SELECT n_regionkey, min(s_acctbal) AS mb
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
  GROUP BY n_regionkey
)
SELECT r_name AS region, s_name, n_name AS nation,
       round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
JOIN min_bal ON min_bal.n_regionkey = r_regionkey
WHERE s_acctbal = mb
"""


@q("q2_min_supplier_shape", _Q2_SQL)
def q2_min_supplier_shape(spark, sf_dir):
    """TPC-H Q2's optimizer shape adapted to this schema (no partsupp,
    so the correlated scalar subquery runs over supplier balances per
    region): the classic aggregate-then-join-back decorrelation - the
    per-region minimum derives from the SAME supplier x nation frame
    the outer query reads, and equality against it selects the winning
    rows. Completes the TPC-H shape sweep (q1-q22, with q2/q9 adapted
    for the missing partsupp table)."""
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sn = sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
    min_bal = sn.groupBy("n_regionkey").agg(F.min("s_acctbal").alias("mb"))
    return (
        sn.join(F.broadcast(reg), F.col("n_regionkey") == reg["r_regionkey"])
        .join(F.broadcast(min_bal), "n_regionkey")
        .where(F.col("s_acctbal") == F.col("mb"))
        .select(
            F.col("r_name").alias("region"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


_ASOF_FWD_SQL = """
WITH cfg AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS start_k
  FROM events
),
named AS (
  SELECT start_k,
         strftime(start_k, '%Y%m%d') AS week_tag
  FROM cfg
),
nxt AS (
  SELECT e.event_id, min(n.start_k) AS start_k
  FROM events e LEFT JOIN named n ON n.start_k >= e.ts
  GROUP BY e.event_id
)
SELECT nxt.event_id, nxt.start_k, named.week_tag
FROM nxt LEFT JOIN named ON named.start_k = nxt.start_k
"""


@q("asof_next_config", _ASOF_FWD_SQL)
def asof_next_config(spark, sf_dir):
    """FORWARD as-of join: each event picks the EARLIEST config version
    with start_k >= ts (the next-scheduled-event lookup, mirror image
    of asof_join_config). Same lag-derived validity intervals + at most
    one match per fact; events after the last version match nothing
    (left join keeps them with nulls). The oracle computes the same
    winner with a correlated min over an inequality join."""
    events = read_table(spark, sf_dir, "events").select("event_id", "ts")
    cfg = (
        events.select(F.date_trunc("week", F.col("ts")).alias("start_k"))
        .distinct()
        .select(
            "start_k",
            F.date_format("start_k", "yyyyMMdd").alias("week_tag"),
        )
    )
    return asof_join(
        events, cfg, fact_ts="ts", dim_ts="start_k",
        keep=("week_tag",), plan="broadcast", direction="forward",
    ).select("event_id", "start_k", "week_tag")


_CONVERSIONS_SQL = """
SELECT c.user_id, c.event_id AS first_id, p.event_id AS then_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTES
"""


@q("conversion_pairs", _CONVERSIONS_SQL)
def conversion_pairs(spark, sf_dir):
    """Attribution pairs: each click joined to the same user's
    purchases within 10 minutes - the batch twin of the stream-stream
    conversion_join_stream (whose drained result is pinned row-equal
    in tests/test_streaming.py). Equi-join on user with the interval
    residual; exact integer-µs lag."""
    events = read_table(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("first_id"),
        F.col("ts").alias("first_ts"),
    )
    buys = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("then_id"),
        F.col("ts").alias("then_ts"),
    )
    return clicks.join(
        buys,
        (F.col("u") == F.col("u2"))
        & (F.col("then_ts") > F.col("first_ts"))
        & (
            F.col("then_ts")
            <= F.col("first_ts") + F.expr("INTERVAL 10 minutes")
        ),
    ).select(
        F.col("u").alias("user_id"),
        "first_id",
        "then_id",
        (
            F.unix_micros("then_ts") - F.unix_micros("first_ts")
        ).alias("lag_us"),
    )


_COOCCUR_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, count(*) AS support
FROM pairs GROUP BY part_a, part_b
HAVING count(*) >= 3
"""


def _order_items(spark, sf_dir):
    """Deduped (order, part) basket items - the shared base of the
    market-basket family.

    repartition(l_orderkey) BEFORE the dedup (r14, guide §2.4):
    HashPartitioning(l_orderkey) satisfies the (orderkey, partkey)
    clustering the dedup aggregate needs, and it is ALSO the pair
    self-join's key - so both join sides carry byte-identical subplans
    (one ReusedExchange instead of two lineitem dedup shuffles) and the
    join itself needs no further exchange at any scale. A plain
    .distinct() partitioned on (orderkey, partkey), which the join
    cannot reuse."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(F.col("l_orderkey"))
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )


def _pair_support(items, min_support: int = 3):
    """Order-keyed pair enumeration + support threshold (shared by
    frequent_part_pairs and part_association_rules so the contract
    cannot silently diverge): pair mass per basket is bounded by
    basket size squared, linear in orders at fixed basket size -
    never a part-level cross join."""
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )


@q("frequent_part_pairs", _COOCCUR_SQL)
def frequent_part_pairs(spark, sf_dir):
    """Market-basket pairwise co-occurrence: parts ordered together in
    at least 3 orders (the support-counting inner step of frequent-
    itemset mining); see _pair_support for the scale argument. Items
    deduped per order first so multi-line repeats of one part don't
    inflate support. The deduped items frame is lazily checkpointed so
    the self-join's two sides read ONE materialization instead of
    scanning + dedup-shuffling lineitem twice (r14; the
    part_association_rules discipline applied here too)."""
    return _pair_support(
        _order_items(spark, sf_dir).localCheckpoint(eager=False)
    )


_CORR_SQL = """
WITH hourly AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
         date_trunc('hour', ts) AS h,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS buys
  FROM events GROUP BY 1, 2
)
SELECT d AS bar_date, round(corr(clicks, buys), 4) AS click_buy_corr,
       CAST(count(*) AS BIGINT) AS n_hours
FROM hourly GROUP BY d
"""


@q("daily_click_buy_corr", _CORR_SQL)
def daily_click_buy_corr(spark, sf_dir):
    """Daily Pearson correlation between hourly click and purchase
    counts — the cross-metric co-movement statistic an anomaly monitor
    watches. Two nested aggregates share one time-key shuffle chain
    (hour rollup -> day corr); F.corr and DuckDB's corr are both
    sample correlation, matching under the driver's isclose at 4dp."""
    events = read_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("day", "ts").alias("bar_date"),
        F.date_trunc("hour", "ts").alias("h"),
    ).agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("buys"),
    )
    return hourly.groupBy("bar_date").agg(
        F.round(F.corr("clicks", "buys"), 4).alias("click_buy_corr"),
        F.count(F.lit(1)).alias("n_hours"),
    )


_RULES_SQL = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n FROM items),
item_supp AS (
  SELECT l_partkey, count(*) AS s FROM items GROUP BY l_partkey
),
pair_supp AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS s
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT p.part_a, p.part_b, p.s AS support,
       round(p.s / CAST(sa.s AS DOUBLE), 6) AS confidence,
       round(p.s * n.n / CAST(sa.s AS DOUBLE) / sb.s, 6) AS lift
FROM pair_supp p
JOIN item_supp sa ON sa.l_partkey = p.part_a
JOIN item_supp sb ON sb.l_partkey = p.part_b
CROSS JOIN n_orders n
"""


@q("part_association_rules", _RULES_SQL)
def part_association_rules(spark, sf_dir):
    """Association rules A -> B over the frequent part pairs:
    confidence = P(B | A-basket), lift = confidence / P(B). Item
    supports and the order count derive from the SAME deduped items
    frame the pair join reads (one persisted lineage); supports and
    the 1-row order count attach as broadcasts, so only the pair join
    itself touches fact-scale data."""
    items = _order_items(spark, sf_dir).localCheckpoint(eager=False)
    # order count stays LAZY: a 1-row aggregate cross-joined as a
    # broadcast (the asof_join_bucketed pattern) - an eager .count()
    # here would run a fact-scale job every time the registry function
    # is merely constructed (plan snapshots, explain-only tests).
    n_orders = items.agg(
        F.count_distinct("l_orderkey").alias("_n_orders")
    )
    item_supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("s")
    )
    pair_supp = _pair_support(items)
    sa = item_supp.select(
        F.col("l_partkey").alias("part_a"), F.col("s").alias("_sa")
    )
    sb = item_supp.select(
        F.col("l_partkey").alias("part_b"), F.col("s").alias("_sb")
    )
    return (
        pair_supp.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(F.col("support") / F.col("_sa"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("support")
                * F.col("_n_orders")
                / F.col("_sa")
                / F.col("_sb"),
                6,
            ).alias("lift"),
        )
    )


def _zorder_sql(bits: int = 16, rows_per_file: int = 500) -> str:
    """Oracle for zorder_layout: the identical Morton interleave as
    plain SQL bit arithmetic (dimension d's bit i lands at position
    i * 2 + d; d=0 is the day rank, d=1 the customer key)."""
    terms = []
    for i in range(bits):
        terms.append(f"((( dk >> {i}) & 1) << {i * 2})")
        terms.append(f"((( ck >> {i}) & 1) << {i * 2 + 1})")
    z = " | ".join(terms)
    top = (1 << bits) - 1
    scale = float(1 << bits)
    return f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         date_diff('day', DATE '1970-01-01', o_orderdate) AS d_day
  FROM orders
),
bounds AS (
  SELECT min(d_day) AS lo_d, max(d_day) AS hi_d,
         min(o_custkey) AS lo_c, max(o_custkey) AS hi_c
  FROM base
),
cells AS (
  SELECT o_orderkey, o_custkey, d_day,
         CASE WHEN hi_d > lo_d THEN least({top},
              CAST(floor((d_day - lo_d) * {scale} / (hi_d - lo_d)) AS BIGINT))
              ELSE 0 END AS dk,
         CASE WHEN hi_c > lo_c THEN least({top},
              CAST(floor((o_custkey - lo_c) * {scale} / (hi_c - lo_c)) AS BIGINT))
              ELSE 0 END AS ck
  FROM base CROSS JOIN bounds
),
ranked AS (
  SELECT o_orderkey, o_custkey, d_day,
         row_number() OVER (ORDER BY ({z}), d_day, o_custkey,
                            o_orderkey) AS rn
  FROM cells
)
SELECT CAST(floor((rn - 1) / {rows_per_file}) AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(d_day) AS min_d_day, max(d_day) AS max_d_day,
       min(o_custkey) AS min_o_custkey, max(o_custkey) AS max_o_custkey
FROM ranked GROUP BY 1
"""


@q("zorder_layout", _zorder_sql())
def zorder_layout_q(spark, sf_dir):
    """Z-order (Morton) layout simulation over orders on
    (order day, customer key): min-max scale both dimensions to 16
    bits (one 1-row aggregate broadcast), interleave JVM-side (pure
    shift/or chain in whole-stage codegen), rank, cut into
    500-row files, and emit each file's min/max envelope per
    dimension - the footer stats a 2-D predicate would prune on.
    Delta OPTIMIZE ZORDER / Iceberg sort-order rewrite, as plain
    column arithmetic; the pruning win over a date-only sort is
    pinned in tests/test_layout.py."""
    from ..operators.layout import zorder_file_stats

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d_day"),
    )
    return zorder_file_stats(
        orders,
        ["d_day", "o_custkey"],
        bits=16,
        rows_per_file=500,
        tiebreak_cols=["o_orderkey"],
    )


_QSKETCH_SQL = """
WITH h AS (
  SELECT l_returnflag, l_extendedprice AS v,
         CAST('0x' || substr(md5(
             'QS:' || l_orderkey || ':' || l_linenumber), 1, 15)
           AS BIGINT) AS h
  FROM lineitem
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY h, v) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n_all
  FROM h
),
s AS (
  SELECT *,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY v, h) AS vr,
         count(*) OVER (PARTITION BY l_returnflag) AS n_kept
  FROM r WHERE rn <= 4096
)
SELECT l_returnflag,
       round(max(CASE WHEN vr = greatest(1,
             CAST(ceil(0.50 * n_kept) AS BIGINT)) THEN v END), 4)
         AS p50_sketch,
       round(max(CASE WHEN vr = greatest(1,
             CAST(ceil(0.90 * n_kept) AS BIGINT)) THEN v END), 4)
         AS p90_sketch,
       round(max(CASE WHEN vr = greatest(1,
             CAST(ceil(0.99 * n_kept) AS BIGINT)) THEN v END), 4)
         AS p99_sketch,
       CAST(max(n_all) AS BIGINT) AS n_rows,
       CAST(max(n_kept) AS BIGINT) AS n_retained,
       CAST(sum(h & 1073741823) AS BIGINT) AS retained_h_lo,
       CAST(sum(h >> 30) AS BIGINT) AS retained_h_hi
FROM s GROUP BY l_returnflag
"""


@q("price_quantile_sketch", _QSKETCH_SQL)
def price_quantile_sketch_q(spark, sf_dir):
    """The bounded-memory twin of percentile_price_stats, VALUE-
    CHECKABLE (r11 verdict #2: rows-only -> oracle-paired). The
    opaque Greenwald-Khanna approx_percentile is replaced by the
    engine-native bottom-k hash sketch: per return flag, retain the
    4096 rows with smallest h60 over the (orderkey, linenumber)
    identity - a deterministic uniform sample whose compaction
    ("keep the k smallest hashes") is arrival-order-free, so the
    oracle re-derives the EXACT retained set (row_number over the
    same md5-prefix hash) and the quantiles read off it, plus a
    two-half BIGINT hash-sum checksum over the whole retained set
    (low/high 30 bits summed separately - each half < 2^42, so no
    driver-side float coercion can corrupt it; the r12 lesson).
    Merging shard sketches = union + keep k smallest + sum counts -
    still the associative one-shuffle shape GK had, with the rank
    error trade (n*sqrt(q(1-q)/k) vs n/accuracy) pinned against the
    exact percentiles in tests/test_mining.py, and the prefilter
    scale path (hash threshold sized off the exact group counts, so
    only ~4*k rows per group reach the window sort) pinned equal to
    the unfiltered bottom-k there too
    (operators/sketches.bottomk_quantile_sketch)."""
    from ..operators.sketches import bottomk_quantile_sketch

    li = read_table(spark, sf_dir, "lineitem")
    out = bottomk_quantile_sketch(
        li,
        value_col="l_extendedprice",
        group_col="l_returnflag",
        id_cols=["l_orderkey", "l_linenumber"],
        k=4096,
        quantiles=(0.50, 0.90, 0.99),
    )
    return out.select(
        "l_returnflag",
        F.round("p50_sketch", 4).alias("p50_sketch"),
        F.round("p90_sketch", 4).alias("p90_sketch"),
        F.round("p99_sketch", 4).alias("p99_sketch"),
        "n_rows",
        "n_retained",
        "retained_h_lo",
        "retained_h_hi",
    )


_SALTED_SQL = """
WITH heavy AS (
  SELECT user_id, rnk FROM (
    SELECT user_id,
           row_number() OVER (ORDER BY count(*) DESC, user_id) AS rnk
    FROM events GROUP BY user_id
  ) WHERE rnk <= 20
)
SELECT e.user_id, h.rnk,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(e.value), 4) AS total_value
FROM events e JOIN heavy h ON e.user_id = h.user_id
GROUP BY e.user_id, h.rnk
"""


@q("skew_salted_heavy_users", _SALTED_SQL)
def skew_salted_heavy_users_q(spark, sf_dir):
    """The skew recipe under a value-level check: the 20 heaviest users
    (by definition the hot keys) join back to the full event stream
    through salted_join - each hot key spread over 8 synthetic
    sub-keys, the 20-row dim replicated per salt - then a two-stage
    aggregate (partial on (user, salt) implicitly via the salted
    shuffle, merge on user). The oracle is the PLAIN join + GROUP BY:
    row-identical output is the operator's whole contract, and here
    the driver checks it value-level on every rotation, not just in
    tests/test_skew.py."""
    from ..operators.relational import salted_join

    events = read_table(spark, sf_dir, "events")
    w = Window.orderBy(F.desc("_cnt"), F.col("user_id"))
    heavy = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("_cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("user_id", "rnk")
    )
    joined = salted_join(
        events, heavy, "user_id", salt_src="event_id", n_salts=8
    )
    return joined.groupBy("user_id", "rnk").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


_FUNNEL_TIMES_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
  WHERE e.event_type = 'view' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s4 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e
  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT user_id, 1 AS step_idx, 'signup' AS step, t AS ts FROM s1
UNION ALL SELECT user_id, 2, 'view', t FROM s2
UNION ALL SELECT user_id, 3, 'click', t FROM s3
UNION ALL SELECT user_id, 4, 'purchase', t FROM s4
"""


@q("funnel_step_times", _FUNNEL_TIMES_SQL)
def funnel_step_times_q(spark, sf_dir):
    """Per-user step-advance TIMESTAMPS for the 4-step funnel - the
    row-level detail behind funnel_counts (same greedy first-match
    cursor, pinned stream==batch by tests/test_stateful.py): one row
    per (user, step actually reached) with the advancing event's time.
    Engine: the single-shuffle sorted fold; oracle: the k-way
    min-after-join chain - structurally different plans agreeing on
    every timestamp."""
    from ..operators.relational import funnel_step_times

    events = read_table(spark, sf_dir, "events")
    return funnel_step_times(
        events, ("signup", "view", "click", "purchase")
    ).select("user_id", "step_idx", "step", "ts")


_K_ANON_SQL = """
SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
       CAST(count(*) AS BIGINT) AS group_size,
       CAST(count(*) < 5 AS INT) AS at_risk
FROM customer
GROUP BY 1, 2, 3
"""


@q("k_anonymity_audit", _K_ANON_SQL)
def k_anonymity_audit_q(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002), the release gate next to
    pii_redact and the RTBF sink: group the table by its
    quasi-identifier combination (nation x market segment x coarse
    account-balance bucket - the columns an attacker can link from
    public data even after names are dropped) and flag every
    equivalence class smaller than k=5, whose members a linkage attack
    re-identifies. One map-side-combined aggregate keyed by the QI
    tuple; output is QI-cardinality-sized, the table never shuffles
    raw rows."""
    cust = read_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") / 1000.0)
        .cast("long")
        .alias("bal_bucket"),
    ).agg(
        F.count("*").cast("long").alias("group_size"),
        (F.count("*") < 5).cast("int").alias("at_risk"),
    )


_KMV_SQL = """
WITH h AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS hv
  FROM events
),
bk AS (SELECT hv FROM h ORDER BY hv LIMIT 64),
sk AS (
  SELECT CAST(count(*) AS BIGINT) AS n_kept, max(hv) AS kth
  FROM bk
),
ex AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
SELECT 64 AS k, sk.n_kept,
       CAST(CASE WHEN sk.n_kept < 64 THEN sk.n_kept
            ELSE round(63.0 / (CAST(sk.kth AS DOUBLE)
                               / 1152921504606846976.0))
            END AS BIGINT) AS est_distinct,
       ex.n_exact,
       round(abs(CASE WHEN sk.n_kept < 64 THEN sk.n_kept
                 ELSE round(63.0 / (CAST(sk.kth AS DOUBLE)
                                    / 1152921504606846976.0))
                 END - ex.n_exact) / ex.n_exact, 4) AS rel_err
FROM sk CROSS JOIN ex
"""


@q("kmv_distinct_users", _KMV_SQL)
def kmv_distinct_users_q(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch, the third
    cardinality tier next to the exact count and the opaque HLL++:
    keep the k=64 smallest h60(user_id) values; the kth smallest,
    normalized to (0,1), estimates density and (k-1)/h_k the
    cardinality (Bar-Yossef et al. 2002). Unlike approx_count_distinct
    the sketch is VALUE-CHECKABLE across engines (the h60 family
    again) and mergeable by construction - union of bottom-k's ->
    bottom-k. Plan: distinct hash -> TakeOrdered(64) -> 1-row
    aggregate, with the exact count riding the bm25-style one-row
    broadcast cross join purely to report the realized error."""
    from ..operators.dedup import h60

    events = read_table(spark, sf_dir, "events")
    k = 64
    hv = events.select(
        h60(F.col("user_id").cast("string")).alias("hv")
    ).distinct()
    sk = (
        hv.orderBy("hv")
        .limit(k)
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("hv").alias("kth"),
        )
    )
    ex = events.agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.round(
            F.lit(float(k - 1))
            / (F.col("kth").cast("double") / F.lit(float(1 << 60)))
        )
    )
    return sk.crossJoin(F.broadcast(ex)).select(
        F.lit(k).alias("k"),
        "n_kept",
        est.cast("long").alias("est_distinct"),
        "n_exact",
        F.round(
            F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4
        ).alias("rel_err"),
    )
