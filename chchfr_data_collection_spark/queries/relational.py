"""Relational operator surface: scans, joins (all types), aggregations
(group/distinct/rollup/cube/grouping-sets/pivot), windows, sorts/limits,
set ops, scalar functions, subquery patterns.

The reference only ever exercises a tiny slice of this (SURVEY.md §2.5-§2.7:
an anti-join, a cross join, COUNT(*) probes); the rest is the target
engine surface required by the fixtures. Every query here is Catalyst
built-ins only — no UDFs — so predicate pushdown, column pruning and
join-strategy selection are free.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from .common import T, davg, dec, dsum

_DISC = 'CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))'


def _disc_price():
    return dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")


# ---------------------------------------------------------------- TPC-H-ish

@register(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM({_DISC}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM({_DISC} * CAST(1 + l_tax AS DECIMAL(12,2))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def q1_pricing_summary(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = _disc_price()
    charge = disc * (F.lit(1) + F.col("l_tax")).cast("decimal(12,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(disc).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    sql=f"""
    SELECT l_orderkey,
      CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
      CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q3_shipping_priority(spark, sf_dir):
    cust = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    sql=f"""
    SELECT n_name, CAST(SUM({_DISC}) AS DOUBLE) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    tags=("join", "agg", "tpch"),
)
def q5_region_revenue(spark, sf_dir):
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # dimension chain is tiny -> broadcast it into the fact-side joins
    dims = (
        T(spark, sf_dir, "nation")
        .join(
            T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = T(spark, sf_dir, "supplier").join(
        F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        T(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(T(spark, sf_dir, "lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    sql="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25
    """,
    tags=("agg", "filter", "tpch"),
)
def q6_forecast_revenue(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.04)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q10_returned_items",
    sql=f"""
    SELECT c_custkey, c_name, CAST(SUM({_DISC}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("join", "agg", "topk", "tpch"),
)
def q10_returned_items(spark, sf_dir):
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        T(spark, sf_dir, "customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------- joins

@register(
    "join_inner_orders_per_nation",
    sql="""
    SELECT c_nationkey AS nationkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    tags=("join", "agg"),
)
def join_inner_orders_per_nation(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .join(T(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


@register(
    "join_left_outer_counts",
    sql="""
    SELECT c_custkey, COUNT(o_orderkey) AS big_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS big_total
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) big
      ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join",),
)
def join_left_outer_counts(spark, sf_dir):
    big = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        T(spark, sf_dir, "customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("big_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("big_total"),
        )
    )


@register(
    "join_semi_urgent_customers",
    sql="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '1-URGENT')
    """,
    tags=("join", "semi"),
)
def join_semi_urgent_customers(spark, sf_dir):
    urgent = T(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        T(spark, sf_dir, "customer")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_acctbal")
    )


@register(
    "join_anti_no_big_orders",
    sql="""
    SELECT c_custkey, c_nationkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 400000)
    """,
    tags=("join", "anti"),
)
def join_anti_no_big_orders(spark, sf_dir):
    big = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        T(spark, sf_dir, "customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
    )


@register(
    "join_cross_region_priority",
    sql="""
    SELECT r_name, o_orderpriority
    FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    """,
    tags=("join", "cross"),
)
def join_cross_region_priority(spark, sf_dir):
    prios = T(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return T(spark, sf_dir, "region").select("r_name").crossJoin(F.broadcast(prios))


@register(
    "join_full_outer_nation_counts",
    sql="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer
          WHERE c_nationkey < 20 GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier
          WHERE s_nationkey > 5 GROUP BY 1) s
      ON c.nk = s.nk
    """,
    tags=("join", "outer"),
)
def join_full_outer_nation_counts(spark, sf_dir):
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") > 5)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full_outer").select(
        F.coalesce("c_nk", "s_nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_right_suppliers_per_nation",
    sql="""
    SELECT n_name, COUNT(s_suppkey) AS n_supp
    FROM (SELECT * FROM supplier WHERE s_acctbal > 5000) s
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "outer"),
)
def join_right_suppliers_per_nation(spark, sf_dir):
    rich = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 5000)
    return (
        rich.join(
            T(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "right",
        )
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


# ---------------------------------------------------------------- aggregates

@register(
    "agg_distinct_per_priority",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "distinct"),
)
def agg_distinct_per_priority(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            dsum("o_totalprice").alias("total"),
        )
    )


@register(
    "agg_rollup_status_priority",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup_status_priority(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@register(
    "agg_cube_flags",
    sql="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube_flags(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "agg_grouping_sets",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark, sf_dir):
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_pivot_qty_by_status",
    sql="""
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS O_qty,
      CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS F_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot_qty_by_status(spark, sf_dir):
    out = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    return out.select(
        "l_returnflag", F.col("O").alias("O_qty"), F.col("F").alias("F_qty")
    )


@register(
    "agg_unpivot_metrics",
    sql="""
    WITH base AS (
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM base
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM base
    """,
    tags=("agg", "unpivot"),
)
def agg_unpivot_metrics(spark, sf_dir):
    base = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
        )
    )
    return base.selectExpr(
        "l_returnflag",
        "stack(2, 'sum_qty', sum_qty, 'sum_price', sum_price) AS (metric, value)",
    )


@register(
    "agg_approx_distinct",
    sql="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_ok,
           quantile_disc(l_extendedprice, 0.5) AS median_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark, sf_dir):
    """HLL distinct-count sketch with its accuracy contract AS the oracle:
    the HLL estimate itself is engine-internal, so the checkable surface
    is (a) the exact distinct count, (b) a boolean asserting the sketch
    landed within 3×rsd of it (deterministic: Spark's HLL is
    deterministic for fixed input), and (c) an exact-at-this-accuracy
    median (see agg_approx_quantiles for the convention).

    The exact distinct runs as its OWN aggregation joined back on the
    3-row group key, never in the same agg as the percentile: a true
    DISTINCT aggregate plans through Expand, which re-keys the partial
    phase by (group, distinct-value) — so every approx_percentile
    partial becomes a PER-PARTKEY QuantileSummaries buffer (tens of
    thousands of accuracy-10^6 summaries to allocate and merge). The
    full-catalog sf0.1 sweep caught the combined form at 31 s; the
    split form is ~1 s, and each subplan column-prunes its scan to
    exactly one value column — the cheaper shape at 100 TB too."""
    li = T(spark, sf_dir, "lineitem")
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx_parts"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000000)").alias(
            "median_price"
        ),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return (
        exact.join(F.broadcast(sketch), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= F.lit(0.15) * F.col("exact_parts")
            ).alias("hll_ok"),
            "median_price",
        )
    )


# ---------------------------------------------------------------- windows

@register(
    "window_rank_acctbal",
    sql="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
        RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rnk,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
    tags=("window",),
)
def window_rank_acctbal(spark, sf_dir):
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("rnk"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    sql="""
    SELECT o_orderkey, o_custkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM orders
    """,
    tags=("window",),
)
def window_running_total(spark, sf_dir):
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "window_lag_delta",
    sql="""
    SELECT event_id, user_id,
      value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta,
      LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
    tags=("window", "events"),
)
def window_lag_delta(spark, sf_dir):
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_moving_avg",
    sql="""
    SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
        / COUNT(value) OVER w AS mavg3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "events"),
)
def window_moving_avg(spark, sf_dir):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    ev = T(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(dec("value")).over(w).cast("double") / F.count("value").over(w)).alias(
            "mavg3"
        ),
    )


@register(
    "window_topk_per_group",
    sql="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark, sf_dir):
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        T(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------- sort/limit

@register(
    "sort_limit_topk_orders",
    sql="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "limit"),
)
def sort_limit_topk_orders(spark, sf_dir):
    # orderBy().limit() compiles to TakeOrderedAndProject: a per-partition
    # top-k + single merge, never a full sort — the scale-safe plan.
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------- set ops

@register(
    "set_union_all_counts",
    sql="""
    SELECT nk, COUNT(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION ALL
      SELECT s_nationkey AS nk FROM supplier) u
    GROUP BY nk
    """,
    tags=("setop",),
)
def set_union_all_counts(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.unionAll(s).groupBy("nk").agg(F.count("*").alias("n"))


@register(
    "set_intersect_custkeys",
    sql="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop",),
)
def set_intersect_custkeys(spark, sf_dir):
    rich = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    big = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.intersect(big)


@register(
    "set_except_custkeys",
    sql="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
    """,
    tags=("setop",),
)
def set_except_custkeys(spark, sf_dir):
    rich = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    big = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return rich.exceptAll(big).distinct()


@register(
    "distinct_projection",
    sql="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    tags=("setop", "distinct"),
)
def distinct_projection(spark, sf_dir):
    return T(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------- scalars

@register(
    "scalar_string_funcs",
    sql="""
    SELECT p_partkey,
      UPPER(p_name) AS name_upper,
      LENGTH(p_name) AS name_len,
      SUBSTR(p_type, 1, 5) AS type_prefix,
      REPLACE(p_brand, '#', '-') AS brand_dashed,
      p_brand || '/' || p_type AS brand_type,
      CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS is_promo,
      TRIM(CONCAT('  ', p_name, '  ')) AS name_trim
    FROM part
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dashed"),
        F.concat("p_brand", F.lit("/"), "p_type").alias("brand_type"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("is_promo"),
        F.trim(F.concat(F.lit("  "), "p_name", F.lit("  "))).alias("name_trim"),
    )


@register(
    "scalar_date_funcs",
    sql="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
      COUNT(*) AS n,
      CAST(MIN(o_orderdate) AS DATE) AS first_day,
      CAST(MAX(o_orderdate) AS DATE) AS last_day
    FROM orders GROUP BY 1, 2
    """,
    tags=("scalar", "date"),
)
def scalar_date_funcs(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.count("*").alias("n"),
        F.min("o_orderdate").cast("date").alias("first_day"),
        F.max("o_orderdate").cast("date").alias("last_day"),
    )


@register(
    "scalar_math_funcs",
    sql="""
    SELECT l_orderkey, l_linenumber,
      ABS(l_discount - 0.05) AS disc_dev,
      CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
      CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
      l_orderkey % 7 AS key_mod,
      l_quantity * 2 AS qty_double,
      GREATEST(l_quantity, 25.0) AS qty_hi, LEAST(l_quantity, 25.0) AS qty_lo
    FROM lineitem WHERE l_orderkey < 100
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        (F.col("l_quantity") * 2).alias("qty_double"),
        F.greatest("l_quantity", F.lit(25.0)).alias("qty_hi"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_lo"),
    )


@register(
    "expr_case_buckets",
    sql="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer GROUP BY 1
    """,
    tags=("scalar", "case"),
)
def expr_case_buckets(spark, sf_dir):
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 3000, "low")
        .when(F.col("c_acctbal") < 7000, "mid")
        .otherwise("high")
    )
    return (
        T(spark, sf_dir, "customer")
        .groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"), dsum("c_acctbal").alias("total_bal"))
    )


@register(
    "expr_coalesce_nullif",
    sql="""
    SELECT COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg, COUNT(*) AS n
    FROM customer GROUP BY 1
    """,
    tags=("scalar", "null"),
)
def expr_coalesce_nullif(spark, sf_dir):
    seg = F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
    return (
        T(spark, sf_dir, "customer")
        .groupBy(seg.alias("seg"))
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extract_props",
    sql="""
    SELECT event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY event_type
    """,
    tags=("scalar", "json"),
)
def json_extract_props(spark, sf_dir):
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("sum_k"),
            F.max(k).alias("max_k"),
        )
    )


# ---------------------------------------------------------------- scans / lookups

@register(
    "point_lookup_order",
    sql="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
    FROM orders WHERE o_orderkey = 4242
    """,
    tags=("scan", "lookup"),
)
def point_lookup_order(spark, sf_dir):
    return (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 4242)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
    )


@register(
    "scan_filter_project",
    sql="""
    SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_quantity BETWEEN 10 AND 20
    """,
    tags=("scan", "filter"),
)
def scan_filter_project(spark, sf_dir):
    return (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
            & F.col("l_quantity").between(10, 20)
        )
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


# ---------------------------------------------------------------- subqueries

@register(
    "subquery_exists_combo",
    sql="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 350000)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderstatus = 'P')
    """,
    tags=("subquery", "join"),
)
def subquery_exists_combo(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 350000)
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return (
        cust.join(big, F.col("c_custkey") == big.o_custkey, "left_semi")
        .join(pending, F.col("c_custkey") == pending.o_custkey, "left_anti")
        .select("c_custkey")
    )


@register(
    "subquery_scalar_avg",
    sql="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*) FROM customer)
    """,
    tags=("subquery", "scalar"),
)
def subquery_scalar_avg(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    avg_bal = cust.agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    # broadcast the 1-row aggregate instead of collecting to the driver
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_acctbal")
    )


@register(
    "window_ntile_stats",
    sql="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "ntile", "distribution"),
)
def window_ntile_stats(spark, sf_dir):
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per market segment — completes the §2.6 window surface. All three
    share ONE (segment, acctbal) sort; the c_custkey tie-break makes
    every rank deterministic (percent_rank/cume_dist are ratios of
    ranks over identical inputs — IEEE-identical across engines)."""
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return T(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "agg_exact_quantiles",
    sql="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.25) AS p25,
           quantile_cont(o_totalprice, 0.50) AS p50,
           quantile_cont(o_totalprice, 0.75) AS p75,
           quantile_cont(o_totalprice, 0.95) AS p95,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "quantile", "exact"),
)
def agg_exact_quantiles(spark, sf_dir):
    """EXACT linear-interpolated percentiles per priority — the precise
    twin of agg_approx_quantiles' GK sketch: F.percentile sorts each
    group's values exactly, and DuckDB's quantile_cont applies the same
    interpolation formula to the same doubles, so the result is
    bit-identical (verified; the interpolation is one multiply-add on
    identically-ranked inputs). Exact per-group quantiles shuffle every
    value of the group to one reducer — fine for priority-sized groups,
    and exactly WHY the GK-sketch variant exists for high-cardinality
    keys at 100 TB."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.50)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.75)").alias("p75"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.count("*").alias("n"),
        )
    )


@register(
    "array_higher_order_funcs",
    sql="""
    WITH t AS (
      SELECT o_custkey, list(CAST(o_totalprice AS DECIMAL(12,2)) ORDER BY o_orderkey) AS prices
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
           len(prices) AS n_orders,
           COALESCE(CAST(list_aggregate([p FOR p IN prices IF p > 200000], 'sum')
                         AS DOUBLE), 0.0) AS big_total,
           len([p FOR p IN prices IF p > 200000]) AS n_big,
           CAST(list_aggregate([p * 2 FOR p IN prices], 'sum') AS DOUBLE)
             AS doubled_total
    FROM t
    """,
    tags=("scalar", "array", "higher-order"),
)
def array_higher_order_funcs(spark, sf_dir):
    """Higher-order array functions as a first-class surface (§2.4):
    collect per-customer price arrays once, then filter / transform /
    aggregate WITHIN the array — no re-shuffle, no explode-regroup
    round-trip. This is the pattern that turns 'explode, filter,
    groupBy again' (two extra shuffles at 100 TB) into per-row lambda
    evaluation inside whole-stage codegen. Decimal elements keep the
    in-array sums engine-exact; the array is collected in o_orderkey
    order so construction is deterministic (sums would be
    order-independent anyway — decimal addition commutes exactly)."""
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    t = (
        T(spark, sf_dir, "orders")
        .withColumn(
            "prices",
            F.collect_list(dec).over(
                W.partitionBy("o_custkey").orderBy("o_orderkey")
                .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
            ),
        )
        .groupBy("o_custkey")
        .agg(F.first("prices").alias("prices"))
    )
    big = F.filter("prices", lambda p: p > 200000)
    zero = F.lit(0).cast("decimal(12,2)")
    return t.select(
        "o_custkey",
        F.size("prices").alias("n_orders"),
        F.aggregate(
            big,
            zero.cast("decimal(22,2)"),
            lambda acc, p: (acc + p).cast("decimal(22,2)"),
        )
        .cast("double")
        .alias("big_total"),
        F.size(big).alias("n_big"),
        F.aggregate(
            F.transform("prices", lambda p: p * F.lit(2).cast("decimal(12,2)")),
            zero.cast("decimal(28,2)"),
            lambda acc, p: (acc + p).cast("decimal(28,2)"),
        )
        .cast("double")
        .alias("doubled_total"),
    )


@register(
    "join_null_safe_eq",
    sql="""
    WITH l AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 7 AS BIGINT) END AS grp
      FROM orders),
    r AS (
      SELECT CASE WHEN g = -1 THEN NULL ELSE g END AS grp,
             CASE WHEN g = -1 THEN 'null-bucket' ELSE 'bucket-' || g END AS label
      FROM (SELECT unnest([-1, 0, 1, 2, 3]) AS g) t)
    SELECT r.label, COUNT(*) AS n
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    GROUP BY r.label
    """,
    tags=("join", "null-safe"),
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics for joining on
    optional attributes (a plain equi-join silently drops every
    NULL-keyed row; an unnoticed drop at 100 TB is a data-loss bug, not
    a perf bug). Catalyst plans `<=>` as a hash join exactly like `=`
    (EqualNullSafe is a valid equi-join key), so the null bucket costs
    nothing extra — but it IS one hash bucket, so a mostly-NULL key
    column needs the same skew treatment as any hot key."""
    l = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_orderkey") % 7)
        .alias("grp"),
    )
    rows = [(None, "null-bucket")] + [(g, f"bucket-{g}") for g in (0, 1, 2, 3)]
    r = spark.createDataFrame(rows, "grp bigint, label string")
    return (
        l.join(F.broadcast(r), l.grp.eqNullSafe(r.grp))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@register(
    "agg_mode_deterministic",
    sql="""
    WITH c AS (
      SELECT o_custkey, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_custkey, o_orderpriority),
    r AS (
      SELECT o_custkey, o_orderpriority, n,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY n DESC, o_orderpriority) AS rk
      FROM c)
    SELECT o_custkey, o_orderpriority AS mode_priority, n AS mode_count
    FROM r WHERE rk = 1
    """,
    tags=("agg", "mode", "window"),
)
def agg_mode_deterministic(spark, sf_dir):
    """Deterministic per-group MODE (most frequent value, ties broken by
    the value itself): count-then-rank instead of the built-in `mode()`,
    whose tie choice is engine/partitioning-dependent — unacceptable
    under this catalog's bit-exactness contract AND a real
    reproducibility bug at scale (a retried stage could flip the
    answer). Two map-side-combinable aggregations sharing the group key
    + one tiny window over per-group distinct values."""
    c = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("o_custkey").orderBy(F.desc("n"), "o_orderpriority")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_custkey",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "supplier_lead_time_stats",
    sql="""
    SELECT l.l_suppkey,
      CAST(COUNT(*) AS BIGINT) AS n_lines,
      CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
        AS total_lead_days,
      CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS DOUBLE)
        / COUNT(*) AS avg_lead_days,
      CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_slow,
      CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS slow_rate
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY l.l_suppkey
    """,
    tags=("relational", "analytics", "dates"),
)
def supplier_lead_time_stats(spark, sf_dir):
    """Per-supplier fulfilment performance: order->ship lead time
    (days between o_orderdate and l_shipdate) totals/averages plus the
    slow-shipment rate (> 90 days) — the supplier scorecard behind
    q21's 'waiting suppliers' (that query finds blocking incidents;
    this ranks chronic offenders). One fact join (orders side carries
    only the date — AQE broadcasts the pruned projection when it
    fits), one shuffle to supplier grain; integer day arithmetic and
    exact-int/count divisions keep it cross-engine bit-identical."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    lead = F.datediff("l_shipdate", "o_orderdate")
    slow = (lead > 90).cast("int")
    return j.groupBy("l_suppkey").agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.sum(lead).cast("bigint").alias("total_lead_days"),
        (F.sum(lead).cast("double") / F.count("*")).alias("avg_lead_days"),
        F.sum(slow).cast("bigint").alias("n_slow"),
        (F.sum(slow).cast("double") / F.count("*")).alias("slow_rate"),
    )
