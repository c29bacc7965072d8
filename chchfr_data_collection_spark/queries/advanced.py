"""Advanced relational surface: multi-join profit rollups, conditional
aggregation, HAVING filters, disjunctive predicate blocks — the TPC-H
shapes (Q9/Q14/Q18/Q19) adapted to the fixture's trimmed star schema.

All monetary math goes through DECIMAL(12,2) (see queries/__init__
determinism policy) so DuckDB reproduces every double bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import register
from .common import T, dsum

# full-precision decimal product (12,2 × 12,2) — summed exactly, cast to
# double only at the end; per-row rounding would drift from the oracle
_DISC = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")


@register(
    "q9_profit_by_nation_year",
    sql=f"""
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM({_DISC}) AS DOUBLE) AS profit
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON n_nationkey = s_nationkey
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    tags=("join", "agg", "tpch"),
)
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (profit by supplier nation × order year) on the
    trimmed schema. Join order: fact-first; the two dimensions
    (supplier, nation) broadcast — only orders⋈lineitem shuffles."""
    li = T(spark, sf_dir, "lineitem")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("profit"))
    )


@register(
    "q14_promo_revenue",
    sql=f"""
    SELECT CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC}
                                  ELSE CAST(0 AS DECIMAL(12,2)) * CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({_DISC}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14: conditional aggregation over a fact⋈dim join.
    `part` broadcasts; the month filter pushes down to the lineitem scan."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = _disc_price()
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast("decimal(12,2)") * F.lit(0).cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100.00) * F.sum(promo)).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_orders",
    sql="""
    SELECT c_name, o_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
           o_totalprice AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 170
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
    tags=("join", "agg", "having", "topk", "tpch"),
)
def q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: big-quantity orders via HAVING on a grouped join.
    At scale the orders⋈lineitem shuffle dominates; the HAVING filter is
    applied post-aggregation (cannot push down), but AQE coalesces the
    post-agg partitions before the top-k sort.

    `totalprice` is emitted as the raw parquet DOUBLE (not re-cast to
    decimal): both engines read the identical IEEE bits, while decimal
    outputs stringify differently per engine in the driver's hasher."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 170)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_predicates",
    sql=f"""
    SELECT CAST(SUM({_DISC}) AS DOUBLE) AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 50)
    """,
    tags=("join", "filter", "disjunctive", "tpch"),
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR'd predicate blocks spanning both join sides.
    Catalyst extracts the common join key as an equi-join and evaluates
    the residual disjunction post-join (broadcast-hash, not a cross)."""
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    block = lambda brand, lo_s, hi_s, lo_q, hi_q: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(lo_s, hi_s)
        & (F.col("l_quantity") >= lo_q)
        & (F.col("l_quantity") <= hi_q)
    )
    return joined.filter(
        block("Brand#1", 1, 15, 1, 30)
        | block("Brand#2", 10, 30, 10, 40)
        | block("Brand#3", 20, 50, 20, 50)
    ).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@register(
    "window_range_frame",
    sql="""
    SELECT event_id, user_id, value,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
        PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS rolling_1h_sum
    FROM events
    """,
    tags=("window", "range-frame", "events"),
)
def window_range_frame(spark, sf_dir):
    """RANGE-frame window (value-based, not row-count-based): per-user
    rolling 1-hour sum. Unlike rowsBetween, the frame is defined by the
    ORDER BY value distance — the shape for time-decayed features."""
    from pyspark.sql.window import Window

    # frame math at MICROSECOND precision: casting ts to long truncates to
    # seconds and drifts from the oracle's INTERVAL arithmetic on
    # sub-second boundaries (caught by the sf0.1 gate)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return T(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double").alias(
            "rolling_1h_sum"
        ),
    )


@register(
    "agg_collect_sorted",
    sql="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderpriority)), '|') AS priorities,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
    tags=("agg", "array"),
)
def agg_collect_sorted(spark, sf_dir):
    """Array aggregation: per-customer sorted list of order priorities
    (sorted + joined so the result is deterministic and cross-engine
    comparable as a plain string)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("o_orderpriority")), "|").alias(
                "priorities"
            ),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "events_rollup_multigrain",
    sql="""
    SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts), event_type),
                            (date_trunc('day', ts), date_trunc('hour', ts), event_type))
    """,
    tags=("agg", "grouping-sets", "events", "rollup"),
)
def events_rollup_multigrain(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: one pass produces both
    hourly and daily aggregates via GROUPING SETS (a continuous-aggregate
    cascade collapsed into a single shuffle). At scale this replaces two
    separate jobs over the same fact scan."""
    ev = T(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_mg")
    return spark.sql(
        """
        SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        FROM events_mg
        GROUP BY GROUPING SETS ((date_trunc('day', ts), event_type),
                                (date_trunc('day', ts), date_trunc('hour', ts), event_type))
        """
    )


@register(
    "q13_customer_order_distribution",
    sql="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    tags=("join", "agg", "histogram", "tpch"),
)
def q13_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13: histogram of per-customer order counts via a left
    outer join with a residual ON-clause predicate (customers with zero
    qualifying orders land in bucket 0 — an inner join would lose them).
    Two aggregations, both map-side-combinable."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q22_dormant_customers",
    sql="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT substr(c_name, 10, 2) AS cntrycode, c_acctbal
      FROM customer c
      WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')) t
    GROUP BY cntrycode
    """,
    tags=("join", "anti", "subquery", "tpch"),
)
def q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no URGENT
    orders (scalar subquery + anti-join), bucketed by a name-derived
    code. The anti-join broadcasts the orders key projection; the scalar
    avg is a 1-row broadcast join. AVG is computed as exact decimal
    sum / count so the filter boundary is bit-identical to the oracle."""
    cust = T(spark, sf_dir, "customer")
    orders_keys = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double")
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(orders_keys, "c_custkey", "left_anti")
    return (
        dormant.select(
            F.substring("c_name", 10, 2).alias("cntrycode"), "c_acctbal"
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias(
                "totacctbal"
            ),
        )
    )
