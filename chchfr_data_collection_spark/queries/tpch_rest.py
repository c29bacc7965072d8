"""The remaining TPC-H query shapes (Q2/4/7/8/11/12/15/16/17/20/21),
adapted to the fixture's trimmed star schema (no partsupp, no
commit/receipt dates) while keeping each query's structural essence:
correlated-min supplier selection, EXISTS probes, nation-pair volume,
market share, HAVING-vs-scalar-subquery, conditional priority counts,
max-revenue view, distinct-supplier counts, correlated-avg filters,
nested semi-join chains, and the multi-exists "waiting supplier" fold.

Completes the 22/22 TPC-H relational surface together with
queries/relational.py + queries/advanced.py. Determinism policy as in
queries/__init__: monetary sums via DECIMAL(12,2), division only
between identically-derived doubles, unique tie-break keys under every
LIMIT.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from .common import T, dsum

_DISC = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"


def _disc_price():
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")


@register(
    "q2_min_cost_supplier",
    sql="""
    WITH offers AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
             l_extendedprice / l_quantity AS unit_price
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'),
    m AS (SELECT *, MIN(unit_price) OVER (PARTITION BY p_partkey) AS min_price
          FROM offers)
    SELECT DISTINCT s_acctbal, s_name, n_name AS nation, p_partkey,
           unit_price AS min_unit_price
    FROM m WHERE unit_price = min_price
    ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100
    """,
    tags=("join", "subquery", "correlated-min", "tpch"),
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the minimum unit price within one region — the correlated-MIN
    subquery pattern (here: offers from lineitem stand in for partsupp).
    Part/supplier/nation/region all broadcast after their filters; the
    correlated min is a per-part window over the filtered offer set, so
    the only shuffle is on p_partkey. Unit price is raw IEEE double
    division — bit-identical across engines for identical inputs."""
    li = T(spark, sf_dir, "lineitem")
    part = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    offers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select(
            "p_partkey",
            "s_name",
            "s_acctbal",
            F.col("n_name").alias("nation"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    w = W.partitionBy("p_partkey")
    return (
        offers.withColumn("min_price", F.min("unit_price").over(w))
        .filter(F.col("unit_price") == F.col("min_price"))
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            "p_partkey",
            F.col("unit_price").alias("min_unit_price"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q4_order_priority_check",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("join", "semi", "exists", "tpch"),
)
def q4_order_priority_check(spark, sf_dir):
    """TPC-H Q4 shape: priority histogram of orders with at least one
    late lineitem (EXISTS probe; shipped >60 days after order date
    stands in for commit<receipt). The quarter filter prunes the orders
    scan; the EXISTS is a left-semi join on o_orderkey with the lateness
    residual evaluated inside the join — no second pass, no distinct."""
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q7_volume_shipping",
    sql=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             {_DISC} AS vol
      FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01') t
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "nation-pair", "tpch"),
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7: shipping volume between a nation pair, both directions,
    by ship year. The nation filters broadcast into supplier/customer
    BEFORE the fact joins, so each fact row joins against two pre-shrunk
    dimensions; orders⋈lineitem is the one big-big shuffle. The OR of
    the two directions is evaluated post-join on two tiny columns."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nations = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
    )
    cust = (
        T(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(
            F.broadcast(nations.select(F.col("n_nationkey").alias("c_nationkey"),
                                       F.col("n_name").alias("cust_nation"))),
            "c_nationkey",
        )
    )
    supp = (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nations.select(F.col("n_nationkey").alias("s_nationkey"),
                                       F.col("n_name").alias("supp_nation"))),
            "s_nationkey",
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q8_market_share",
    sql=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
                         ELSE CAST(0 AS DECIMAL(12,2)) * CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_DISC} AS vol, n1.n_name AS supp_nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01') t
    GROUP BY o_year
    """,
    tags=("join", "agg", "market-share", "tpch"),
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8: one nation's share of a region's order volume for one
    part type, by year — the numerator is a conditional sum inside the
    same aggregation as the denominator (one pass, no self-join).
    Part filter broadcasts and prunes the fact first; customer arrives
    pre-filtered to the region via a broadcast nation⋈region."""
    part = (
        T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("c_nationkey"))
    cust = (
        T(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(asia_nations), "c_nationkey")
    )
    supp = (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("s_nationkey"),
                                      F.col("n_name").alias("supp_nation"))),
            "s_nationkey",
        )
    )
    vol = _disc_price()
    zero = F.lit(0).cast("decimal(12,2)") * F.lit(0).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q11_important_stock",
    sql=f"""
    WITH natval AS (
      SELECT l_partkey, {_DISC} AS val
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3')
    SELECT l_partkey AS partkey, CAST(SUM(val) AS DOUBLE) AS stock_value
    FROM natval
    GROUP BY l_partkey
    HAVING CAST(SUM(val) AS DOUBLE) >
           (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM natval)
    """,
    tags=("join", "agg", "having", "scalar-subquery", "tpch"),
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: per-part stock value within one nation, kept
    only when above a fraction of the nation's total — HAVING against a
    scalar subquery over the same derived set. The grouped aggregate and
    the grand total are both sums of the same decimal-exact column; the
    total rides in as a 1-row broadcast, so the fact is scanned once per
    aggregate with no driver-side action."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    natsupp = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    natval = li.join(
        F.broadcast(natsupp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", _disc_price().alias("val"))
    total = natval.agg((F.sum("val").cast("double") * F.lit(0.001)).alias("threshold"))
    return (
        natval.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("val").cast("double").alias("stock_value"))
        .join(F.broadcast(total))
        .filter(F.col("stock_value") > F.col("threshold"))
        .select("partkey", "stock_value")
    )


@register(
    "q12_shipmode_priority",
    sql="""
    SELECT l_linestatus AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY l_linestatus
    """,
    tags=("join", "agg", "conditional", "tpch"),
)
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape: high/low-priority line counts per ship class for
    late shipments (shipped >90 days after order; linestatus stands in
    for shipmode). The year filter pushes to the lineitem scan; the
    lateness predicate spans both join sides so it evaluates as the
    join residual; the two counts are one conditional aggregation."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    sql=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, CAST(SUM({_DISC}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("join", "agg", "view", "scalar-subquery", "tpch"),
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: quarterly revenue per supplier (the 'revenue view'),
    then the supplier(s) achieving the maximum — a scalar MAX subquery
    over the view joined back to it. The view is computed once and
    reused for both the max and the final join (Spark reuses the
    exchange); supplier names arrive by broadcast."""
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_part_counts",
    sql="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 2, 3, 4, 5, 6, 7, 8)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg", "distinct", "anti", "tpch"),
)
def q16_supplier_part_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, excluding one brand/type and a 'complaint' supplier set
    (negative account balance stands in for the comment scan). The
    exclusion set is dimension-sized -> broadcast anti-join; the
    distinct count is Spark's two-phase partial-distinct aggregate, so
    the shuffle carries (attrs, suppkey) pairs, not raw lines."""
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(list(range(1, 9)))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    sql="""
    WITH t AS (
      SELECT l_quantity, l_extendedprice,
             AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#2' AND p_type = 'SMALL')
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM t WHERE l_quantity < 0.2 * avg_qty
    """,
    tags=("join", "agg", "correlated-avg", "tpch"),
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: revenue lost to small-quantity orders — each line
    compares against the average quantity OF ITS OWN PART (correlated
    AVG, here a per-part window over the brand/type-filtered join).
    The part filter broadcasts and shrinks the fact before the window's
    p_partkey shuffle. l_quantity is integral-valued in the fixture, so
    the window AVG is exact in both engines."""
    part = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    w = W.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
        )
    )


@register(
    "q20_part_promotion_suppliers",
    sql="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100)
    ORDER BY s_name
    """,
    tags=("join", "semi", "nested-subquery", "tpch"),
)
def q20_part_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in one nation who moved more than a
    threshold quantity of 'small%' parts in a year — the nested
    IN-subquery chain (part -> lineitem aggregate -> supplier) expressed
    as broadcast semi-joins. The inner aggregate shrinks lineitem to a
    supplier-keyed row set BEFORE touching the supplier table, so the
    outer probe is a tiny broadcast."""
    part = (
        T(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    nation = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_7")
        .select("n_nationkey")
    )
    supp = T(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(movers), "s_suppkey", "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    sql="""
    WITH per_supp AS (
      SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_ship
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey),
    marked AS (
      SELECT l_orderkey, l_suppkey, supp_ship,
             MAX(supp_ship) OVER (PARTITION BY l_orderkey) AS order_ship,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp
      FROM per_supp),
    flagged AS (
      SELECT *, SUM(CASE WHEN supp_ship = order_ship THEN 1 ELSE 0 END)
                  OVER (PARTITION BY l_orderkey) AS n_at_max
      FROM marked)
    SELECT s_name, COUNT(*) AS numwait
    FROM flagged JOIN supplier ON s_suppkey = l_suppkey
    WHERE supp_ship = order_ship AND n_supp > 1 AND n_at_max = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 100
    """,
    tags=("join", "window", "multi-exists", "tpch"),
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who single-handedly held up finished
    multi-supplier orders — the EXISTS (another supplier participated)
    plus NOT EXISTS (another supplier was equally late) pair, folded
    into one windowed pass instead of two self-joins: per (order,
    supplier) latest ship, then per-order max / participant count /
    at-max count as windows over the same partitioning (one shuffle on
    l_orderkey after the pre-aggregate). Late shipper = supplier whose
    latest ship equals the order's max, uniquely."""
    orders = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    per_supp = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_ship"))
    )
    w = W.partitionBy("l_orderkey")
    flagged = (
        per_supp.withColumn("order_ship", F.max("supp_ship").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("supp_ship") == F.col("order_ship"), 1).otherwise(0)
            ).over(w),
        )
        .filter(
            (F.col("supp_ship") == F.col("order_ship"))
            & (F.col("n_supp") > 1)
            & (F.col("n_at_max") == 1)
        )
    )
    supp = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.join(F.broadcast(supp), flagged.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
