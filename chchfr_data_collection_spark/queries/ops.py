"""Operator-surface catalog entries: SCD2 dimension fold, skew-safe
aggregation/join, partitioned write policy, and the K3 idempotent-DDL
bootstrap — each exercised on fixture-derived inputs with an exact
DuckDB oracle, so the operators in operators/ are driver-visible instead
of unit-test-only.

Reference parity: K3 mirrors dag_create_gas_station_table.py:23-36
(idempotent CREATE TABLE) and §3.2's daily partition overwrite; SCD2 is
the §2.2 dimension-handling upgrade (reference is SCD0 insert-if-absent);
salting covers the §4.2 hot-key scenarios AQE cannot split (aggregations,
replicated-side joins).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from .common import T, dec, dsum

_TS = "yyyy-MM-dd HH:mm:ss"
_DTS = "%Y-%m-%d %H:%M:%S"


# --------------------------------------------------------------- SCD2 fold

@register(
    "scd2_dimension_fold",
    sql=f"""
    WITH batch_changed AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 3 = 0)
    -- history: nothing closed before this batch; untouched current rows
    SELECT s_suppkey AS location_id, s_name AS name, s_acctbal AS acctbal,
           strftime(TIMESTAMP '2025-01-01', '{_DTS}') AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to
    FROM supplier WHERE s_suppkey % 3 <> 0
    UNION ALL
    -- closed versions: batch carried different attributes
    SELECT s_suppkey, s_name, s_acctbal,
           strftime(TIMESTAMP '2025-01-01', '{_DTS}'),
           strftime(TIMESTAMP '2026-02-01', '{_DTS}')
    FROM supplier WHERE s_suppkey % 3 = 0
    UNION ALL
    -- new open versions for the changed keys
    SELECT s_suppkey, UPPER(s_name), s_acctbal,
           strftime(TIMESTAMP '2026-02-01', '{_DTS}'), CAST(NULL AS VARCHAR)
    FROM supplier WHERE s_suppkey % 3 = 0
    UNION ALL
    -- brand-new keys appended by the batch
    SELECT s_suppkey + 1000000, LOWER(s_name), s_acctbal,
           strftime(TIMESTAMP '2026-02-01', '{_DTS}'), CAST(NULL AS VARCHAR)
    FROM supplier WHERE s_suppkey % 7 = 0
    """,
    tags=("operator", "scd2", "dimension"),
)
def scd2_dimension_fold(spark, sf_dir):
    """SCD2 fold (operators/scd2.py): one change batch applied to a
    supplier-derived dimension. The batch updates every key ≡0 (mod 3)
    with a changed attribute (closing the old version, opening a new
    one), re-sends keys ≡1 (mod 3) UNCHANGED (must not create spurious
    versions — idempotence), and appends brand-new keys ≡0 (mod 7).
    Validity bounds are emitted as formatted strings so both engines
    stringify identically."""
    from ..operators.scd2 import scd2_apply

    supp = T(spark, sf_dir, "supplier")
    dim = supp.select(
        F.col("s_suppkey").alias("location_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    changed = supp.filter(F.col("s_suppkey") % 3 == 0).select(
        F.col("s_suppkey").alias("location_id"),
        F.upper("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    unchanged = supp.filter(F.col("s_suppkey") % 3 == 1).select(
        F.col("s_suppkey").alias("location_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    new_keys = supp.filter(F.col("s_suppkey") % 7 == 0).select(
        (F.col("s_suppkey") + 1000000).alias("location_id"),
        F.lower("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    batch = changed.unionByName(unchanged).unionByName(new_keys)
    folded = scd2_apply(
        dim,
        batch,
        keys=["location_id"],
        attrs=["name", "acctbal"],
        batch_ts=F.lit("2026-02-01 00:00:00"),
    )
    return folded.select(
        "location_id",
        "name",
        "acctbal",
        F.date_format("valid_from", _TS).alias("valid_from"),
        F.date_format("valid_to", _TS).alias("valid_to"),
    )


# ------------------------------------------------------------ skew salting

@register(
    "salted_agg_orders",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("operator", "skew", "agg"),
)
def salted_agg_orders(spark, sf_dir):
    """Two-phase skew-safe aggregation (operators/skew.py): phase 1
    groups on (key, salt) so a hot key partial-aggregates across
    n_salts tasks; phase 2 folds at most n_salts partials per key.
    Decimal partials keep the sum associative, so the salted result is
    bit-identical to the plain groupBy the oracle states."""
    from ..operators.skew import salted_agg

    orders = T(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice")
    out = salted_agg(
        orders,
        keys=["o_orderpriority"],
        partial_aggs={
            "n": F.count("*"),
            "total": F.sum(F.col("o_totalprice").cast("decimal(12,2)")),
        },
        final_aggs={"n": F.sum("n"), "total": F.sum("total")},
        n_salts=16,
    )
    return out.select(
        "o_orderpriority", "n", F.col("total").cast("double").alias("total")
    )


@register(
    "salted_join_lineitem",
    sql="""
    SELECT o.o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("operator", "skew", "join"),
)
def salted_join_lineitem(spark, sf_dir):
    """Salted equi-join (operators/skew.py): the big (lineitem) side gets
    a uniform salt, the orders side is replicated once per salt, and the
    join runs on (key, salt) — a hot orderkey spreads over 8 tasks
    instead of one straggler. Join output equals the unsalted join, so
    the oracle is the plain join + group-by."""
    from ..operators.skew import salted_join

    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on=["l_orderkey"], n_salts=8, how="inner")
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("revenue")
    )


@register(
    "skew_join_aqe",
    sql="""
    SELECT l.k, n.n_name, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM (SELECT CASE WHEN l_orderkey % 100 < 90 THEN 0
                      ELSE l_orderkey % 25 END AS k,
                 l_extendedprice
          FROM lineitem) l
    JOIN nation n ON n.n_nationkey = l.k
    GROUP BY l.k, n.n_name
    """,
    tags=("operator", "skew", "join", "aqe"),
)
def skew_join_aqe(spark, sf_dir):
    """The ZERO-CODE skew path: a deliberately hot-keyed sort-merge join
    left to `spark.sql.adaptive.skewJoin` (on in the session factory) —
    the complement of salted_join_lineitem, which handles the same
    shape by hand. ~90% of lineitem rows collapse onto key 0, so the
    post-shuffle partition holding key 0 dwarfs its peers; at run time
    AQE splits that partition into threshold-sized slices and replicates
    the matching dim rows per slice (OptimizeSkewedJoin), with no salt
    column, no replication logic, and no change to this query's text —
    the path a 1000-executor cluster prefers because split sizing tracks
    the ACTUAL runtime bytes, not a guessed n_salts.

    Two plan-shape preconditions, measured here because each silently
    disables the rule (the result stays correct, just stragglered):
    (1) the skewed side needs >1 MAP task — AQE splits a reduce
    partition by mapper ranges, so a single-row-group parquet scan
    (1 mapper) is UNSPLITTABLE; `parallelize_scan` restores map-side
    fan-out locally, and a real 100 TB scan has it structurally.
    (2) `OptimizeSkewedJoin` pattern-matches SMJ(Sort(stage),
    Sort(stage)) EXACTLY — a dim side that ends in an aggregation
    (e.g. a pre-counted orders-per-key relation) leaves its final
    HashAggregate between Sort and the shuffle stage and silently
    vetoes the rule (measured here; AQE replanning also strips a
    user repartition() inserted to force a stage boundary). Hence the
    dim is a plain `nation` scan; pre-aggregated dims belong on the
    salted path (salted_join_lineitem) or behind a broadcast.

    The `merge` hint keeps the demo honest: the 25-row dim side would
    otherwise broadcast (skew becomes a non-event — also a valid
    answer, but then nothing exercises the skew machinery). The
    skew-split firing is pinned by tests/test_skew.py::
    test_aqe_skew_join_splits_hot_partition at lowered thresholds plus
    forceOptimizeSkewedJoin (the downstream groupBy reuses the join's
    k-partitioning, and at 100 TB one extra agg exchange beats a
    straggler); correctness is oracle-exact because AQE's split changes
    only the partitioning, never the join result."""
    hot = F.when(F.col("l_orderkey") % 100 < 90, F.lit(0)).otherwise(
        F.col("l_orderkey") % 25
    )
    li = (
        T(spark, sf_dir, "lineitem", parallel=True)
        .select(hot.cast("bigint").alias("k"), "l_extendedprice")
    )
    dim = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("k"), "n_name"
    )
    return (
        li.join(dim.hint("merge"), "k")
        .groupBy("k", "n_name")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "runtime_bloom_filter_join",
    sql="""
    SELECT l.l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
    tags=("operator", "join", "bloom", "runtime-filter"),
)
def runtime_bloom_filter_join(spark, sf_dir):
    """Selective-dim shuffle join relying on Spark's RUNTIME BLOOM
    FILTER (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by
    default): when the filtered orders side is too large to broadcast —
    the 100 TB norm — Catalyst injects `bloom_filter_agg` over the
    creation side's join keys and a `bloom_filter_might_contain` probe
    into the FACT SCAN, so ~80% of lineitem rows (the non-URGENT
    orders' items) are dropped BEFORE the join shuffle instead of
    after it. This is the semi-join reduction a hand-tuned engine
    implements explicitly; in Spark it is plan text, zero code.

    Preconditions measured here (tests/test_skew.py::
    test_runtime_bloom_filter_injected): injection requires the join to
    be a probable SHUFFLE join — with broadcast available at local
    scale the rule correctly declines (the broadcast hash join already
    prunes at the scan via its build side), so the plan test disables
    broadcast and lowers applicationSideScanSizeThreshold (default
    10 GB — the rule knows a small scan isn't worth the filter's cost).
    Result is oracle-exact either way: the bloom probe only drops rows
    the join would drop."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    sel = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(sel, li.l_orderkey == sel.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "compaction_roundtrip",
    sql="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY source
    """,
    tags=("operator", "compaction", "write"),
)
def compaction_roundtrip(spark, sf_dir):
    """Small-file compaction with the data read back THROUGH the swap:
    the documents table lands as 32 arrival-sized files (a streaming
    sink's sprawl), operators/compaction.compact_parquet rewrites it to
    ~target-sized files under the writer lease and verify-then-swaps,
    and the result is the per-source rollup of the COMPACTED directory
    — so the oracle (the same rollup on the original table) checks the
    swap lost and duplicated nothing, column values included.

    100 TB: compaction is the scheduled hygiene pass every landing zone
    needs (scan cost is per-file; arrival sizing != scan sizing); the
    operator sizes output from the store's actual bytes, is a receipt
    no-op when already compact, and runs per partition-leaf so hive
    layouts keep their pruning."""
    import tempfile
    import uuid as _uuid

    from ..operators.compaction import compact_parquet

    base = tempfile.mkdtemp(prefix=f"compact_{_uuid.uuid4().hex[:8]}_")
    zone = f"{base}/zone"
    T(spark, sf_dir, "documents").repartition(32).write.parquet(zone)
    receipt = compact_parquet(spark, zone, target_bytes=1 << 30)
    assert receipt["compacted"] and receipt["files_after"] < 32
    return (
        spark.read.parquet(zone)
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


@register(
    "parquet_footer_audit",
    sql="""
    SELECT 'customer' AS tbl, COUNT(*) AS n_rows FROM customer
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    """,
    tags=("operator", "audit", "metadata"),
)
def parquet_footer_audit(spark, sf_dir):
    """Table row-count audit from parquet FOOTERS only — zero data
    pages read, verified against the oracle's full COUNT(*) scans.

    This is the verification primitive behind compaction and the
    MinHash index fold (row-exact staging checks at one data pass),
    surfaced as a first-class table audit. The footer reads run
    EXECUTOR-side (operators/compaction.footer_row_count_distributed):
    the driver does one recursive listing — the same metadata sweep
    any scan planning pays — and the ~2-range-GET-per-file footer
    reads fan out as a Spark job, so a million-file 100 TB table
    audits in one task wave instead of hours of driver-serial GETs.
    The driver-side thread-pool variant (footer_row_count) remains the
    right tool per compaction leaf; this is the table-wide path the
    round-8 ADVICE named as the missing piece."""
    from ..operators.compaction import footer_row_count_distributed

    rows = [
        (t, footer_row_count_distributed(spark, f"{sf_dir}/{t}.parquet"))
        for t in ("customer", "lineitem", "orders")
    ]
    return spark.createDataFrame(rows, "tbl string, n_rows bigint")


# -------------------------------------------------------- write policy K2/K3

@register(
    "write_fact_roundtrip",
    sql="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("operator", "write-policy"),
)
def write_fact_roundtrip(spark, sf_dir):
    """Partitioned fact write policy (operators/write_policy.py):
    lineitem written partitioned by l_returnflag, hash-bucketed to
    files_per_partition files, clustered on l_shipdate for row-group
    pruning — then read back and aggregated. The oracle aggregates the
    source directly: a correct write policy is invisible to readers."""
    import tempfile

    from ..operators.write_policy import write_fact

    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate", "l_extendedprice"
    )
    # stable per-process target, overwritten on re-run — a fresh mkdtemp
    # per invocation would accumulate a lineitem copy per catalog sweep
    path = getattr(write_fact_roundtrip, "_loc", None)
    if path is None:
        path = tempfile.mkdtemp(prefix="write_fact_rt_")
        write_fact_roundtrip._loc = path
    write_fact(
        li,
        path,
        partition_cols=("l_returnflag",),
        cluster_by=("l_shipdate",),
        files_per_partition=2,
    )
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum("l_extendedprice").alias("total"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "ddl_bootstrap_partition_overwrite",
    sql="""
    SELECT s_suppkey AS location_id, ft.fuel_type,
      ROUND(ft.base_price + ((((s_suppkey * 4 + ft.ft_idx)) * 7919) % 61) / 100.0 - 0.37, 2)
        AS price,
      DATE '2026-01-01' AS price_date
    FROM supplier
    CROSS JOIN (VALUES ('Unleaded 91', 2.79, 0), ('Unleaded 95', 2.98, 1),
                       ('Unleaded 98', 3.11, 2), ('Diesel', 2.10, 3))
      AS ft(fuel_type, base_price, ft_idx)
    """,
    tags=("operator", "ddl", "upsert"),
)
def ddl_bootstrap_partition_overwrite(spark, sf_dir):
    """K3 + K2 end-to-end: idempotent DDL bootstrap (CREATE TABLE IF NOT
    EXISTS ... PARTITIONED BY (price_date), the reference's
    dag_create_gas_station_table.py:23-36) followed by an idempotent
    static-partition INSERT OVERWRITE of one day's prices — the
    reference's daily upsert as a partition-replace. Re-running converges
    to the same state (both statements are idempotent), which is what
    makes driver/oracle replays safe."""
    import tempfile

    from ..functions.prices import BASE_PRICES

    loc = getattr(ddl_bootstrap_partition_overwrite, "_loc", None)
    if loc is None:
        loc = tempfile.mkdtemp(prefix="chchfr_k3_")
        ddl_bootstrap_partition_overwrite._loc = loc
    spark.sql("CREATE DATABASE IF NOT EXISTS chchfr")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS chchfr.fuel_price (
          location_id BIGINT, fuel_type STRING, price DOUBLE, price_date DATE)
        USING parquet PARTITIONED BY (price_date)
        LOCATION '{loc}'
        """
    )
    fuel = spark.createDataFrame(
        [(ft, bp, i) for i, (ft, bp) in enumerate(BASE_PRICES)],
        "fuel_type string, base_price double, ft_idx int",
    )
    key = F.col("location_id") * 4 + F.col("ft_idx")
    priced = (
        T(spark, sf_dir, "supplier")
        .select(F.col("s_suppkey").alias("location_id"))
        .crossJoin(F.broadcast(fuel))
        .select(
            "location_id",
            "fuel_type",
            F.round(
                F.col("base_price")
                + ((key * F.lit(7919)) % F.lit(61)) / F.lit(100.0)
                - F.lit(0.37),
                2,
            ).alias("price"),
        )
    )
    priced.createOrReplaceTempView("__k3_incoming")
    spark.sql(
        """
        INSERT OVERWRITE TABLE chchfr.fuel_price
        PARTITION (price_date = DATE '2026-01-01')
        SELECT location_id, fuel_type, price FROM __k3_incoming
        """
    )
    return spark.table("chchfr.fuel_price")


@register(
    "bucketed_join_colocated",
    sql="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("operator", "bucketing", "join", "write-policy"),
)
def bucketed_join_colocated(spark, sf_dir):
    """Co-located fact⋈fact join via bucketed tables (SURVEY §4.3): both
    sides written `bucketBy(8, orderkey) sortBy(orderkey)`, so the join
    consumes pre-shuffled, pre-sorted buckets — the SortMergeJoin runs
    with ZERO exchanges on either side (pinned in tests/test_rollup.py).
    At 100 TB this moves the orders⋈lineitem shuffle from every query to
    the write path ONCE; every subsequent orderkey join (Q18/Q7/Q12/Q21
    shapes) is shuffle-free. The oracle reads the unbucketed source —
    bucketing must be invisible to results."""
    import atexit
    import os
    import shutil
    import tempfile
    import uuid

    # Table names are scoped by a per-process token and the data lives in
    # a per-process tempdir (external tables via option("path")), so two
    # processes sharing one warehouse (pytest + bench) can never clobber
    # each other's dirs mid-write; within a process the single token keeps
    # re-runs to ONE overwritten copy instead of leaking one per call.
    # The dir is removed at process exit, and the token is generated
    # independently of the tempdir name (tempfile's alphabet includes '_',
    # which made name-derived tokens truncatable).
    base = getattr(bucketed_join_colocated, "_loc", None)
    if base is None:
        tok = uuid.uuid4().hex[:8]
        base = tempfile.mkdtemp(prefix=f"chchfr_bucketed_{tok}_")
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        bucketed_join_colocated._loc = base
        bucketed_join_colocated._tok = tok
    tok = bucketed_join_colocated._tok
    li_t, o_t = f"chchfr_li_bucketed_{tok}", f"chchfr_orders_bucketed_{tok}"
    for t in (li_t, o_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .option("path", os.path.join(base, "lineitem"))
        .saveAsTable(li_t)
    )
    (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .option("path", os.path.join(base, "orders"))
        .saveAsTable(o_t)
    )
    li, orders = spark.table(li_t), spark.table(o_t)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@register(
    "partition_pruned_read",
    sql="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events
    WHERE date_trunc('day', ts) = TIMESTAMP '2024-01-15'
    GROUP BY 1, 2
    """,
    tags=("operator", "write-policy", "partition-pruning"),
)
def partition_pruned_read(spark, sf_dir):
    """Partition pruning end-to-end (SURVEY §4.3): events written
    date-partitioned ONCE per process, then a single-day read whose
    filter resolves at PLANNING time — the scan touches one directory of
    the layout, not the table (PartitionFilters in the plan; pinned in
    tests/test_rollup.py). At 100 TB this is the difference between
    reading ~100 GB and reading everything; the oracle recomputes from
    the unpartitioned source, proving layout is invisible to results."""
    import tempfile

    from ..session import load_table

    loc = getattr(partition_pruned_read, "_loc", None)
    if loc is None:
        loc = tempfile.mkdtemp(prefix="events_bydate_")
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("day", F.date_trunc("day", "ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(loc)
        )
        partition_pruned_read._loc = loc
        partition_pruned_read._loc_sf = sf_dir
    elif getattr(partition_pruned_read, "_loc_sf", None) != sf_dir:
        # different fixture scale: rewrite the layout for this sf_dir
        ev = load_table(spark, sf_dir, "events")
        (
            ev.withColumn("day", F.date_trunc("day", "ts").cast("date"))
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(loc)
        )
        partition_pruned_read._loc_sf = sf_dir
    back = spark.read.parquet(loc).filter(F.col("day") == F.lit("2024-01-15").cast("date"))
    return back.groupBy("day", "event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
    )


_DIFF_BUCKETS = 64


@register(
    "table_diff_checksum",
    sql=f"""
    WITH rh AS (
      SELECT o_orderkey % {_DIFF_BUCKETS} AS bucket,
             o_orderkey,
             CAST('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|' ||
               CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             ), 1, 12) AS BIGINT) AS h
      FROM orders),
    a AS (
      SELECT bucket, COUNT(*) AS n_a, SUM(h) AS ck_a FROM rh GROUP BY bucket),
    b AS (
      SELECT bucket, COUNT(*) AS n_b, SUM(h) AS ck_b FROM rh
      WHERE o_orderkey % 997 <> 13 GROUP BY bucket)
    SELECT a.bucket, a.n_a, b.n_b,
           (a.n_a = b.n_b AND a.ck_a = b.ck_b) AS buckets_match
    FROM a JOIN b ON a.bucket = b.bucket
    """,
    tags=("ops", "validation", "reconciliation"),
)
def table_diff_checksum(spark, sf_dir):
    """Merkle-style table reconciliation: bucket both sides of a
    replicated table by key, reduce each bucket to an order-independent
    checksum (integer SUM of per-row md5 hashes over the compared
    columns, money in cents so the hash input is float-format-free),
    and report which buckets disagree — the anti-entropy primitive
    behind replica repair / migration sign-off, where comparing 64
    checksums replaces re-scanning both tables row-by-row on every
    sync. The "replica" here injects drift (drops o_orderkey%997==13)
    so a known subset of buckets must mismatch; only those buckets
    would then be re-synced at row grain.

    100 TB plan: each side is one scan + one bucket-grain groupBy with
    map-side partials (integer sums are order/partitioning-independent
    — that's what makes the checksum well-defined); the final join is
    {_DIFF_BUCKETS} rows. Checksum width 48 bits (12 hex chars) keeps
    SUM within int64 at fixture scale; production uses 128-bit
    decimal(38) sums, same plan."""
    o = T(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_orderstatus"),
                    F.round(F.col("o_totalprice") * 100)
                    .cast("bigint")
                    .cast("string"),
                ).cast("binary")
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    rh = o.select(
        (F.col("o_orderkey") % _DIFF_BUCKETS).alias("bucket"),
        F.col("o_orderkey"),
        h.alias("h"),
    )
    a = rh.groupBy("bucket").agg(
        F.count("*").alias("n_a"), F.sum("h").alias("ck_a")
    )
    b = (
        rh.filter(F.col("o_orderkey") % 997 != 13)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_b"), F.sum("h").alias("ck_b"))
    )
    return a.join(b, "bucket").select(
        "bucket",
        "n_a",
        "n_b",
        ((F.col("n_a") == F.col("n_b")) & (F.col("ck_a") == F.col("ck_b"))).alias(
            "buckets_match"
        ),
    )


@register(
    "events_outliers_mad",
    sql="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS med FROM q GROUP BY event_type),
    mad AS (
      SELECT q.event_type, ANY_VALUE(m.med) AS med,
             quantile_cont(ABS(q.v - m.med), 0.5) AS mad
      FROM q JOIN med m ON m.event_type = q.event_type
      GROUP BY q.event_type)
    SELECT q.event_type, ANY_VALUE(t.med) AS med_cents,
           ANY_VALUE(t.mad) AS mad_cents,
           CAST(SUM(CASE WHEN ABS(q.v - t.med) > 3 * 1.4826 * t.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM q JOIN mad t ON t.event_type = q.event_type
    GROUP BY q.event_type
    """,
    tags=("events", "anomaly", "stats", "robust"),
)
def events_outliers_mad(spark, sf_dir):
    """Robust (median/MAD) outlier gate — the heavy-tail-safe sibling
    of the 3σ gate: mean and variance are themselves dragged by the
    outliers they're supposed to find, median and median-absolute-
    deviation are not (50% breakdown point). Flag |x−med| > 3·1.4826·MAD
    (1.4826 = the normal-consistency constant).

    Exactness: values quantize to cents; both engines compute the
    interpolated median of INTEGER inputs, whose midpoints are exact
    halves in double, and the flag threshold multiplies identical
    operands — bit-identical with no transcendental in sight.

    100 TB plan: exact medians need a per-type sort — at scale swap
    percentile_approx (the GK sketch, mergeable partials) into the SAME
    two-pass shape; the second pass is a broadcast join of #types
    constants against the scan, like the 3σ gate."""
    ev = T(spark, sf_dir, "events")
    q = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
    )
    med = q.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("med")
    )
    mad = (
        q.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(v - med), 0.5)").alias("mad"),
        )
    )
    return (
        q.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med_cents"),
            F.first("mad").alias("mad_cents"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("med"))
                    > 3 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "csv_ingest_permissive",
    sql="""
    WITH src AS (SELECT event_id, value FROM events WHERE event_id < 1000),
    marked AS (
      SELECT event_id, value, event_id % 97 = 0 AS corrupt FROM src)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(SUM(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT) AS n_clean,
      CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
      CAST(SUM(CASE WHEN corrupt THEN 0
                    ELSE CAST(round(value * 100) AS BIGINT) END) AS BIGINT)
        AS sum_clean_cents
    FROM marked
    """,
    tags=("sources", "csv", "quarantine", "ingest"),
)
def csv_ingest_permissive(spark, sf_dir):
    """CSV landing-zone ingest through Spark's REAL csv reader with
    PERMISSIVE malformed-row quarantine — the third-party-feed shape
    (the reference ingests clean HTTP JSON; a production landing zone
    also receives delimited drops with broken rows).

    End-to-end through real I/O: a deterministic CSV extract of the
    event feed is written with text rows — every event_id % 97 == 0 row
    deliberately carries a non-numeric value field — then read back
    with an explicit schema, mode=PERMISSIVE and
    columnNameOfCorruptRecord, so broken rows land in the corrupt
    column instead of killing the job (FAILFAST) or silently vanishing
    (DROPMALFORMED). Returns the ingest receipt: total/clean/corrupt
    counts and the cents-exact checksum of the clean payload, which the
    oracle reproduces arithmetically from the same marking rule.

    Scale: the write and read are both partition-parallel file I/O; the
    receipt is one aggregation. The quarantine policy composes with
    ingest_with_quarantine's three-way routing for rows that parse but
    fail validation."""
    import tempfile
    import uuid

    from pyspark.sql import types as ST

    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    line = F.when(
        F.col("event_id") % 97 == 0,
        F.concat_ws(",", F.col("event_id").cast("string"), F.lit("notanumber")),
    ).otherwise(
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            # %.2f, NOT format_number: the latter inserts thousands
            # separators at >= 1000, which would split the CSV field
            F.format_string("%.2f", F.col("value")),
        )
    )
    base = tempfile.mkdtemp(prefix=f"csvland_{uuid.uuid4().hex[:8]}_")
    ev.select(line.alias("value")).write.mode("overwrite").text(base)

    schema = ST.StructType(
        [
            ST.StructField("event_id", ST.LongType()),
            ST.StructField("value", ST.DoubleType()),
            ST.StructField("_corrupt", ST.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(base)
    )
    clean = F.col("_corrupt").isNull()
    return back.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(clean.cast("int")).cast("bigint").alias("n_clean"),
        F.sum((~clean).cast("int")).cast("bigint").alias("n_corrupt"),
        F.sum(
            F.when(clean, F.round(F.col("value") * 100).cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("sum_clean_cents"),
    )


def _rfm_duck() -> str:
    def thr(src, col):
        return f"""(
      SELECT MIN(v) FROM (
        SELECT {col} AS v,
               ROW_NUMBER() OVER (ORDER BY {col}, 1) AS rn,
               COUNT(*) OVER () AS nn
        FROM {src}) t
      WHERE rn >= (nn * {{pct}} + 99) // 100)"""

    dims = {
        "r": thr("base", "rneg"),
        "f": thr("base", "f"),
        "m": thr("base", "mdol"),
    }
    score = {
        k: " + ".join(
            f"CASE WHEN {c} >= {dims[k].format(pct=p)} THEN 1 ELSE 0 END"
            for p in (25, 50, 75)
        )
        for k, c in (("r", "b.rneg"), ("f", "b.f"), ("m", "b.mdol"))
    }
    return f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
    base AS (
      SELECT o_custkey,
        -CAST(date_diff('day', MAX(o_orderdate), mx.maxd) AS BIGINT) AS rneg,
        CAST(COUNT(*) AS BIGINT) AS f,
        CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / 100.0) AS BIGINT)
          AS mdol
      FROM orders CROSS JOIN mx GROUP BY o_custkey, mx.maxd)
    SELECT b.o_custkey AS custkey,
      CAST(1 + {score['r']} AS BIGINT) AS r_score,
      CAST(1 + {score['f']} AS BIGINT) AS f_score,
      CAST(1 + {score['m']} AS BIGINT) AS m_score
    FROM base b
    """


@register(
    "customer_rfm_segmentation",
    sql=_rfm_duck(),
    tags=("analytics", "quantile", "segmentation"),
)
def customer_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation — recency / frequency / monetary
    quartile scores (1..4, higher = better) per ordering customer, the
    standard marketing-analytics cut. Recency scores through its
    NEGATED day count so one formula ('>= threshold means better')
    serves all three dimensions with identical tie behavior; monetary
    is floored to whole dollars so the scoring histogram is
    value-range-bounded (the cents-exact decimal sum happens first).

    Scale shape: one shuffle to per-customer aggregates, then the same
    exact-quantile machinery as curriculum_quality_buckets per
    dimension — three bounded histograms, rank-k thresholds, broadcast
    back. No global sort of the customer relation anywhere."""
    o = T(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            (-F.min(F.datediff(F.col("maxd"), F.col("o_orderdate"))))
            .cast("bigint")
            .alias("rneg"),
            F.count("*").cast("bigint").alias("f"),
            F.floor(F.sum(dec("o_totalprice")) / 100.0).cast("bigint").alias("mdol"),
        )
    )
    base = base.localCheckpoint(eager=False)

    def thresholds(col):
        hist = base.groupBy(col).agg(F.count("*").alias("c"))
        cw = W.orderBy(col).rowsBetween(W.unboundedPreceding, W.currentRow)
        tw = W.orderBy(col).rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        cum = hist.select(
            F.col(col).alias("v"),
            F.sum("c").over(cw).alias("cum"),
            F.sum("c").over(tw).alias("n"),
        )
        return cum.agg(
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.expr(f"(n * {p} + 99) div 100"),
                        F.col("v"),
                    )
                ).alias(f"t{p}")
                for p in (25, 50, 75)
            ]
        )

    out = base
    for dim, col in (("r", "rneg"), ("f", "f"), ("m", "mdol")):
        t = thresholds(col).select(
            *[F.col(f"t{p}").alias(f"{dim}{p}") for p in (25, 50, 75)]
        )
        out = out.crossJoin(F.broadcast(t))
    score = lambda dim, col: (  # noqa: E731
        F.lit(1)
        + (F.col(col) >= F.col(f"{dim}25")).cast("int")
        + (F.col(col) >= F.col(f"{dim}50")).cast("int")
        + (F.col(col) >= F.col(f"{dim}75")).cast("int")
    ).cast("bigint")
    return out.select(
        F.col("o_custkey").alias("custkey"),
        score("r", "rneg").alias("r_score"),
        score("f", "f").alias("f_score"),
        score("m", "mdol").alias("m_score"),
    )


@register(
    "customer_pareto_concentration",
    sql="""
    WITH cust AS (
      SELECT o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents,
        CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(12,2))) / 100.0) AS BIGINT)
          AS mdol
      FROM orders GROUP BY o_custkey),
    h AS (SELECT mdol, CAST(COUNT(*) AS BIGINT) AS nc,
                 CAST(SUM(cents) AS BIGINT) AS cents
          FROM cust GROUP BY mdol),
    cum AS (
      SELECT mdol, nc, cents,
        SUM(cents) OVER (ORDER BY mdol DESC ROWS UNBOUNDED PRECEDING) AS cum_cents,
        SUM(cents) OVER () AS total_cents,
        SUM(nc) OVER () AS total_cust
      FROM h)
    SELECT CAST(MAX(total_cust) AS BIGINT) AS n_customers,
      CAST(SUM(CASE WHEN (cum_cents - cents) * 5 < total_cents * 4
                    THEN nc ELSE 0 END) AS BIGINT) AS n_top,
      CAST(SUM(CASE WHEN (cum_cents - cents) * 5 < total_cents * 4
                    THEN nc ELSE 0 END) AS DOUBLE) / MAX(total_cust)
        AS top_fraction,
      CAST(SUM(CASE WHEN (cum_cents - cents) * 5 < total_cents * 4
                    THEN cents ELSE 0 END) AS DOUBLE) / MAX(total_cents)
        AS revenue_share
    FROM cum
    """,
    tags=("analytics", "pareto", "quantile"),
)
def customer_pareto_concentration(spark, sf_dir):
    """Pareto / revenue-concentration analysis: what fraction of
    customers (taken from the top, in whole dollar-revenue buckets)
    carries >= 80 %% of total revenue — the 80/20 dashboard row behind
    key-account planning and long-tail pruning decisions.

    Exactness + scale in one shape: per-customer revenue is a
    cents-exact decimal sum (one shuffle); concentration is read off
    the DOLLAR-bucket histogram (value-range-bounded like the RFM /
    quantile family — never a global sort of customers), walking
    buckets from the top with pure-integer 80 %% arithmetic
    (cum*5 < total*4), so both engines agree bit-for-bit."""
    o = T(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(dec("o_totalprice")) * 100).cast("bigint").alias("cents"),
        F.floor(F.sum(dec("o_totalprice")) / 100.0).cast("bigint").alias("mdol"),
    )
    h = cust.groupBy("mdol").agg(
        F.count("*").cast("bigint").alias("nc"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    cw = W.orderBy(F.desc("mdol")).rowsBetween(W.unboundedPreceding, W.currentRow)
    tw = W.orderBy(F.desc("mdol")).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = h.select(
        "nc",
        "cents",
        F.sum("cents").over(cw).alias("cum_cents"),
        F.sum("cents").over(tw).alias("total_cents"),
        F.sum("nc").over(tw).alias("total_cust"),
    )
    qual = (F.col("cum_cents") - F.col("cents")) * 5 < F.col("total_cents") * 4
    return cum.agg(
        F.max("total_cust").cast("bigint").alias("n_customers"),
        F.sum(F.when(qual, F.col("nc")).otherwise(0)).cast("bigint").alias("n_top"),
        (
            F.sum(F.when(qual, F.col("nc")).otherwise(0)).cast("double")
            / F.max("total_cust")
        ).alias("top_fraction"),
        (
            F.sum(F.when(qual, F.col("cents")).otherwise(0)).cast("double")
            / F.max("total_cents")
        ).alias("revenue_share"),
    )
