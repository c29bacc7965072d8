"""Salted aggregation / join equivalence tests: the skew-safe plans must
produce exactly the results of their naive equivalents."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # 10k rows of one hot key + a long tail
    hot = spark.range(10_000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    tail = spark.range(1_000).select(
        F.concat(F.lit("t"), F.col("id") % 50).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(tail)


def test_salted_agg_equals_naive(spark):
    df = _skewed(spark)
    naive = {
        (r.k): (r.cnt, r.s) for r in df.groupBy("k")
        .agg(F.count("*").alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.cnt, r.s)
        for r in salted_agg(
            df,
            ["k"],
            {"cnt": F.count("*"), "s": F.sum("v")},
            {"cnt": F.sum("cnt"), "s": F.sum("s")},
        ).collect()
    }
    assert naive == salted


def test_salted_join_equals_naive(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1), ("t0", 2), ("t7", 3), ("missing", 9)], "k string, tag int"
    )
    naive = sorted(map(tuple, big.join(small, "k").collect()))
    salted = sorted(map(tuple, salted_join(big, small, ["k"]).collect()))
    assert naive == salted
    # left join keeps unmatched big-side rows exactly once
    naive_l = big.join(small, "k", "left").count()
    salted_l = salted_join(big, small, ["k"], how="left").count()
    assert naive_l == salted_l

def test_aqe_skew_join_splits_hot_partition(spark, sf_small):
    """Pin that the ZERO-CODE skew path actually fires: run
    skew_join_aqe with the AQE skew thresholds lowered to test-scale
    bytes and assert the executed plan carries a skew=true sort-merge
    join (OptimizeSkewedJoin split the hot partition). At the default
    256 MB threshold the sf0.001 fixture never trips the split — the
    lowered thresholds model the 100 TB shape where the hot key's
    partition dwarfs the advisory size."""
    from chchfr_data_collection_spark.queries import catalog

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the groupBy (k, n_orders) RE-USES the join's k-partitioning, so
        # AQE will not split it unless told the extra agg shuffle is worth
        # it — at 100 TB it is (straggler >> one more exchange)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = catalog()["skew_join_aqe"].fn(spark, sf_small)
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "skew=true" in plan, plan[:4000]
    # and the split changed only the partitioning, never the result
    hot = {r.k: (r.n, r.revenue) for r in rows}
    assert 0 in hot and len(hot) == 11  # hot key + tail keys 15..24
    assert hot[0][0] > 50 * max(v[0] for k, v in hot.items() if k != 0)


def test_runtime_bloom_filter_injected(spark, sf_small):
    """Pin that Catalyst injects the runtime bloom semi-join reduction
    into runtime_bloom_filter_join under shuffle-join conditions: the
    optimized plan carries a bloom_filter_agg on the creation side and
    a BloomFilterMightContain probe pushed toward the fact scan. At
    local scale the dim broadcasts (the rule correctly declines), so
    broadcast is disabled and the 10 GB application-side threshold
    lowered to model the 100 TB shape."""
    from chchfr_data_collection_spark.queries import catalog

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1b",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = catalog()["runtime_bloom_filter_join"].fn(spark, sf_small)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        rows = {r.l_returnflag: r.n for r in df.collect()}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "bloom_filter_agg" in plan, plan[:3000]
    assert "might_contain" in plan.lower(), plan[:3000]
    assert set(rows) == {"A", "N", "R"} and all(v > 0 for v in rows.values())
