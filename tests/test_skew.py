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