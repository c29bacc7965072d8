"""Write-policy tests: partition layout, file counts, clustering."""

from __future__ import annotations

import glob

import datetime as dt

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.write_policy import write_fact


def test_write_fact_partitions_and_file_budget(spark, tmp_path):
    path = str(tmp_path / "fact")
    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("grp"),
        F.when(F.col("id") % 2 == 0, F.lit(dt.date(2026, 8, 1)))
        .otherwise(F.lit(dt.date(2026, 8, 2)))
        .alias("date"),
    )
    write_fact(
        df,
        path,
        partition_cols=("date",),
        cluster_by=("k",),
        files_per_partition=4,
        max_records_per_file=100_000,
    )
    # hive-style partition dirs exist
    parts = sorted(p.split("date=")[1] for p in glob.glob(f"{path}/date=*"))
    assert parts == ["2026-08-01", "2026-08-02"]
    # file budget respected per partition (>=1, <= files bucketed)
    for p in parts:
        files = glob.glob(f"{path}/date={p}/*.parquet")
        assert 1 <= len(files) <= 8
    # round trip preserves data
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert {str(r.date) for r in back.select("date").distinct().collect()} == {
        "2026-08-01",
        "2026-08-02",
    }


def test_write_fact_clustering_sorts_within_files(spark, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "clustered")
    df = spark.range(5_000).select(
        F.col("id").alias("k"), F.lit(dt.date(2026, 8, 1)).alias("date")
    )
    write_fact(df, path, partition_cols=("date",), cluster_by=("k",))
    f = glob.glob(f"{path}/date=*/*.parquet")[0]
    ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
    assert ks == sorted(ks)  # row-group stats can prune on k


def test_observed_write_metrics_free_of_extra_pass(spark, tmp_path):
    """observe() metrics arrive from the write job itself; expectations
    over nulls/ranges/rowcount match a direct computation."""
    from pyspark.sql import functions as F

    from chchfr_data_collection_spark.operators.validate import observed_write
    from chchfr_data_collection_spark.session import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    m = observed_write(
        li,
        str(tmp_path / "obs"),
        {
            "n": F.count(F.lit(1)),
            "null_keys": F.sum(F.isnull("l_orderkey").cast("int")),
            "neg_qty": F.sum((F.col("l_quantity") < 0).cast("int")),
        },
    )
    assert m["n"] == li.count()
    assert m["null_keys"] == 0 and m["neg_qty"] == 0
    # the written output is complete (observation didn't perturb the write)
    assert spark.read.parquet(str(tmp_path / "obs")).count() == m["n"]
