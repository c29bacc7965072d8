"""Small-file compaction: fewer files, identical rows, no-op when
already compact, row-mismatch safety is structural (verify-then-swap)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.compaction import compact_parquet


def _n_files(path: str) -> int:
    return len(glob.glob(f"{path}/*.parquet"))


def test_compacts_small_files_preserving_rows(spark, tmp_path):
    target = str(tmp_path / "zone")
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.rand(11).alias("v")
    )
    df.repartition(40).write.parquet(target)
    assert _n_files(target) == 40
    before = {(r.id, r.k) for r in spark.read.parquet(target).collect()}

    receipt = compact_parquet(spark, target, target_bytes=1 << 30)
    assert receipt["compacted"] is True
    assert receipt["files_before"] == 40
    assert receipt["files_after"] == 1
    assert receipt["rows"] == 20_000
    assert _n_files(target) == 1
    after = {(r.id, r.k) for r in spark.read.parquet(target).collect()}
    assert after == before
    # no staging / trash debris left behind (the empty lease claim dir
    # legitimately remains)
    assert not [
        p for p in glob.glob(f"{target}__*") if not p.endswith("__lease")
    ]


def test_noop_when_already_compact(spark, tmp_path):
    target = str(tmp_path / "zone")
    spark.range(100).coalesce(1).write.parquet(target)
    receipt = compact_parquet(spark, target, target_bytes=1 << 30)
    assert receipt["compacted"] is False
    assert receipt["files_before"] == receipt["files_after"] == 1


def test_target_sizing_splits_output(spark, tmp_path):
    """target_bytes below the data size yields multiple output files:
    n_out = ceil(total/target), sized from the store's actual bytes."""
    target = str(tmp_path / "zone")
    spark.range(50_000).select(
        F.col("id"), F.md5(F.col("id").cast("string").cast("binary")).alias("pad")
    ).repartition(30).write.parquet(target)
    import os

    total = sum(
        os.path.getsize(p) for p in glob.glob(f"{target}/*.parquet")
    )
    receipt = compact_parquet(spark, target, target_bytes=total // 3)
    assert receipt["compacted"] is True
    assert 3 <= receipt["files_after"] <= 4
    assert spark.read.parquet(target).count() == 50_000
