"""Small-file compaction: fewer files, identical rows, no-op when
already compact, row-mismatch safety is structural (verify-then-swap),
verification is METADATA-only (one data pass), and staging/trash are
hidden from hive-layout listings."""

from __future__ import annotations

import glob

import pyspark.sql
import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.compaction import (
    _hidden_sibling,
    compact_parquet,
    footer_row_count,
)


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


def test_verification_is_metadata_only(spark, tmp_path, monkeypatch):
    """Compaction's row verification comes from parquet FOOTERS, not
    scan jobs: with DataFrame.count() booby-trapped, the whole
    compact-verify-swap still succeeds — proof the operation reads
    data pages exactly once (the rewrite). Round-7 verdict finding 1:
    the pre-count + staging re-read tripled compaction's own I/O."""
    target = str(tmp_path / "zone")
    spark.range(5_000).repartition(10).write.parquet(target)

    def _no_scan(self, *a, **kw):
        raise AssertionError("compact_parquet ran a count() scan job")

    monkeypatch.setattr(pyspark.sql.DataFrame, "count", _no_scan)
    receipt = compact_parquet(spark, target, target_bytes=1 << 30)
    assert receipt["compacted"] is True
    assert receipt["rows"] == 5_000
    monkeypatch.undo()
    assert spark.read.parquet(target).count() == 5_000


def test_footer_row_count_matches_scan(spark, tmp_path):
    """footer_row_count over a partitioned layout equals a real scan's
    count and survives hidden files (_SUCCESS, .crc)."""
    target = str(tmp_path / "t")
    spark.range(1_000).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    ).write.partitionBy("p").parquet(target)
    assert footer_row_count(spark, target) == 1_000


def test_staging_and_trash_hidden_from_table_listings(spark, tmp_path):
    """Staging/trash basenames are `_`-prefixed, so a hive-layout scan
    of the TABLE ROOT during the swap window skips them instead of
    discovering bogus partition values (round-7 verdict finding 2).
    Pinned two ways: the name helper itself, and a failed-publish
    rollback whose leftover debris (if any) is invisible to a root
    read."""
    assert _hidden_sibling("/x/table/date=1", "compact").startswith(
        "/x/table/_date=1__compact_"
    )
    root = str(tmp_path / "table")
    for d in (1, 2):
        spark.range(200).select(
            F.col("id"), F.lit(d).alias("v")
        ).repartition(8).write.parquet(f"{root}/date={d}")
    receipt = compact_parquet(spark, f"{root}/date=1", target_bytes=1 << 30)
    assert receipt["compacted"] is True
    # the swapped table root reads clean: only the two real partitions
    got = spark.read.option("basePath", root).parquet(
        f"{root}/date=1", f"{root}/date=2"
    )
    assert got.count() == 400


def test_row_mismatch_aborts_and_preserves_target(spark, tmp_path, monkeypatch):
    """A staging copy whose footer count disagrees with the source
    aborts BEFORE any rename: the target is untouched and readable,
    the staging dir removed."""
    import chchfr_data_collection_spark.operators.compaction as comp

    target = str(tmp_path / "zone")
    spark.range(3_000).repartition(10).write.parquet(target)
    real = comp.footer_row_count
    calls = {"n": 0}

    def lying(spark_, path_):
        calls["n"] += 1
        n = real(spark_, path_)
        return n - 1 if calls["n"] == 2 else n  # lie about staging

    monkeypatch.setattr(comp, "footer_row_count", lying)
    with pytest.raises(IOError, match="row mismatch"):
        comp.compact_parquet(spark, target, target_bytes=1 << 30)
    monkeypatch.undo()
    assert spark.read.parquet(target).count() == 3_000
    assert not [
        p for p in glob.glob(f"{target}__*") + glob.glob(f"{tmp_path}/_zone__*")
        if not p.endswith("__lease")
    ]


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


def test_footer_row_count_distributed_matches_driver_side(spark, tmp_path):
    """The executor-side footer sweep (table-wide audit path) agrees
    with the driver-side thread-pool variant and with a real scan,
    across a partitioned layout, multi-slice file lists, and the
    empty-directory edge."""
    from chchfr_data_collection_spark.operators.compaction import (
        footer_row_count_distributed,
    )

    target = str(tmp_path / "t")
    spark.range(5_000).select(
        F.col("id"), (F.col("id") % 7).alias("p")
    ).repartition(12).write.partitionBy("p").parquet(target)
    expect = footer_row_count(spark, target)
    assert expect == 5_000
    # files_per_task=2 forces a many-slice job — the 100 TB shape
    assert footer_row_count_distributed(spark, target, files_per_task=2) == expect
    assert footer_row_count_distributed(spark, target) == expect
    empty = str(tmp_path / "e")
    (tmp_path / "e").mkdir()
    assert footer_row_count_distributed(spark, empty) == 0
