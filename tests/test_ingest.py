"""Unit tests for the set-based ingest operators (SURVEY.md §2 J1/K1).

Covers the §5.2 plan: anti-join with empty existing / full overlap /
within-batch dupes, explicit source precedence, and ingest idempotence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.ingest import (
    dedup_within_batch,
    ingest_batch,
    new_rows_only,
    union_sources_with_priority,
)


def _stations(spark, rows):
    return spark.createDataFrame(rows, "location_id string, brand_name string")


def test_dedup_within_batch_arbitrary(spark):
    df = _stations(spark, [("a", "BP"), ("a", "BP2"), ("b", "Z")])
    out = dedup_within_batch(df, keys=("location_id",))
    assert out.count() == 2
    assert {r.location_id for r in out.collect()} == {"a", "b"}


def test_dedup_within_batch_ordered_deterministic(spark):
    df = _stations(spark, [("a", "zzz"), ("a", "aaa"), ("b", "mmm")])
    out = dedup_within_batch(df, keys=("location_id",), order=("brand_name",))
    got = {r.location_id: r.brand_name for r in out.collect()}
    assert got == {"a": "aaa", "b": "mmm"}


def test_new_rows_only_empty_existing(spark):
    incoming = _stations(spark, [("a", "BP"), ("b", "Z")])
    existing = _stations(spark, []).filter(F.lit(False))
    assert new_rows_only(incoming, existing).count() == 2


def test_new_rows_only_full_overlap(spark):
    incoming = _stations(spark, [("a", "BP"), ("b", "Z")])
    existing = _stations(spark, [("a", "BP"), ("b", "Z"), ("c", "M")])
    assert new_rows_only(incoming, existing).count() == 0


def test_new_rows_only_partial(spark):
    incoming = _stations(spark, [("a", "BP"), ("b", "Z"), ("d", "PN")])
    existing = _stations(spark, [("a", "BP"), ("c", "M")])
    got = {r.location_id for r in new_rows_only(incoming, existing).collect()}
    assert got == {"b", "d"}


def test_union_sources_priority_wins(spark):
    bp = spark.createDataFrame(
        [("x", "BP", "bp", 1)],
        "location_id string, brand_name string, source string, source_priority int",
    )
    places = spark.createDataFrame(
        [("x", "Z Energy", "z_energy", 3), ("y", "Z Energy", "z_energy", 3)],
        "location_id string, brand_name string, source string, source_priority int",
    )
    out = union_sources_with_priority([places, bp])
    got = {r.location_id: r.brand_name for r in out.collect()}
    # lowest priority (bp=1) wins for the contested key
    assert got == {"x": "BP", "y": "Z Energy"}


def test_ingest_batch_idempotent(spark):
    """SURVEY.md §5.2(3): running ingest twice appends nothing the second time."""
    incoming = _stations(spark, [("a", "BP"), ("a", "BP"), ("b", "Z")])
    existing = _stations(spark, [("c", "M")])
    first = ingest_batch(incoming, existing)
    assert first.count() == 2
    after_first = existing.unionByName(first)
    second = ingest_batch(incoming, after_first)
    assert second.count() == 0


def test_fk_violations_finds_orphans(spark):
    from chchfr_data_collection_spark.operators.validate import fk_violations

    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, "zz")], "id int, k string")
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    got = {r.id for r in fk_violations(fact, dim, ["k"]).collect()}
    assert got == {3}


def test_unique_key_violations(spark):
    from chchfr_data_collection_spark.operators.validate import unique_key_violations

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (2, 1)], "a int, b int"
    )
    rows = unique_key_violations(df, ["a", "b"]).collect()
    assert len(rows) == 1 and (rows[0].a, rows[0].b, rows[0].n_rows) == (1, 1, 2)
