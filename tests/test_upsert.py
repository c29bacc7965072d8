"""Upsert / MERGE emulation tests (SURVEY.md §2 K2) incl. idempotence."""

from __future__ import annotations

import datetime as dt

from chchfr_data_collection_spark.operators.upsert import (
    overwrite_date_partition,
    upsert_by_key,
    upsert_last_wins,
)

SCHEMA = "location_id string, fuel_type string, price double"


def test_upsert_by_key_incoming_wins(spark):
    existing = spark.createDataFrame(
        [("a", "Diesel", 2.10), ("b", "Diesel", 2.15)], SCHEMA
    )
    incoming = spark.createDataFrame(
        [("a", "Diesel", 2.50), ("c", "Diesel", 2.05)], SCHEMA
    )
    out = upsert_by_key(existing, incoming, keys=["location_id", "fuel_type"])
    got = {(r.location_id, r.fuel_type): r.price for r in out.collect()}
    assert got == {("a", "Diesel"): 2.50, ("b", "Diesel"): 2.15, ("c", "Diesel"): 2.05}


def test_upsert_by_key_idempotent(spark):
    existing = spark.createDataFrame([("a", "Diesel", 2.10)], SCHEMA)
    incoming = spark.createDataFrame([("a", "Diesel", 2.50)], SCHEMA)
    once = upsert_by_key(existing, incoming, keys=["location_id", "fuel_type"])
    twice = upsert_by_key(once, incoming, keys=["location_id", "fuel_type"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_last_wins_versioned(spark):
    schema = SCHEMA + ", v int"
    existing = spark.createDataFrame([("a", "Diesel", 2.10, 1)], schema)
    incoming = spark.createDataFrame(
        [("a", "Diesel", 2.50, 2), ("a", "Diesel", 2.60, 3)], schema
    )
    out = upsert_last_wins(existing, incoming, ["location_id", "fuel_type"], "v")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].price == 2.60 and rows[0].v == 3


def test_overwrite_date_partition_idempotent(spark, tmp_path):
    """Re-running the same date rewrites the same partition, no dup rows;
    other dates are untouched (dynamic partitionOverwriteMode)."""
    path = str(tmp_path / "fuel_price")
    d1, d2 = dt.date(2026, 8, 1), dt.date(2026, 8, 2)
    day1 = spark.createDataFrame(
        [("a", "Diesel", 2.10, d1)], SCHEMA + ", date date"
    )
    day2 = spark.createDataFrame(
        [("a", "Diesel", 2.20, d2)], SCHEMA + ", date date"
    )
    overwrite_date_partition(day1, path)
    overwrite_date_partition(day2, path)
    # retry day2 with a corrected price: replaces only the d2 partition
    day2_retry = spark.createDataFrame(
        [("a", "Diesel", 2.25, d2)], SCHEMA + ", date date"
    )
    overwrite_date_partition(day2_retry, path)
    got = {
        (str(r.date)): r.price for r in spark.read.parquet(path).collect()
    }
    assert got == {"2026-08-01": 2.10, "2026-08-02": 2.25}
