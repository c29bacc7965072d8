"""SCD2 emulation tests: versioning, closing, idempotence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.scd2 import scd2_apply

DIM_SCHEMA = (
    "location_id string, brand_name string, city string, "
    "valid_from timestamp, valid_to timestamp"
)
BATCH_SCHEMA = "location_id string, brand_name string, city string"

T0 = dt.datetime(2026, 1, 1)
T1 = dt.datetime(2026, 2, 1)


def _dim(spark):
    return spark.createDataFrame(
        [
            ("a", "BP", "Chch", T0, None),       # current
            ("b", "Z", "Akl", T0, None),         # current
            ("b", "Z-old", "Akl", dt.datetime(2025, 1, 1), T0),  # history
        ],
        DIM_SCHEMA,
    )


def test_scd2_change_closes_and_versions(spark):
    batch = spark.createDataFrame(
        [("a", "BP Connect", "Chch"), ("c", "Mobil", "Wgtn")], BATCH_SCHEMA
    )
    out = scd2_apply(
        _dim(spark), batch, keys=["location_id"],
        attrs=["brand_name", "city"], batch_ts=F.lit(T1),
    ).collect()
    rows = {(r.location_id, r.brand_name, r.valid_to) for r in out}
    # a's old version closed at T1; new 'BP Connect' version open
    assert ("a", "BP", T1) in rows
    assert ("a", "BP Connect", None) in rows
    # b untouched (not in batch): still open; its history intact
    assert ("b", "Z", None) in rows
    assert ("b", "Z-old", T0) in rows
    # c: brand-new key, one open version
    assert ("c", "Mobil", None) in rows
    assert len(out) == 5


def test_scd2_identical_batch_is_noop(spark):
    """Re-delivering current attributes must not create versions."""
    batch = spark.createDataFrame(
        [("a", "BP", "Chch"), ("b", "Z", "Akl")], BATCH_SCHEMA
    )
    dim = _dim(spark)
    out = scd2_apply(
        dim, batch, keys=["location_id"],
        attrs=["brand_name", "city"], batch_ts=F.lit(T1),
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_reapply_idempotent(spark):
    """Applying the same change batch twice converges (second apply sees
    identical attributes and does nothing)."""
    batch = spark.createDataFrame([("a", "BP Connect", "Chch")], BATCH_SCHEMA)
    once = scd2_apply(
        _dim(spark), batch, keys=["location_id"],
        attrs=["brand_name", "city"], batch_ts=F.lit(T1),
    )
    twice = scd2_apply(
        once, batch, keys=["location_id"],
        attrs=["brand_name", "city"], batch_ts=F.lit(T1),
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_null_attribute_in_batch(spark):
    """A batch row with a NULL attribute still matches its key (the
    presence marker, not attribute nullness, drives the match) and
    counts as a change vs a non-null current value."""
    batch = spark.createDataFrame([("a", None, "Chch")], BATCH_SCHEMA)
    out = scd2_apply(
        _dim(spark), batch, keys=["location_id"],
        attrs=["brand_name", "city"], batch_ts=F.lit(T1),
    ).collect()
    rows = {(r.location_id, r.brand_name, r.valid_to) for r in out}
    assert ("a", "BP", T1) in rows        # old version closed
    assert ("a", None, None) in rows      # new version with NULL brand
