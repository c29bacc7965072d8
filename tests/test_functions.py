"""Scalar-function tests (SURVEY.md §2.4 F1–F4, §5.2 edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.functions.prices import (
    BASE_PRICES,
    JITTER_HIGH,
    JITTER_LOW,
    base_prices_df,
    with_deterministic_price,
    with_random_price,
)
from chchfr_data_collection_spark.functions.strings import (
    full_address,
    value_after_last_comma,
)


def _col1(df):
    return [r[0] for r in df.collect()]


def test_value_after_last_comma_edge_cases(spark):
    cases = [
        ("12 Main St, Riccarton, Christchurch", "Christchurch"),
        ("no comma here", ""),            # no comma -> ''
        ("trailing,", ""),                # comma at end -> '' (after trim)
        ("a,b ,  c  ", "c"),              # whitespace trimmed
        ("", ""),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "vicinity string")
    out = _col1(df.select(value_after_last_comma("vicinity")))
    assert out == [want for _, want in cases]


def test_full_address_postal_branch(spark):
    df = spark.createDataFrame(
        [
            ("1 High St", "Chch", "Canterbury", "NZ", "8011"),
            ("1 High St", "", "", "NZ", ""),  # empty components KEPT
            ("1 High St", "Chch", "Canterbury", "NZ", None),
        ],
        "address_line1 string, city string, state_province string, "
        "country string, postal_code string",
    )
    out = _col1(df.select(full_address()))
    assert out == [
        "1 High St, Chch, Canterbury, NZ 8011",
        "1 High St, , , NZ",
        "1 High St, Chch, Canterbury, NZ",
    ]


def test_random_price_bounds_and_determinism(spark):
    base = base_prices_df(spark)
    stations = spark.range(200).select(F.col("id").alias("location_id"))
    priced = with_random_price(stations.crossJoin(F.broadcast(base)), seed=7)
    rows = priced.collect()
    assert len(rows) == 200 * len(BASE_PRICES)
    for r in rows:
        lo = round(r.base_price + JITTER_LOW, 2)
        hi = round(r.base_price + JITTER_HIGH, 2)
        assert lo <= r.price <= hi, r
        # two decimal places
        assert r.price == round(r.price, 2)
    again = with_random_price(stations.crossJoin(F.broadcast(base)), seed=7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_deterministic_price_engine_independent(spark):
    base = base_prices_df(spark)
    stations = spark.range(50).select(F.col("id").alias("location_id"))
    out = with_deterministic_price(
        stations.crossJoin(F.broadcast(base)), key="location_id"
    )
    rows = out.collect()
    for r in rows:
        expected_jitter = (r.location_id * 7919) % 61 / 100.0 + JITTER_LOW
        assert r.price == round(r.base_price + expected_jitter, 2)
