"""Source-dialect tests: golden payloads per dialect (SURVEY.md §5.2(2)),
strict vs lenient schema modes (§1.3), end-to-end collect pipeline."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from chchfr_data_collection_spark.pipelines import collect_stations, generate_daily_prices
from chchfr_data_collection_spark.sources.json_source import read_conformed
from chchfr_data_collection_spark.sources.specs import (
    BP_SPEC,
    MOBIL_SPEC,
    PAKNSAVE_SPEC,
    Z_ENERGY_SPEC,
)

BP_PAYLOAD = json.dumps(
    [
        {
            "id": "bp-001",
            "site_brand": "BP",
            "name": "BP Riccarton",
            "lat": -43.53,
            "lng": 172.59,
            "address": "12 Main St",
            "city": "Christchurch",
            "state": "Canterbury",
            "postcode": "8011",
            "country_code": "NZ",
        }
    ]
)

MOBIL_PAYLOAD = json.dumps(
    {
        "Locations": [
            {
                "LocationID": "mob-001",
                "BrandName": "Mobil",
                "LocationName": "Mobil Papanui",
                "Latitude": -43.49,
                "Longitude": 172.61,
                "AddressLine1": "1 Papanui Rd",
                "City": "Christchurch",
                "StateProvince": "Canterbury",
                "PostalCode": "8052",
                "Country": "NZ",
            }
        ]
    }
)

PLACES_PAYLOAD = json.dumps(
    {
        "results": [
            {
                "place_id": "z-001",
                "name": "Z Moorhouse",
                "geometry": {"location": {"lat": -43.54, "lng": 172.64}},
                "vicinity": "111 Moorhouse Ave, Christchurch",
            },
            # lenient dialect: missing fields default, null key dropped
            {"name": "nameless", "geometry": {"location": {}}},
        ]
    }
)

CANONICAL = [
    "location_id",
    "brand_name",
    "location_name",
    "latitude",
    "longitude",
    "address_line1",
    "city",
    "state_province",
    "postal_code",
    "country",
]


def test_bp_dialect_mapping(spark):
    out = read_conformed(spark, BP_SPEC, payloads=[BP_PAYLOAD])
    row = out.collect()[0]
    assert out.columns == CANONICAL + ["source", "source_priority"]
    assert row.location_id == "bp-001"
    assert row.brand_name == "BP"
    assert row.latitude == -43.53
    assert row.postal_code == "8011"
    assert row.source == "bp"


def test_mobil_envelope_explode(spark):
    out = read_conformed(spark, MOBIL_SPEC, payloads=[MOBIL_PAYLOAD])
    row = out.collect()[0]
    assert row.location_id == "mob-001"
    assert row.state_province == "Canterbury"


def test_places_dialect_lenient_defaults(spark):
    out = read_conformed(spark, Z_ENERGY_SPEC, payloads=[PLACES_PAYLOAD])
    rows = out.collect()
    # missing place_id row is dropped (no key)
    assert len(rows) == 1
    r = rows[0]
    # name feeds both brand and location; city derived from vicinity (F1)
    assert r.brand_name == "Z Moorhouse" and r.location_name == "Z Moorhouse"
    assert r.city == "Christchurch"
    assert r.state_province == "" and r.postal_code == "" and r.country == "NZ"


def test_strict_source_fails_on_corrupt(spark):
    with pytest.raises(Exception):
        read_conformed(spark, BP_SPEC, payloads=["{not json"]).collect()


def test_lenient_source_survives_corrupt(spark):
    out = read_conformed(spark, PAKNSAVE_SPEC, payloads=["{not json"])
    assert out.count() == 0  # explicit empty frame, not a crash


def test_collect_stations_end_to_end(spark):
    existing = spark.createDataFrame(
        [("mob-001",) + ("x",) * 9], ", ".join(f"{c} string" for c in CANONICAL)
    ).select(
        "location_id",
        "brand_name",
        "location_name",
        F.col("latitude").cast("double"),
        F.col("longitude").cast("double"),
        "address_line1",
        "city",
        "state_province",
        "postal_code",
        "country",
    )
    new = collect_stations(
        spark,
        {
            "bp": [BP_PAYLOAD],
            "mobil": [MOBIL_PAYLOAD],
            "z_energy": [PLACES_PAYLOAD],
        },
        existing,
    )
    got = {r.location_id for r in new.collect()}
    # mob-001 already exists -> anti-joined away
    assert got == {"bp-001", "z-001"}


def test_generate_daily_prices_cardinality(spark):
    stations = spark.createDataFrame([("a",), ("b",), ("c",)], "location_id string")
    import datetime as dt

    out = generate_daily_prices(spark, stations, date=dt.date(2026, 8, 13))
    rows = out.collect()
    assert len(rows) == 3 * 4  # |stations| × 4 fuel types (J2 cardinality)
    assert {str(r.date) for r in rows} == {"2026-08-13"}
    assert out.schema["price"].dataType.simpleString() == "decimal(5,2)"


def test_landing_zone_path_read(spark, tmp_path):
    """At-scale ingest path: payloads land as JSON files; spark.read.json
    with an explicit schema reads them distributed (no inference pass)."""

    zone = tmp_path / "landing" / "bp"
    zone.mkdir(parents=True)
    (zone / "batch1.json").write_text(BP_PAYLOAD)
    rec2 = json.loads(BP_PAYLOAD)
    rec2[0]["id"] = "bp-002"
    (zone / "batch2.json").write_text(json.dumps(rec2))
    out = read_conformed(spark, BP_SPEC, path=str(zone / "*.json"))
    got = {r.location_id for r in out.collect()}
    assert got == {"bp-001", "bp-002"}


def test_landing_zone_mobil_envelope_path(spark, tmp_path):
    zone = tmp_path / "landing" / "mobil"
    zone.mkdir(parents=True)
    (zone / "batch1.json").write_text(MOBIL_PAYLOAD)
    out = read_conformed(spark, MOBIL_SPEC, path=str(zone / "*.json"))
    assert [r.location_id for r in out.collect()] == ["mob-001"]


def test_landing_datasource_matches_inline_path(spark, tmp_path):
    """The custom Python DataSource (one partition per landed file) must
    produce exactly what the inline-payload path produces, and carry the
    file provenance column."""
    from chchfr_data_collection_spark.sources.datasource import (
        read_landing_conformed,
    )

    land = tmp_path / "bp_landing"
    land.mkdir()
    (land / "batch1.json").write_text(BP_PAYLOAD)
    (land / "batch2.json").write_text(BP_PAYLOAD.replace("bp-001", "bp-002"))
    (land / "notes.txt").write_text("ignored: wrong suffix")

    got = read_landing_conformed(spark, BP_SPEC, str(land))
    rows = {r["location_id"]: r for r in got.collect()}
    assert set(rows) == {"bp-001", "bp-002"}
    assert rows["bp-001"]["src_file"] == "batch1.json"
    assert rows["bp-002"]["src_file"] == "batch2.json"

    inline = read_conformed(spark, BP_SPEC, payloads=[BP_PAYLOAD]).collect()[0]
    ds_row = rows["bp-001"]
    for c in inline.asDict():
        assert ds_row[c] == inline[c], c


def test_landing_datasource_empty_zone(spark, tmp_path):
    """An empty landing zone is a valid no-fetch day: empty frame with
    the full schema, not an error."""
    from chchfr_data_collection_spark.sources.datasource import (
        read_landing_conformed,
    )

    land = tmp_path / "empty_landing"
    land.mkdir()
    got = read_landing_conformed(spark, BP_SPEC, str(land))
    assert got.count() == 0
    assert "location_id" in got.columns


def test_csv_permissive_quarantine_counts(spark, sf_small):
    """The PERMISSIVE read must quarantine exactly the deliberately
    broken rows (event_id % 97 == 0) and keep every other row clean."""
    from chchfr_data_collection_spark.queries import catalog

    import pyarrow.parquet as pq

    r = catalog()["csv_ingest_permissive"].fn(spark, sf_small).collect()[0]
    ids = [
        i
        for i in pq.read_table(f"{sf_small}/events.parquet", columns=["event_id"])
        .column("event_id")
        .to_pylist()
        if i < 1000
    ]
    n_corrupt = sum(1 for i in ids if i % 97 == 0)
    assert r["n_rows"] == len(ids)
    assert r["n_corrupt"] == n_corrupt > 0
    assert r["n_clean"] == len(ids) - n_corrupt
