"""Canonical schemas for the gas-station domain.

The reference declares the `gas_station` table twice (SQL DDL at
reference dags/dag_create_gas_station_table.py:23-36 and a Python entity
class at dags/entities/gas_station_schema.py:2-12). Here there is ONE
canonical StructType; the four source dialects conform to it via
projection specs (see sources/specs.py).
"""

from __future__ import annotations

from pyspark.sql import types as T

# 10 columns, mirroring the reference DDL
# (dag_create_gas_station_table.py:23-36). VARCHAR length limits have no
# Spark equivalent and are dropped; PK on location_id is enforced by the
# ingest anti-join (operators/ingest.py), not by the storage layer.
GAS_STATION_SCHEMA = T.StructType(
    [
        T.StructField("location_id", T.StringType(), False),
        T.StructField("brand_name", T.StringType(), True),
        T.StructField("location_name", T.StringType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("address_line1", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state_province", T.StringType(), True),
        T.StructField("postal_code", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# fuel_price fact (dag_daily_fuel_price_generation.py:83-92). The SERIAL
# surrogate key has no distributed equivalent and is dropped — the real
# key is the composite (location_id, fuel_type, date), which is also the
# reference's UNIQUE constraint (:90).
FUEL_PRICE_SCHEMA = T.StructType(
    [
        T.StructField("location_id", T.StringType(), False),
        T.StructField("fuel_type", T.StringType(), False),
        T.StructField("price", T.DecimalType(5, 2), True),
        T.StructField("date", T.DateType(), False),
    ]
)

# Raw JSON schemas per source dialect — incoming schemas are implicit in
# the reference (field access by key); here they are explicit so corrupt
# records are detected at the scan, not deep inside a transform.

# BP locator payload: flat array of station objects
# (dag_collection_data_from_bp.py:45-57).
BP_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("site_brand", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lng", T.DoubleType(), True),
        T.StructField("address", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("postcode", T.StringType(), True),
        T.StructField("country_code", T.StringType(), True),
    ]
)

# Mobil retail-locator payload: envelope object {"Locations": [...]}
# with PascalCase fields (dag_collection_data_from_mobil.py:45-64).
MOBIL_LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("LocationID", T.StringType(), False),
        T.StructField("BrandName", T.StringType(), True),
        T.StructField("LocationName", T.StringType(), True),
        T.StructField("Latitude", T.DoubleType(), True),
        T.StructField("Longitude", T.DoubleType(), True),
        T.StructField("AddressLine1", T.StringType(), True),
        T.StructField("City", T.StringType(), True),
        T.StructField("StateProvince", T.StringType(), True),
        T.StructField("PostalCode", T.StringType(), True),
        T.StructField("Country", T.StringType(), True),
    ]
)

MOBIL_RAW_SCHEMA = T.StructType(
    [T.StructField("Locations", T.ArrayType(MOBIL_LOCATION_SCHEMA), True)]
)

# Google Places nearbysearch payload (Z Energy and Pak'nSave both use it):
# envelope {"results": [...]} with nested geometry.location
# (dag_collection_data_from_z.py:67-82).
PLACES_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("place_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField(
            "geometry",
            T.StructType(
                [
                    T.StructField(
                        "location",
                        T.StructType(
                            [
                                T.StructField("lat", T.DoubleType(), True),
                                T.StructField("lng", T.DoubleType(), True),
                            ]
                        ),
                        True,
                    )
                ]
            ),
            True,
        ),
        T.StructField("vicinity", T.StringType(), True),
    ]
)

PLACES_RAW_SCHEMA = T.StructType(
    [T.StructField("results", T.ArrayType(PLACES_RESULT_SCHEMA), True)]
)
