"""Declarative source specs for the four station dialects.

The reference hand-writes one DAG per source with an inline field-mapping
loop (P1: dag_collection_data_from_bp.py:46-57, P2:
dag_collection_data_from_mobil.py:53-64, P3:
dag_collection_data_from_z.py:71-82 / dag_collection_data_from_paknsave.py:71-82).
Here each dialect is data: a raw schema, an optional envelope field to
explode, a projection onto the canonical gas_station schema, and an
error policy (strict sources fail the batch like BP/Mobil's KeyError ⇒
Airflow retry; lenient sources default missing fields like the Google
`.get()` chains).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.strings import value_after_last_comma
from ..schemas import BP_RAW_SCHEMA, MOBIL_RAW_SCHEMA, PLACES_RAW_SCHEMA


@dataclass(frozen=True)
class SourceSpec:
    name: str
    raw_schema: T.StructType
    projection: dict  # canonical column -> builder of a Column
    envelope: str | None = None  # array field to explode, if enveloped
    strict: bool = True  # strict: corrupt record fails the batch
    priority: int = 100  # lower wins in cross-source dedup
    extra: dict = field(default_factory=dict)

    def columns(self) -> list[Column]:
        return [build().alias(name) for name, build in self.projection.items()]


BP_SPEC = SourceSpec(
    name="bp",
    raw_schema=BP_RAW_SCHEMA,
    strict=True,
    priority=1,
    projection={
        "location_id": lambda: F.col("id").cast("string"),
        "brand_name": lambda: F.col("site_brand"),
        "location_name": lambda: F.col("name"),
        "latitude": lambda: F.col("lat").cast("double"),
        "longitude": lambda: F.col("lng").cast("double"),
        "address_line1": lambda: F.col("address"),
        "city": lambda: F.col("city"),
        "state_province": lambda: F.col("state"),
        "postal_code": lambda: F.col("postcode").cast("string"),
        "country": lambda: F.col("country_code"),
    },
)

MOBIL_SPEC = SourceSpec(
    name="mobil",
    raw_schema=MOBIL_RAW_SCHEMA,
    envelope="Locations",
    strict=True,
    priority=2,
    projection={
        "location_id": lambda: F.col("LocationID").cast("string"),
        "brand_name": lambda: F.col("BrandName"),
        "location_name": lambda: F.col("LocationName"),
        "latitude": lambda: F.col("Latitude").cast("double"),
        "longitude": lambda: F.col("Longitude").cast("double"),
        "address_line1": lambda: F.col("AddressLine1"),
        "city": lambda: F.col("City"),
        "state_province": lambda: F.col("StateProvince"),
        "postal_code": lambda: F.col("PostalCode").cast("string"),
        "country": lambda: F.col("Country"),
    },
)


def _places_spec(name: str, priority: int) -> SourceSpec:
    # Google Places dialect: `name` feeds both brand and location name;
    # city derives from `vicinity` via value-after-last-comma (F1);
    # state/postal are hardcoded '' and country 'NZ'
    # (dag_collection_data_from_z.py:71-82).
    return SourceSpec(
        name=name,
        raw_schema=PLACES_RAW_SCHEMA,
        envelope="results",
        strict=False,
        priority=priority,
        projection={
            "location_id": lambda: F.col("place_id"),
            "brand_name": lambda: F.coalesce(F.col("name"), F.lit("")),
            "location_name": lambda: F.coalesce(F.col("name"), F.lit("")),
            "latitude": lambda: F.col("geometry.location.lat"),
            "longitude": lambda: F.col("geometry.location.lng"),
            "address_line1": lambda: F.coalesce(F.col("vicinity"), F.lit("")),
            "city": lambda: value_after_last_comma(F.coalesce(F.col("vicinity"), F.lit(""))),
            "state_province": lambda: F.lit(""),
            "postal_code": lambda: F.lit(""),
            "country": lambda: F.lit("NZ"),
        },
    )


Z_ENERGY_SPEC = _places_spec("z_energy", priority=3)
PAKNSAVE_SPEC = _places_spec("paknsave", priority=4)

ALL_SPECS = [BP_SPEC, MOBIL_SPEC, Z_ENERGY_SPEC, PAKNSAVE_SPEC]
