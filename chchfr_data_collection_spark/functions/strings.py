"""String functions from the reference, as native Catalyst expressions.

Each is the moral equivalent of a scalar UDF in the reference, but
implemented as a Column expression so it stays inside whole-stage
codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def value_after_last_comma(col: Column | str) -> Column:
    """Substring after the last comma, trimmed; '' when no comma.

    Semantics of `get_value_after_last_comma` in the reference
    (dag_collection_data_from_z.py:55-58) — used to derive a city from
    the Google Places `vicinity` field.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(
            c.contains(","),
            F.trim(F.element_at(F.split(c, ",", -1), -1)),
        )
        .otherwise(F.lit(""))
    )


def full_address(
    address_line1: Column | str = "address_line1",
    city: Column | str = "city",
    state_province: Column | str = "state_province",
    country: Column | str = "country",
    postal_code: Column | str = "postal_code",
) -> Column:
    """`"{addr1}, {city}, {state}, {country}"` + `" {postal}"` iff postal truthy.

    Matches `GasStation.get_full_address` (entities/gas_station_schema.py:17-21)
    exactly: empty components are KEPT (`"a, , , NZ"`), so this is a plain
    concat, not a null-skipping concat_ws.
    """
    cols = [
        F.col(c) if isinstance(c, str) else c
        for c in (address_line1, city, state_province, country, postal_code)
    ]
    a1, ci, st, co, po = cols
    base = F.concat(a1, F.lit(", "), ci, F.lit(", "), st, F.lit(", "), co)
    return F.when(
        po.isNotNull() & (F.length(po) > 0), F.concat(base, F.lit(" "), po)
    ).otherwise(base)
