"""Gas-station domain surface (SURVEY.md §2) expressed over the fixtures.

The reference's own tables don't exist in the fixture set, so each
operator is exercised on a fixture-derived equivalent: `supplier` plays
the station dimension, a literal VALUES table plays the fuel-type
lookup (F4), and the jitter (F3) uses a hash-style formula that any
engine reproduces bit-for-bit (cross-engine PRNGs can never match; the
seeded-F.rand variant lives in functions/prices.py and is bound-checked
in unit tests instead).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.prices import BASE_PRICES
from ..functions.strings import full_address, value_after_last_comma
from ..operators.ingest import ingest_batch, union_sources_with_priority
from ..operators.upsert import upsert_by_key
from . import register
from .common import T

# deterministic jitter in [-0.37, +0.23] — parenthesization matters for
# float determinism, keep the SQL and Column expressions structurally equal
_J = "((({k}) * 7919) % 61) / 100.0 - 0.37"


def _jitter(key_col):
    return ((key_col * F.lit(7919)) % F.lit(61)) / F.lit(100.0) - F.lit(0.37)


_FUEL_VALUES = ", ".join(
    f"('{ft}', {bp}, {i})" for i, (ft, bp) in enumerate(BASE_PRICES)
)


def _fuel_dim(spark):
    return spark.createDataFrame(
        [(ft, bp, i) for i, (ft, bp) in enumerate(BASE_PRICES)],
        "fuel_type string, base_price double, ft_idx int",
    )


@register(
    "stations_ingest_antijoin",
    sql="""
    SELECT s_suppkey AS location_id, s_name AS location_name FROM supplier
    WHERE NOT EXISTS (SELECT 1 FROM supplier e
                      WHERE e.s_suppkey % 3 = 0 AND e.s_suppkey = supplier.s_suppkey)
    """,
    tags=("domain", "anti", "ingest"),
)
def stations_ingest_antijoin(spark, sf_dir):
    """J1/K1/S6: append-if-absent as ONE set-based anti-join (the reference
    does this as an N+1 per-row COUNT(*) probe, dag_collection_data_from_bp.py:61-76)."""
    supp = T(spark, sf_dir, "supplier")
    incoming = supp.select(
        F.col("s_suppkey").alias("location_id"), F.col("s_name").alias("location_name")
    )
    existing = supp.filter(F.col("s_suppkey") % 3 == 0).select(
        F.col("s_suppkey").alias("location_id")
    )
    return ingest_batch(incoming, existing, keys=("location_id",))


@register(
    "stations_union_priority",
    sql="""
    SELECT location_id, location_name, source FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY location_id
                 ORDER BY source_priority, source) AS rn
      FROM (
        SELECT s_suppkey AS location_id, s_name AS location_name,
               'bp' AS source, 1 AS source_priority
        FROM supplier WHERE s_suppkey % 2 = 0
        UNION ALL
        SELECT s_suppkey, LOWER(s_name), 'mobil', 2 FROM supplier) u) t
    WHERE rn = 1
    """,
    tags=("domain", "setop", "dedup"),
)
def stations_union_priority(spark, sf_dir):
    """§2.7: the reference's first-writer-wins race across four collector
    DAGs, replaced by explicit source priority."""
    supp = T(spark, sf_dir, "supplier")
    a = supp.filter(F.col("s_suppkey") % 2 == 0).select(
        F.col("s_suppkey").alias("location_id"),
        F.col("s_name").alias("location_name"),
        F.lit("bp").alias("source"),
        F.lit(1).alias("source_priority"),
    )
    b = supp.select(
        F.col("s_suppkey").alias("location_id"),
        F.lower("s_name").alias("location_name"),
        F.lit("mobil").alias("source"),
        F.lit(2).alias("source_priority"),
    )
    return union_sources_with_priority([a, b], keys=("location_id",)).select(
        "location_id", "location_name", "source"
    )


@register(
    "fuel_price_crossjoin",
    sql=f"""
    SELECT s_suppkey AS location_id, ft.fuel_type,
      ROUND(ft.base_price + ({_J.format(k='s_suppkey * 4 + ft.ft_idx')}), 2) AS price,
      DATE '2026-01-01' AS price_date
    FROM supplier
    CROSS JOIN (VALUES {_FUEL_VALUES}) AS ft(fuel_type, base_price, ft_idx)
    """,
    tags=("domain", "cross", "prices"),
)
def fuel_price_crossjoin(spark, sf_dir):
    """J2+F3+F5: station × broadcast fuel-type dim with jittered price —
    the reference's nested Python loop + per-row upsert
    (dag_daily_fuel_price_generation.py:116-125) as one map-only stage."""
    stations = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("location_id")
    )
    priced = stations.crossJoin(F.broadcast(_fuel_dim(spark)))
    key = F.col("location_id") * 4 + F.col("ft_idx")
    return priced.select(
        "location_id",
        "fuel_type",
        F.round(F.col("base_price") + _jitter(key), 2).alias("price"),
        F.lit("2026-01-01").cast("date").alias("price_date"),
    )


@register(
    "fuel_price_upsert",
    sql=f"""
    WITH existing AS (
      SELECT s_suppkey AS location_id, ft.fuel_type,
        ROUND(ft.base_price + ({_J.format(k='s_suppkey * 4 + ft.ft_idx')}), 2) AS price
      FROM supplier CROSS JOIN (VALUES {_FUEL_VALUES}) AS ft(fuel_type, base_price, ft_idx)
    ), incoming AS (
      SELECT s_suppkey AS location_id, ft.fuel_type,
        ROUND(ft.base_price + ({_J.format(k='s_suppkey * 4 + ft.ft_idx + 1')}), 2) AS price
      FROM supplier CROSS JOIN (VALUES {_FUEL_VALUES}) AS ft(fuel_type, base_price, ft_idx)
      WHERE s_suppkey % 5 = 0
    )
    SELECT * FROM incoming
    UNION ALL
    SELECT * FROM existing e
    WHERE NOT EXISTS (SELECT 1 FROM incoming i
                      WHERE i.location_id = e.location_id AND i.fuel_type = e.fuel_type)
    """,
    tags=("domain", "upsert"),
)
def fuel_price_upsert(spark, sf_dir):
    """K2: `INSERT .. ON CONFLICT DO UPDATE` as a set-based MERGE —
    incoming batch wins on the (location_id, fuel_type) key."""
    stations = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("location_id")
    )
    fuel = F.broadcast(_fuel_dim(spark))

    def priced(df, shift):
        key = F.col("location_id") * 4 + F.col("ft_idx") + shift
        return df.crossJoin(fuel).select(
            "location_id",
            "fuel_type",
            F.round(F.col("base_price") + _jitter(key), 2).alias("price"),
        )

    existing = priced(stations, F.lit(0))
    incoming = priced(stations.filter(F.col("location_id") % 5 == 0), F.lit(1))
    return upsert_by_key(existing, incoming, keys=("location_id", "fuel_type"))


@register(
    "station_address_derivation",
    sql="""
    SELECT c_custkey,
      CASE WHEN postal <> ''
           THEN addr1 || ', ' || city || ', ' || state || ', ' || country || ' ' || postal
           ELSE addr1 || ', ' || city || ', ' || state || ', ' || country END AS full_addr,
      CASE WHEN vicinity LIKE '%,%'
           THEN TRIM(regexp_extract(vicinity, '([^,]*)$', 1)) ELSE '' END AS city_derived
    FROM (
      SELECT c_custkey, c_name AS addr1, n_name AS city,
        CASE WHEN c_custkey % 4 = 0 THEN '' ELSE c_mktsegment END AS state,
        r_name AS country,
        CASE WHEN c_custkey % 5 = 0 THEN '' ELSE CAST(c_custkey AS VARCHAR) END AS postal,
        CASE WHEN c_custkey % 7 = 0 THEN c_name ELSE c_name || ', ' || n_name END AS vicinity
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey) t
    """,
    tags=("domain", "scalar", "string"),
)
def station_address_derivation(spark, sf_dir):
    """F1+F2: full-address assembly (empty components KEPT, matching
    entities/gas_station_schema.py:17-21) and city-from-vicinity."""
    base = (
        T(spark, sf_dir, "customer")
        .join(
            F.broadcast(T(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(T(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "c_custkey",
            F.col("c_name").alias("addr1"),
            F.col("n_name").alias("city"),
            F.when(F.col("c_custkey") % 4 == 0, "").otherwise(F.col("c_mktsegment")).alias("state"),
            F.col("r_name").alias("country"),
            F.when(F.col("c_custkey") % 5 == 0, "")
            .otherwise(F.col("c_custkey").cast("string"))
            .alias("postal"),
            F.when(F.col("c_custkey") % 7 == 0, F.col("c_name"))
            .otherwise(F.concat("c_name", F.lit(", "), "n_name"))
            .alias("vicinity"),
        )
    )
    return base.select(
        "c_custkey",
        full_address("addr1", "city", "state", "country", "postal").alias("full_addr"),
        value_after_last_comma("vicinity").alias("city_derived"),
    )


@register(
    "pipeline_daily_prices",
    sql=f"""
    SELECT CAST(s_suppkey AS VARCHAR) AS location_id, ft.fuel_type,
      CAST(CAST(ROUND(ft.base_price + ({_J.format(k='s_suppkey * 4 + ft.ft_idx')}), 2)
           AS DECIMAL(5,2)) AS DOUBLE) AS price,
      DATE '2026-01-01' AS date
    FROM supplier
    CROSS JOIN (VALUES {_FUEL_VALUES}) AS ft(fuel_type, base_price, ft_idx)
    """,
    tags=("domain", "pipeline"),
)
def pipeline_daily_prices(spark, sf_dir):
    """Full price pipeline (S4→J2→F3→F5→K2-ready rows) with the
    deterministic jitter variant, so the oracle reproduces every price
    bit-for-bit. (The faithful seeded-uniform variant stays available via
    generate_daily_prices(jitter="random") and is bound-checked in unit
    tests — cross-engine PRNG streams can never match an oracle.)
    The DECIMAL(5,2) storage type is cast to DOUBLE at the catalog edge:
    both engines then stringify the identical IEEE value."""
    from ..pipelines import generate_daily_prices

    stations = T(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("string").alias("location_id")
    )
    import datetime as dt

    out = generate_daily_prices(
        spark, stations, date=dt.date(2026, 1, 1), jitter="deterministic"
    )
    return out.withColumn("price", F.col("price").cast("double"))


@register(
    "ingest_with_quarantine",
    sql="""
    WITH incoming AS (
      SELECT s_suppkey AS location_id, s_name AS location_name, s_acctbal
      FROM supplier),
    flagged AS (
      SELECT *, (s_acctbal >= 0 AND location_name IS NOT NULL) AS is_valid
      FROM incoming),
    existing AS (SELECT s_suppkey AS location_id FROM supplier WHERE s_suppkey % 3 = 0)
    SELECT location_id, location_name,
           CASE WHEN NOT is_valid THEN 'quarantined'
                WHEN location_id IN (SELECT location_id FROM existing)
                  THEN 'duplicate'
                ELSE 'ingested' END AS disposition
    FROM flagged
    """,
    tags=("domain", "ingest", "validate", "quarantine"),
)
def ingest_with_quarantine(spark, sf_dir):
    """Ingest with quarantine — the composed write-path gate: validation
    failures are ROUTED, not dropped (the reference swallows bad Places
    rows silently, dag_collection_data_from_z.py:43-53; a 100 TB
    pipeline needs the reject rows for reprocessing). One pass tags
    every incoming row ingested / duplicate / quarantined: the validity
    predicate evaluates in the scan stage, the duplicate check is the
    same broadcast anti-join shape as stations_ingest_antijoin, and the
    three-way disposition is a CASE — no row is read twice, no row is
    lost (row count in == row count out, pinned in the oracle)."""
    supp = T(spark, sf_dir, "supplier")
    incoming = supp.select(
        F.col("s_suppkey").alias("location_id"),
        F.col("s_name").alias("location_name"),
        "s_acctbal",
    )
    existing = (
        supp.filter(F.col("s_suppkey") % 3 == 0)
        .select(F.col("s_suppkey").alias("location_id"))
    )
    is_valid = (F.col("s_acctbal") >= 0) & F.col("location_name").isNotNull()
    marked = incoming.join(
        F.broadcast(existing.withColumn("__exists", F.lit(True))),
        "location_id",
        "left",
    )
    disposition = (
        F.when(~is_valid, "quarantined")
        .when(F.col("__exists").isNotNull(), "duplicate")
        .otherwise("ingested")
    )
    return marked.select(
        "location_id", "location_name", disposition.alias("disposition")
    )
