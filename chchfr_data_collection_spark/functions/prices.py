"""Fuel-price generation functions.

The reference generates a daily price per (station, fuel_type) as a
uniform jitter around a per-fuel base price
(dag_daily_fuel_price_generation.py:69-80). Two variants here:

- `with_random_price`: faithful `uniform(base-0.37, base+0.23)` via a
  seeded `F.rand` (seeded for test determinism — Python's `random.uniform`
  is unseeded in the reference).
- `with_deterministic_price`: a hash-style jitter computed from the key,
  bit-reproducible across engines — used by the DuckDB-oracle correctness
  queries where cross-engine PRNGs can never match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# fuel type -> base price, verbatim from fetch_gaspy_prices()
# (dag_daily_fuel_price_generation.py:74-79).
BASE_PRICES = [
    ("Unleaded 91", 2.79),
    ("Unleaded 95", 2.98),
    ("Unleaded 98", 3.11),
    ("Diesel", 2.10),
]

JITTER_LOW = -0.37
JITTER_HIGH = 0.23
JITTER_SPAN = JITTER_HIGH - JITTER_LOW  # 0.60


def base_prices_df(spark: SparkSession) -> DataFrame:
    """4-row fuel-type dimension; always broadcast in joins."""
    return spark.createDataFrame(BASE_PRICES, "fuel_type string, base_price double")


def random_price(base: Column, seed: int = 42) -> Column:
    """`round(uniform(base-0.37, base+0.23), 2)` — seeded F.rand.

    Note: Spark `round` is half-up while Python's builtin is banker's
    rounding; we standardize on half-up (the SQL semantic).
    """
    return F.round(base + JITTER_LOW + F.rand(seed) * JITTER_SPAN, 2)


def deterministic_jitter(key: Column) -> Column:
    """Jitter in [-0.37, +0.23] derived from an integer key.

    `((key * 7919) % 61) / 100 - 0.37` — 61 distinct cents spanning the
    reference's uniform range, reproducible in any engine (used by the
    oracle-checked price queries).
    """
    return (key * F.lit(7919)) % F.lit(61) / F.lit(100.0) + F.lit(JITTER_LOW)


def with_random_price(df: DataFrame, base: str = "base_price", seed: int = 42) -> DataFrame:
    return df.withColumn("price", random_price(F.col(base), seed))


def with_deterministic_price(df: DataFrame, key: str, base: str = "base_price") -> DataFrame:
    return df.withColumn(
        "price", F.round(F.col(base) + deterministic_jitter(F.col(key)), 2)
    )
