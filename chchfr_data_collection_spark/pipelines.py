"""End-to-end pipelines mirroring the reference's two DAG entry points.

- `collect_stations`: the four collector DAGs (SURVEY.md §3.1) as one
  driver program: read payloads -> conform -> explicit-priority
  cross-source dedup -> anti-join against the dimension -> rows to append.
- `generate_daily_prices`: the price DAG (SURVEY.md §3.2):
  station scan × broadcast fuel-type dim -> jittered price -> date-keyed
  rows ready for an idempotent partition overwrite (operators/upsert.py).

The Airflow task DAG collapses into ordinary lazy DataFrame composition:
Catalyst sees the whole plan and optimizes across what used to be task
boundaries.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.prices import base_prices_df, with_random_price
from .operators.ingest import dedup_within_batch, new_rows_only, union_sources_with_priority
from .sources.json_source import read_conformed
from .sources.specs import ALL_SPECS, SourceSpec


def collect_stations(
    spark: SparkSession,
    payloads_by_source: Mapping[str, Sequence[str] | str],
    existing: DataFrame,
    specs: Sequence[SourceSpec] = tuple(ALL_SPECS),
) -> DataFrame:
    """Conform every source batch and return only genuinely-new stations.

    `payloads_by_source[name]` is either a list of JSON strings (tests)
    or a landing-zone path glob (scale).
    """
    conformed = []
    for spec in specs:
        if spec.name not in payloads_by_source:
            continue
        src = payloads_by_source[spec.name]
        if isinstance(src, str):
            conformed.append(read_conformed(spark, spec, path=src))
        else:
            conformed.append(read_conformed(spark, spec, payloads=src))
    merged = union_sources_with_priority(conformed)
    merged = dedup_within_batch(merged, keys=("location_id",))
    return new_rows_only(merged, existing).drop("source", "source_priority")


def generate_daily_prices(
    spark: SparkSession,
    stations: DataFrame,
    date: dt.date | None = None,
    seed: int = 42,
    jitter: str = "random",
) -> DataFrame:
    """stations × 4 fuel types -> jittered price -> date column.

    The reference's nested Python loop with a per-row upsert
    (dag_daily_fuel_price_generation.py:116-125) becomes one
    BroadcastNestedLoopJoin against a 4-row dimension and a single bulk
    write. At 100 TB of stations this is a map-only stage: no shuffle at
    all, since the broadcast side is constant.

    jitter="random" is the faithful seeded-uniform variant;
    jitter="deterministic" derives the jitter from (location_id, fuel)
    so any engine reproduces the prices bit-for-bit (the oracle path).
    """
    from .functions.prices import BASE_PRICES, with_deterministic_price

    date_col = F.lit(date) if date is not None else F.current_date()
    if jitter == "deterministic":
        fuel = spark.createDataFrame(
            [(ft, bp, i) for i, (ft, bp) in enumerate(BASE_PRICES)],
            "fuel_type string, base_price double, ft_idx int",
        )
        base = (
            stations.select("location_id")
            .crossJoin(F.broadcast(fuel))
            .withColumn(
                "__key",
                F.col("location_id").cast("bigint") * 4 + F.col("ft_idx"),
            )
        )
        priced = with_deterministic_price(base, key="__key").drop("__key", "ft_idx")
    else:
        priced = with_random_price(
            stations.select("location_id").crossJoin(F.broadcast(base_prices_df(spark))),
            seed=seed,
        )
    return priced.select(
        "location_id",
        "fuel_type",
        F.col("price").cast("decimal(5,2)").alias("price"),
        date_col.cast("date").alias("date"),
    )
