"""Incremental rollup maintenance: merge a new partition's partial
aggregates into a materialized rollup WITHOUT re-scanning history —
the continuous-aggregate / hypertable pattern (TimescaleDB-style
cagg refresh; reference's daily cadence in
dag_daily_fuel_price_generation.py is the batch ancestor).

Correctness hinges on re-aggregability: COUNT and SUM partials merge by
SUM; MIN/MAX by MIN/MAX; AVG must be stored as (sum, count), never as
the quotient. At 100 TB this is the difference between scanning one
day (the increment) and scanning the whole fact table every refresh.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# merge rules for each stored partial
_MERGE = {
    "n": F.sum,
    "total": F.sum,
    "vmin": F.min,
    "vmax": F.max,
}


def rollup_partials(events: DataFrame, *keys: str | Column) -> DataFrame:
    """Aggregate a slice of the fact table into mergeable partials."""
    return events.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("total"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


def merge_rollup(base: DataFrame, increment: DataFrame) -> DataFrame:
    """Merge two partial-rollup frames (same schema) into one: union the
    partials and re-reduce with each column's merge function. One
    shuffle over ROLLUP-sized data (not fact-sized) — the whole point.
    Keys = every non-partial column."""
    keys = [c for c in base.columns if c not in _MERGE]
    return (
        base.unionByName(increment)
        .groupBy(*keys)
        .agg(*[fn(c).alias(c) for c, fn in _MERGE.items() if c in base.columns])
    )
