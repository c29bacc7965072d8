"""Shared helpers for catalog queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table; `parallel=True` for compute-bound consumers
    (per-row shingling / quantization / regex) — see session.parallelize_scan."""
    from ..session import load_table, parallelize_scan

    df = load_table(spark, sf_dir, name)
    return parallelize_scan(df) if parallel else df


def dec(c: Column | str) -> Column:
    """Exact-decimal view of a 2-dp monetary/quantity double."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(12,2)")


def dsum(c: Column | str) -> Column:
    """Cross-engine-exact sum of a 2-dp double: decimal sum -> double."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Cross-engine-exact mean: exact decimal sum / count, in double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(dec(c)).cast("double") / F.count(c)
