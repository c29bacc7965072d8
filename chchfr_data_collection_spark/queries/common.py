"""Shared helpers for catalog queries."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(
    spark: SparkSession, sf_dir: str, name: str, parallel: bool = False
) -> DataFrame:
    """Load a fixture table; `parallel=True` for compute-bound consumers
    (per-row shingling / quantization / regex) — see session.parallelize_scan.

    The `parallel=True` plan is memoized per (session, sf_dir, table)
    alongside session.load_table's memo: `parallelize_scan` pays a
    physical-planning pass (`df.rdd.getNumPartitions`, ~0.1 s) per call
    to decide whether to repartition, and the decision is a pure
    function of the (immutable) fixture file and the session's
    parallelism. Lazy plan only — every action still scans parquet."""
    from ..session import load_table, parallelize_scan

    df = load_table(spark, sf_dir, name)
    if not parallel:
        return df
    # keyed on the session object (weakly), not applicationId — a
    # spark.newSession() sibling shares the applicationId but not the
    # session state its plans are bound to (round-15 ADVICE, low)
    per_session = _PARALLEL_PLAN_CACHE.get(spark)
    if per_session is None:
        per_session = _PARALLEL_PLAN_CACHE[spark] = {}
    key = (sf_dir, name)
    hit = per_session.get(key)
    if hit is None:
        if len(per_session) >= 64:
            per_session.clear()
        hit = per_session[key] = parallelize_scan(df)
    return hit


from weakref import WeakKeyDictionary as _WeakKeyDictionary  # noqa: E402

_PARALLEL_PLAN_CACHE: _WeakKeyDictionary = _WeakKeyDictionary()


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
