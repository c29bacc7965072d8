"""Data-quality validation operators — the reference's constraint surface
(PK / FK / UNIQUE, SURVEY.md §1.4), set-based.

Spark enforces no constraints; a 100 TB pipeline validates them as
queries instead: each check is one anti-join or one aggregation, run
post-write (or pre-merge as a gate). Violations come back as rows, not
booleans, so the pipeline can quarantine them.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    fact: DataFrame, dim: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Fact rows whose key has no match in the dimension (orphans).
    One left-anti join; broadcast when the dim's key projection is small."""
    dim_keys = dim.select(*keys).dropDuplicates(list(keys))
    return fact.join(dim_keys, on=list(keys), how="left_anti")


def unique_key_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Keys appearing more than once (PK/UNIQUE violation), with counts."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def null_rate(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """One row: per-column null fraction (completeness check)."""
    total = F.count("*")
    return df.agg(
        *[
            (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / total).alias(
                f"{c}_null_rate"
            )
            for c in columns
        ]
    )


def range_violations(
    df: DataFrame, column: str, lo=None, hi=None
) -> DataFrame:
    """Rows outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(column) < lo)
    if hi is not None:
        cond = cond | (F.col(column) > hi)
    return df.filter(cond)


def observed_write(
    df: DataFrame,
    path: str,
    expectations: dict[str, "F.Column"],
    fmt: str = "parquet",
    require: dict | None = None,
) -> dict:
    """Write with FREE in-flight quality metrics via `df.observe()`:
    the named aggregates are computed by the same tasks that write the
    rows — zero extra scan, zero extra shuffle. Contrast with the
    check-as-query operators above, which each cost a pass; at 100 TB
    row/null/range counters belong on the write itself.

    `expectations` maps metric name -> aggregate Column (e.g.
    ``{"n": F.count(F.lit(1)), "null_keys": F.sum(F.isnull("k").cast("int"))}``).
    `require` optionally maps metric name -> predicate over the observed
    value; any failed predicate raises ValueError AFTER the write but
    BEFORE returning, so a pipeline gates downstream consumption on it
    (the parquet files exist — a caller that needs all-or-nothing wraps
    the target in a staging dir, see streaming.events.foreach_batch_upsert).
    Returns the observed metrics dict.
    """
    from pyspark.sql import Observation

    if not expectations:
        raise ValueError("observed_write needs at least one expectation column")
    unknown = set(require or ()) - set(expectations)
    if unknown:
        raise ValueError(f"require refers to unobserved metrics: {sorted(unknown)}")
    obs = Observation()
    named = [c.alias(n) for n, c in expectations.items()]
    df.observe(obs, named[0], *named[1:]).write.mode("overwrite").format(fmt).save(
        path
    )
    metrics = obs.get
    failed = {
        name: metrics[name]
        for name, pred in (require or {}).items()
        if not pred(metrics[name])
    }
    if failed:
        raise ValueError(f"observed_write expectations violated: {failed}")
    return metrics
