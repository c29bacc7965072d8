"""Query catalog: every operator surface exposed as (Spark fn, oracle SQL).

Each entry pairs an idiomatic-Spark DataFrame implementation with an
equivalent ANSI-SQL string a DuckDB oracle can run on the same parquet
tables. Cross-engine float determinism policy:

- Sums over monetary/quantity doubles go through DECIMAL(12,2) (exact in
  both engines) and are cast back to DOUBLE at the end — bit-identical.
- Averages are computed as exact-decimal-sum / count in double — IEEE
  division of identical inputs is identical.
- No transcendental functions in oracle-checked queries (libm ulp drift);
  no unseeded randomness; top-k always carries a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB-oracle SQL; None => rows-only check
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, sql: str | None, tags: tuple = ()):  # decorator
    def deco(fn):
        _REGISTRY[name] = QueryDef(name, fn, sql, tags)
        return fn

    return deco


def catalog() -> dict[str, QueryDef]:
    # import side-effect populates the registry
    from . import (  # noqa: F401
        advanced,
        curation,
        domain,
        events_q,
        extras,
        llm,
        ops,
        relational,
        scale_ops,
        tpch_rest,
    )

    return dict(_REGISTRY)
