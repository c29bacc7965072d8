"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew transparently; these utilities cover the two cases AQE
cannot: (1) a skewed *aggregation* (AQE only splits join partitions),
and (2) a skewed join where one side must be replicated per salt.

Pattern: two-phase aggregation. Phase 1 groups on (key, salt) — the hot
key's rows spread over `n_salts` partitions and partial-aggregate in
parallel; phase 2 re-aggregates the per-salt partials on the key alone.
The phase-2 input has at most `n_salts` rows per key, so the second
shuffle is trivially balanced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "__salt") -> DataFrame:
    """Uniform int salt in [0, n_salts). Deterministic per row via a hash
    of the whole row? No — salting must only balance, not be stable, so a
    cheap per-row counter hash (`spark_partition_id` ⊕ monotonic id) is
    enough and avoids a rand() non-determinism flag in tests."""
    return df.withColumn(
        col_name,
        (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict,
    final_aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs: output_col -> Column aggregate over the raw rows
    final_aggs:   output_col -> Column aggregate over the partials
                  (referencing the partial output columns)

    Example — skew-safe count+sum:
        salted_agg(df, ["k"],
                   {"cnt": F.count("*"), "s": F.sum("v")},
                   {"cnt": F.sum("cnt"), "s": F.sum("s")})
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the big side, replicate the small side once
    per salt value, join on (keys + salt). The hot key's rows land in
    `n_salts` different partitions instead of one straggler.

    Use when the small side is too big to broadcast outright but small
    enough to replicate n_salts× across the shuffle. (If it broadcasts,
    just broadcast — no salt needed.)

    Only inner/left joins are supported: the small side is replicated
    once per salt, so right/full semantics would emit each unmatched
    small-side row n_salts times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "the replicated small side would duplicate unmatched rows "
            "under right/full semantics"
        )
    big_s = with_salt(big, n_salts)
    small_r = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big_s.join(small_r, [*on, "__salt"], how)
    return out.drop("__salt")
