"""Set-based ingest operators.

The reference's central anti-pattern is an N+1 nested-loop semi-join:
one `SELECT COUNT(*)` probe plus conditional INSERT per incoming row
(dag_collection_data_from_bp.py:61-76 and three clones). Every operator
here is its set-based replacement: ONE anti-join per batch, which
Catalyst executes as a broadcast-hash anti when the existing side's key
projection is small, else a sort-merge anti — both scale to 100 TB
where the row-at-a-time probe fundamentally cannot.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_within_batch(
    df: DataFrame, keys: Sequence[str] = ("location_id",), order: Sequence[str] = ()
) -> DataFrame:
    """Keep one row per key within a batch.

    With `order` columns, keeps the first row under that ordering
    (deterministic); without, an arbitrary row (`dropDuplicates`, cheaper:
    partial aggregation map-side, no full sort).
    """
    if not order:
        return df.dropDuplicates(list(keys))
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def new_rows_only(
    incoming: DataFrame, existing: DataFrame, keys: Sequence[str] = ("location_id",)
) -> DataFrame:
    """Append-if-absent filter: incoming rows whose key is not in `existing`.

    Replaces the reference's per-row existence probe + conditional insert
    (K1/S6/P4/J1 in SURVEY.md §2) with one left-anti join. Only the key
    columns of `existing` are needed — select them so the scan prunes to
    the key and the anti-join's build side stays small enough to broadcast.
    """
    existing_keys = existing.select(*keys).dropDuplicates(list(keys))
    return incoming.join(existing_keys, on=list(keys), how="left_anti")


def union_sources_with_priority(
    sources: Sequence[DataFrame],
    keys: Sequence[str] = ("location_id",),
    priority_col: str = "source_priority",
) -> DataFrame:
    """Union conformed source batches, one row per key by explicit priority.

    The reference's four collector DAGs race to insert first
    (first-writer-wins, nondeterministic across sources — SURVEY.md §2.7);
    this makes precedence explicit: lowest `source_priority` wins, ties
    broken by source name for full determinism.
    """
    unioned = sources[0]
    for s in sources[1:]:
        unioned = unioned.unionByName(s, allowMissingColumns=True)
    w = Window.partitionBy(*keys).orderBy(
        F.col(priority_col).asc(), F.col("source").asc()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ingest_batch(
    incoming: DataFrame,
    existing: DataFrame,
    keys: Sequence[str] = ("location_id",),
) -> DataFrame:
    """Full ingest step: within-batch dedup -> anti-join -> rows to append."""
    return new_rows_only(dedup_within_batch(incoming, keys), existing, keys)
