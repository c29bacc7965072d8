"""Upsert / MERGE emulation over non-transactional storage.

The reference upserts with `INSERT ... ON CONFLICT (location_id,
fuel_type, date) DO UPDATE SET price = EXCLUDED.price`
(dag_daily_fuel_price_generation.py:120-125). Without Delta/Iceberg on
the classpath, two equivalent strategies:

- `upsert_by_key`: batch MERGE semantics as a DataFrame transform —
  new rows replace old rows on the key (last-writer-wins).
- `overwrite_date_partition`: the scale path for a date-keyed fact —
  since `date` is part of the conflict key, rewriting only today's
  partition (dynamic partitionOverwriteMode) IS the upsert, is
  idempotent under retries, and touches 1/Nth of the table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_by_key(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE: incoming wins on key conflicts, everything else unioned.

    Implemented as anti-join (keep unmatched existing) + union — two
    narrow passes, no window sort. Equivalent to Delta
    `MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT` for whole-row
    updates.
    """
    incoming_keys = incoming.select(*keys).dropDuplicates(list(keys))
    kept = existing.join(incoming_keys, on=list(keys), how="left_anti")
    return kept.unionByName(incoming)


def upsert_last_wins(
    existing: DataFrame,
    incoming: DataFrame,
    keys: Sequence[str],
    version_col: str,
) -> DataFrame:
    """MERGE with an explicit version: highest `version_col` wins per key.

    Use when incoming may itself contain multiple versions of a key.
    """
    unioned = existing.unionByName(incoming)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def overwrite_date_partition(
    df: DataFrame, path: str, date_col: str = "date", fence: bool = True
) -> None:
    """Idempotent daily write: replace only the partitions present in `df`.

    Requires spark.sql.sources.partitionOverwriteMode=dynamic (set by the
    session factory). Re-running the job for the same date rewrites the
    same partition to the same content — the retry-safety the reference
    gets from ON CONFLICT.

    `fence=True` (default) serializes concurrent writers on the same
    table via a lease file (operators/lease.py): two jobs racing the
    same date wait on each other instead of interleaving their commit
    phases into a mixed-file partition. Matches the isolation the
    reference gets from Postgres row locks under ON CONFLICT.
    """
    if fence:
        from .lease import WriterLease

        with WriterLease(df.sparkSession, path):
            df.write.mode("overwrite").partitionBy(date_col).parquet(path)
    else:
        df.write.mode("overwrite").partitionBy(date_col).parquet(path)
