"""Write policies for 100 TB tables (SURVEY.md §4.3).

- Facts partition by date; daily re-writes touch one partition
  (operators/upsert.overwrite_date_partition).
- File sizing: a partition with too few files underuses the cluster on
  read; too many small files thrash the namenode/footer reads. Target
  128–512 MB per file via `maxRecordsPerFile` + an explicit repartition
  to the expected file count.
- Clustering: sortWithinPartitions on the dominant filter/join key gives
  parquet row-group min/max statistics their pruning power (the
  poor-man's Z-order for a single key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_fact(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("date",),
    cluster_by: Sequence[str] = (),
    max_records_per_file: int = 1_000_000,
    files_per_partition: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned fact write with file-size and clustering policy.

    `files_per_partition` repartitions on (partition_cols, bucket) so each
    output partition is written by that many tasks — set it to
    ceil(partition_rows / rows_per_target_file) for even 128–512 MB files.
    `cluster_by` sorts within each file so row-group stats prune reads on
    that key.
    """
    out = df
    if files_per_partition:
        # hash-bucket within each table partition so every partition is
        # written by `files_per_partition` tasks => that many files.
        # No explicit task count: with a count of files_per_partition *
        # len(partition_cols) all (date, bucket) groups would collide into
        # a handful of tasks once the table has many dates — instead let
        # AQE / spark.sql.shuffle.partitions size the shuffle over the
        # (partition_cols, bucket) keys, which spreads distinct partition
        # values across however many tasks the data needs.
        out = out.repartition(
            *[F.col(c) for c in partition_cols],
            F.pmod(F.xxhash64(*df.columns), F.lit(files_per_partition)),
        )
    if cluster_by:
        out = out.sortWithinPartitions(*partition_cols, *cluster_by)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def compact_partition(
    spark_df: DataFrame, n_files: int
) -> DataFrame:
    """Small-file compaction for an existing partition: coalesce (no
    shuffle) down to `n_files` before rewrite."""
    return spark_df.coalesce(n_files)
