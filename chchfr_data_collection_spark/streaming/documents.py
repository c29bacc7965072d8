"""Streaming document ingest: the curation pipeline's streaming leg.

A crawl feed never arrives as one batch — documents stream in and the
exact-dedup pass must hold seen-content state across micro-batches.
This module streams the documents fixture through Structured Streaming
with content-hash dedup state, mirroring how a 100 TB crawl ingest runs
continuously (reference: the per-row existence probes in
dag_collection_data_from_bp.py:61-78 are the batch ancestor of this —
"have I seen this row before" as engine state instead of N+1 lookups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents fixture through the parquet file source.
    At scale the `load` path is the crawl landing zone and new files
    arrive continuously; `maxFilesPerTrigger` bounds batch size."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def dedup_by_content(docs: DataFrame) -> DataFrame:
    """Streaming exact dedup on the content hash: one surviving row per
    distinct text, held as streaming state across micro-batches.

    State policy at 100 TB: unbounded `dropDuplicates` state grows with
    distinct-content count — production runs bound it with
    `dropDuplicatesWithinWatermark` over an ingest-time column (dups
    cluster in time in crawl feeds) or an external seen-set (the
    foreachBatch anti-join against the landed store, operators/ingest).
    The bounded replay here keeps full state, which is exact.
    """
    return docs.withColumn(
        "content_hash", F.md5(F.col("text").cast("binary"))
    ).dropDuplicates(["content_hash"])
