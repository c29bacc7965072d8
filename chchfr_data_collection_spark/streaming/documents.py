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


# epoch seconds of 2025-01-01T00:00:00Z: the synthetic ingest-time base
_INGEST_EPOCH = 1_735_689_600


def dedup_by_content_within_watermark(docs: DataFrame, delay: str = "10 days") -> DataFrame:
    """The BOUNDED-state production variant the unbounded dedup's
    docstring names: `dropDuplicatesWithinWatermark` over an ingest-time
    column, so the seen-set state is evicted once the watermark passes
    instead of growing with distinct-content count forever.

    The fixture has no arrival time, so ingest_ts is synthesized
    deterministically (epoch base + doc_id seconds) — in production this
    is the landing timestamp. Duplicates in crawl feeds cluster in time,
    so a delay covering the re-crawl horizon catches them while state
    stays O(distinct content within the window). With the replay's
    bounded input and a delay wider than the synthetic time span, the
    surviving hash set equals the exact distinct — which is what the
    oracle checks; at true scale the operator trades exactness at the
    window boundary for bounded state, explicitly."""
    return (
        docs.withColumn("content_hash", F.md5(F.col("text").cast("binary")))
        .withColumn(
            "ingest_ts", F.timestamp_seconds(F.lit(_INGEST_EPOCH) + F.col("doc_id"))
        )
        .withWatermark("ingest_ts", delay)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def foreach_batch_word_count_partials(stream_df: DataFrame, target: str, checkpoint: str):
    """Incremental term-frequency maintenance on the document stream:
    each micro-batch map-side-combines to per-word count partials and
    lands them in the stats store PARTITIONED BY batch_id with dynamic
    partition overwrite — a foreachBatch RETRY of the same micro-batch
    (task/driver failure before the checkpoint commit) REPLACES its own
    partition instead of appending a second copy, so replays are
    idempotent (foreachBatch is at-least-once; the sink must dedup by
    batch_id). Counts are mergeable partials, so the summed store
    equals the batch word count exactly no matter how the stream was
    chunked — the live "trending terms" feed a crawl pipeline keeps
    next to ingest.

    Store growth is O(#batches × batch-vocabulary); compaction is
    re-aggregation (same algebra), exactly like the moment-partials
    stats store in streaming/events.py."""

    def _acc(batch: DataFrame, batch_id: int) -> None:
        part = (
            batch.select(F.explode(F.split("text", " ", -1)).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("c"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        (
            part.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(target)
        )

    return (
        stream_df.writeStream.foreachBatch(_acc)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_minhash_probe(
    stream_df: DataFrame, index, pairs_target: str, checkpoint: str
):
    """Streaming near-dup index maintenance — the MinHash twin of the
    IVF insert path (streaming/embeddings.py): each arriving micro-batch
    of documents is probed against the PERSISTED banded index
    (operators/minhash_index.MinHashIndex.probe_and_insert), its
    signatures land as the batch's own index partitions, and the
    verified near-dup pairs (>= 1 endpoint in the batch) land in a pairs
    store partitioned by batch_id.

    Both sinks are retry-idempotent by construction: the index landing
    keys its dynamic-overwrite partitions on a delta_id derived from
    batch_id, and the pairs store overwrites its own batch_id partition
    — a foreachBatch replay of an already-landed batch REPLACES rather
    than duplicates (the at-least-once discipline of the partial sinks
    above). Because insert-then-probe makes touched-bucket state equal
    full-corpus state, the union of per-batch pair sets over ANY
    chunking of the feed equals the one-shot incremental result
    (pinned by tests/test_streaming.py and test_minhash_index.py)."""

    def _probe(batch: DataFrame, batch_id: int) -> None:
        # materialize=False: the lazy probe plan is consumed right here
        # inside the micro-batch (no later insert can shift what it
        # reads), and this sink's own batch_id-partitioned write IS the
        # materialization — the index-internal pairs landing would be a
        # redundant second copy
        pairs = index.probe_and_insert(
            batch, delta_id=f"b{batch_id:06d}", materialize=False
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_target)
        )
        # the lazy plan is fully consumed by the write above — NOW the
        # batch's index partitions may be folded by a later compact()
        # (materialize=False defers the fold-landed marker; round-9)
        index.finalize_delta(f"b{batch_id:06d}")

    return (
        stream_df.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_cc_apply(pairs_stream: DataFrame, store, checkpoint: str):
    """Streaming cluster maintenance — the ComponentStore twin of the
    MinHash index's streaming leg above: each arriving micro-batch of
    near-dup PAIRS (in production: the per-batch output of
    foreach_batch_minhash_probe) is folded into the persisted
    (node, component) assignment via
    operators/component_store.ComponentStore.apply_pairs, under a
    batch_id-derived delta_id.

    Replay-safe twice over: apply_pairs lands crash-safe patch
    partitions (marker-gated, retry wipes the orphan), and the fold
    itself is a MONOTONE merge — a foreachBatch redelivery of an
    already-applied batch computes an empty patch, so at-least-once
    delivery can never corrupt the assignment. Because component
    merging is order-insensitive (the fixed point is batch CC over the
    UNION of all pairs ever applied), the final labels are identical
    for any chunking of the pair feed — pinned by the oracle of
    streaming_cc_store_replay and by tests/test_component_store.py."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        store.apply_pairs(batch, delta_id=f"b{batch_id:06d}")

    return (
        pairs_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
