"""Structured Streaming over the events table.

The reference has no true streaming — its daily cron + date-keyed upsert
(SURVEY.md §2.9) is a batch emulation of a slow feed. Here the same
shapes run as real streams: watermarked tumbling/sliding/session
windows, stateful keep-one dedup, and a foreachBatch MERGE sink that
reuses the batch upsert operator so retries stay idempotent.

Tests replay the parquet fixture through Trigger.AvailableNow — the
documented local pattern for driving a bounded stream to completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet carries TIMESTAMP(NANOS) -> read as long nanos, convert
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # nanos since epoch
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the streaming file source requires a directory — point it at the
    # fixture dir and glob-filter to the events file
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling window counts — late rows beyond the watermark
    are dropped, which bounds state size on an unbounded stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of the
    batch events_sessionization query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_latest_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stateful keep-one dedup on (user_id, event_type) within the
    watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, mode: str = "complete"
) -> DataFrame:
    """Drive a bounded stream to completion into an in-memory table and
    return the result as a batch DataFrame (test/verification path).

    Default mode is `complete` for windowed aggregations: in append mode a
    bounded replay never emits the final windows (the watermark only
    advances on new input, so end-of-stream state stays unflushed).
    Row-level streams (e.g. dedup) must pass mode="append".
    """
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_path: str,
    keys: list,
    checkpoint: str,
) -> None:
    """Exactly-once-ish MERGE sink: each micro-batch upserts into a
    parquet target via the batch upsert operator (K2 semantics). The
    checkpoint + idempotent merge make re-delivered batches safe."""
    from ..operators.upsert import upsert_by_key

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            existing = spark.read.parquet(target_path)
            merged = upsert_by_key(existing, batch_df, keys)
        except Exception:
            merged = batch_df
        merged.write.mode("overwrite").parquet(target_path + "_tmp")
        spark.read.parquet(target_path + "_tmp").write.mode("overwrite").parquet(
            target_path
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def interval_join_clicks_before_errors(
    errors: DataFrame, clicks: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: for each error event,
    all clicks by the same user in the preceding `horizon`.

    Both sides carry watermarks so the join state is bounded: a buffered
    click can be evicted once the error-side watermark passes
    click_ts + horizon. The time-range predicate is what turns the
    unbounded stream-stream join into a finite-state one."""
    e = errors.withWatermark("ts", "2 hours").alias("e")
    c = clicks.withWatermark("click_ts", "2 hours").alias("c")
    return e.join(
        c,
        F.expr(
            f"""
            e.user_id = c.user_id AND
            c.click_ts >= e.ts - INTERVAL {horizon} AND
            c.click_ts <= e.ts
            """
        ),
    ).select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.ts").alias("error_ts"),
        F.col("c.click_ts").alias("click_ts"),
    )
