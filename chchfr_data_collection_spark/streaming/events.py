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

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events fixture with ``ts`` normalized to TimestampType.

    The streaming file source needs an explicit schema, and the fixture's
    physical ``ts`` layout has drifted across generations (TIMESTAMP(NANOS)
    → TIMESTAMP(MICROS)), so the schema is probed from the parquet footer
    via a driver-side batch read instead of being hard-coded — same
    dispatch as the batch loader (`session._load_events`).
    """
    path = f"{sf_dir}/events.parquet"
    try:
        schema = spark.read.parquet(path).schema
    except Exception:
        # TIMESTAMP(NANOS) parquet needs the legacy conf to be readable.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(path).schema
    # the streaming file source requires a directory — point it at the
    # fixture dir and glob-filter to the events file
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if isinstance(schema["ts"].dataType, T.LongType):  # nanos since epoch
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling window counts — late rows beyond the watermark
    are dropped, which bounds state size on an unbounded stream.

    The value sum goes through DECIMAL(12,2): exact and associative, so
    the result is independent of micro-batch arrival order (a plain
    double sum would drift with partitioning — unacceptable for a result
    that must be stable across replays)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        )
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
    checkpoint + idempotent merge make re-delivered batches safe.

    First-batch bootstrap is detected by an explicit path-existence probe
    (NOT a bare except: a schema mismatch or corrupt footer must fail the
    batch, never silently overwrite the target with one micro-batch).
    The swap is rename-based: the merged result lands in a staging dir,
    the old target moves aside, staging renames into place — two metadata
    ops instead of a second full rewrite, shrinking the non-atomic window
    to a directory rename. (With a transactional format — Delta/Iceberg —
    this whole function is one MERGE INTO; documented in NOTES.md.)"""
    import uuid

    from ..operators.lease import WriterLease
    from ..operators.upsert import upsert_by_key

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Writer fence: the read-merge-publish below is a lost-update
        # hazard if two streams (or a stream + a batch backfill) target
        # the same path — A reads pre-B state, then renames over B's
        # result. The lease serializes cooperating writers
        # (operators/lease.py); within one stream, checkpointing already
        # serializes epochs.
        with WriterLease(spark, target_path):
            _merge_batch_locked(batch_df)

    def _merge_batch_locked(batch_df: DataFrame) -> None:
        spark = batch_df.sparkSession
        # Hadoop FileSystem API, NOT os.path/os.rename: the target may be
        # hdfs:// or s3a:// — driver-local fs calls would see a missing
        # dir, take the bootstrap branch every batch, and clobber the
        # target with one micro-batch
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        HPath = jvm.org.apache.hadoop.fs.Path
        tgt = HPath(target_path)
        fs = tgt.getFileSystem(hconf)
        if fs.exists(tgt):
            existing = spark.read.parquet(target_path)
            merged = upsert_by_key(existing, batch_df, keys)
        else:
            merged = batch_df
        staging = HPath(f"{target_path}__stage_{uuid.uuid4().hex[:8]}")
        merged.write.mode("overwrite").parquet(staging.toString())
        trash = HPath(f"{target_path}__old_{uuid.uuid4().hex[:8]}")
        had_target = fs.exists(tgt)
        if had_target and not fs.rename(tgt, trash):
            raise IOError(f"could not move aside {target_path}")
        if not fs.rename(staging, tgt):
            # roll back the move-aside so the target is never left absent
            if had_target:
                fs.rename(trash, tgt)
            raise IOError(f"could not publish staging dir to {target_path}")
        if had_target:
            fs.delete(trash, True)

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_INTERVAL_UNIT_S = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(spec: str) -> int:
    """Parse a 'N unit' interval string ('1 hour', '30 minutes')."""
    n, unit = spec.strip().split()
    return int(n) * _INTERVAL_UNIT_S[unit.lower()]


def interval_join_clicks_before_errors(
    errors: DataFrame, clicks: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream interval join: for each error event,
    all clicks by the same user in the preceding `horizon`.

    Both sides carry watermarks so the join state is bounded: a buffered
    click can be evicted once the error-side watermark passes
    click_ts + horizon. The time-range predicate is what turns the
    unbounded stream-stream join into a finite-state one.

    The click-side watermark is DERIVED from the horizon (horizon + 1h
    slack): a fixed watermark smaller than the join window would evict
    buffered clicks still inside it, silently dropping matches."""
    wm = f"{_interval_seconds(horizon) + 3600} seconds"
    e = errors.withWatermark("ts", wm).alias("e")
    c = clicks.withWatermark("click_ts", wm).alias("c")
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


def foreach_batch_moment_partials(
    stream_df: DataFrame, target: str, checkpoint: str
):
    """Incremental sufficient-statistics maintenance on the event stream:
    each micro-batch reduces to per-type moment partials (n, Σv, Σv²) in
    exact cents-quantized integers and APPENDS them to the stats store —
    the mergeable-partials pattern (same algebra as the batch 3σ gate,
    `queries/events_q.events_anomaly_3sigma`). Integer partials are
    order- and batch-boundary-independent, so the merged stats equal the
    batch aggregate exactly no matter how the stream was chunked.

    Returns the started query; caller awaits termination."""

    def _acc(batch: DataFrame, batch_id: int) -> None:
        v = F.round(F.col("value") * 100).cast("bigint")
        part = (
            batch.select("event_type", v.alias("v"))
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.sum("v").alias("s"),
                F.sum(F.col("v") * F.col("v")).alias("q2"),
            )
        )
        part.write.mode("append").parquet(target)

    return (
        stream_df.writeStream.foreachBatch(_acc)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_value_hist_partials(
    stream_df: DataFrame, target: str, checkpoint: str
):
    """Incremental value-HISTOGRAM maintenance on the event stream: each
    micro-batch reduces to (event_type, cents-value, count) cells and
    lands them in the stats store PARTITIONED BY batch_id with dynamic
    partition overwrite — a foreachBatch RETRY of the same micro-batch
    REPLACES its own partition instead of appending a duplicate, so
    replays are idempotent (foreachBatch is at-least-once; the sink
    must dedup by batch_id). Histogram cells are mergeable
    partials — summing the store reproduces the batch histogram exactly
    regardless of chunking — and the per-type histogram is bounded by
    the value range, not the event count, so the store compacts to a
    constant-size relation by re-aggregation. This is the exact-p99
    maintenance loop: quantiles read off the merged histogram equal the
    batch quantiles bit-for-bit (see events_exact_quantiles)."""

    def _acc(batch: DataFrame, batch_id: int) -> None:
        part = (
            batch.select(
                "event_type",
                F.round(F.col("value") * 100).cast("bigint").alias("v"),
            )
            .groupBy("event_type", "v")
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
