"""Event-stream surface, batch-checkable form.

The streaming/ package runs these same shapes through Structured
Streaming (watermarks, availableNow); here each is expressed as a batch
query so the DuckDB oracle can verify the window semantics. Timestamps
are emitted as formatted strings to sidestep engine timezone-object
differences (session TZ pinned UTC on the Spark side).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import register
from .common import T, dec, dsum

_FMT = "yyyy-MM-dd HH:mm:ss"
_DFMT = "%Y-%m-%d %H:%M:%S"


@register(
    "events_tumbling_hourly",
    sql=f"""
    SELECT strftime(date_trunc('hour', ts), '{_DFMT}') AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "window-agg"),
)
def events_tumbling_hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sliding_hourly",
    sql=f"""
    WITH base AS (
      SELECT *, date_trunc('hour', ts)
             + CASE WHEN EXTRACT(minute FROM ts) >= 30
                    THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS slide30
      FROM events),
    assigned AS (
      SELECT slide30 AS window_start, event_type, value FROM base
      UNION ALL
      SELECT slide30 - INTERVAL 30 MINUTE, event_type, value FROM base)
    SELECT strftime(window_start, '{_DFMT}') AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "sliding"),
)
def events_sliding_hourly(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _FMT).alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "events_sessionization",
    sql="""
    WITH flagged AS (
      SELECT user_id, event_id,
        CASE WHEN LAG(ts) OVER w IS NULL
                  OR date_diff('second', LAG(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    tags=("events", "sessionization"),
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessionization (a gap STRICTLY over 30 min starts a new
    session — session_window measurably merges an exactly-gap arrival,
    its overlap test is boundary-inclusive) — the batch
    twin of streaming session_window(). The per-user session count is just
    the number of gap-breaks, so no second cumulative window is needed."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    flagged = ev.select(
        "user_id",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap_s > 1800), 1).otherwise(0).alias("is_new"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("is_new").alias("n_sessions"), F.count("*").alias("n_events")
    )


@register(
    "events_dedup_latest",
    sql="""
    SELECT user_id, event_type, event_id, value FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    tags=("events", "dedup"),
)
def events_dedup_latest(spark, sf_dir):
    """Keep-latest dedup per (user, type) — batch twin of
    dropDuplicatesWithinWatermark."""
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        T(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


@register(
    "events_type_share",
    sql="""
    SELECT event_type, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
    FROM events GROUP BY event_type
    """,
    tags=("events", "window"),
)
def events_type_share(spark, sf_dir):
    counts = T(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count("*").alias("n")
    )
    return counts.select(
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(W.partitionBy())).alias("share"),
    )
