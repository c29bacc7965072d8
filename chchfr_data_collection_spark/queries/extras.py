"""Extended operator surface: as-of / range joins, streaming replays, and
multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join, range_join
from . import register
from .common import T

_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@register(
    "asof_join_last_click",
    sql=f"""
    SELECT e.event_id, e.user_id,
      strftime((SELECT MAX(c.ts) FROM events c
                WHERE c.user_id = e.user_id AND c.event_type = 'click'
                  AND c.ts <= e.ts), '{_TS_FMT_DUCK}') AS last_click_ts
    FROM events e WHERE e.event_type = 'error'
    """,
    tags=("join", "asof", "events"),
)
def asof_join_last_click(spark, sf_dir):
    """As-of join: for each error event, the most recent prior click of
    the same user. Implemented as union+window (one shuffle) — the oracle
    states the same semantics as a correlated MAX subquery."""
    ev = T(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_value="click_ts",
        out_col="last_click",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("last_click", _TS_FMT_SPARK).alias("last_click_ts"),
    )


@register(
    "range_join_value_buckets",
    sql="""
    SELECT b.bucket, COUNT(e.event_id) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM events e
    JOIN (VALUES ('low', 0.0, 5.0), ('mid', 5.0, 10.0), ('high', 10.0, 100.0))
         AS b(bucket, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bucket
    """,
    tags=("join", "range", "events"),
)
def range_join_value_buckets(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    buckets = spark.createDataFrame(
        [("low", 0.0, 5.0), ("mid", 5.0, 10.0), ("high", 10.0, 100.0)],
        "bucket string, lo double, hi double",
    )
    joined = range_join(ev, buckets, "value", "lo", "hi")
    return joined.groupBy("bucket").agg(
        F.count("event_id").alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total"),
    )


@register("streaming_tumbling_replay", sql=None, tags=("streaming", "events"))
def streaming_tumbling_replay(spark, sf_dir):
    """Watermarked tumbling-window aggregation through a REAL Structured
    Streaming replay (Trigger.AvailableNow). Rows-only: verified against
    the batch twin (events_tumbling_hourly) in tests."""
    import uuid

    from ..streaming.events import read_events_stream, run_available_now, tumbling_counts

    stream = tumbling_counts(read_events_stream(spark, sf_dir))
    name = "tumbling_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="complete")


@register("streaming_session_replay", sql=None, tags=("streaming", "events", "sessionization"))
def streaming_session_replay(spark, sf_dir):
    """Gap-based session windows per user through a real Structured
    Streaming replay (rows-only; verified against the batch
    events_sessionization twin in tests)."""
    import uuid

    from ..streaming.events import read_events_stream, run_available_now, session_counts

    stream = session_counts(read_events_stream(spark, sf_dir))
    name = "session_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="complete")


@register("streaming_dedup_replay", sql=None, tags=("streaming", "events", "dedup"))
def streaming_dedup_replay(spark, sf_dir):
    """Stateful dropDuplicatesWithinWatermark replay (rows-only)."""
    import uuid

    from ..streaming.events import (
        dedup_latest_within_watermark,
        read_events_stream,
        run_available_now,
    )

    stream = dedup_latest_within_watermark(read_events_stream(spark, sf_dir))
    name = "dedup_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="append")


@register("streaming_stateful_user_stats", sql=None, tags=("streaming", "events", "stateful", "pandas-udf"))
def streaming_stateful_user_stats(spark, sf_dir):
    """Custom per-key stateful accumulator (applyInPandasWithState):
    lifetime event/value/error totals per user. Rows-only; equals the
    batch groupBy twin on a bounded replay (asserted in tests)."""
    import uuid

    from ..streaming.events import read_events_stream, run_available_now
    from ..streaming.stateful import running_user_stats

    stream = running_user_stats(read_events_stream(spark, sf_dir))
    name = "stateful_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="update")


@register("multimodal_features", sql=None, tags=("multimodal", "pandas-udf"))
def multimodal_features(spark, sf_dir):
    """Binary-payload feature extraction via Arrow-batched mapInPandas
    (deterministic stub kernel — codec libs not in container)."""
    from ..multimodal import attach_fake_media, extract_features

    media = attach_fake_media(T(spark, sf_dir, "documents", parallel=True))
    return extract_features(media, decode="fake")


@register("multimodal_frame_sample", sql=None, tags=("multimodal", "pandas-udf"))
def multimodal_frame_sample(spark, sf_dir):
    from ..multimodal import attach_fake_media, sample_frames

    media = attach_fake_media(T(spark, sf_dir, "documents", parallel=True))
    return sample_frames(media)


@register(
    "validate_fk_orphans",
    sql="""
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
    """,
    tags=("validate", "anti", "fk"),
)
def validate_fk_orphans(spark, sf_dir):
    """FK containment check (reference's fuel_price->gas_station FK,
    SURVEY.md §1.4 J3) as one anti-join: orders whose customer is absent."""
    from ..operators.validate import fk_violations

    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    return fk_violations(orders, cust, ["o_custkey"]).select(
        "o_orderkey", "o_custkey"
    )


@register(
    "validate_unique_key",
    sql="""
    SELECT l_orderkey, l_linenumber, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1
    """,
    tags=("validate", "unique"),
)
def validate_unique_key(spark, sf_dir):
    """Composite-key uniqueness check (reference's UNIQUE(location_id,
    fuel_type, date), SURVEY.md §1.4) over (l_orderkey, l_linenumber)."""
    from ..operators.validate import unique_key_violations

    return unique_key_violations(
        T(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"]
    )


@register("streaming_interval_join_replay", sql=None, tags=("streaming", "events", "join"))
def streaming_interval_join_replay(spark, sf_dir):
    """Watermarked stream-stream interval join replay: clicks within 1h
    before each error, per user (rows-only; equals the batch interval
    join on a bounded replay — asserted in tests)."""
    import uuid

    from ..streaming.events import (
        interval_join_clicks_before_errors,
        read_events_stream,
        run_available_now,
    )

    ev = read_events_stream(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("click_ts")
    )
    stream = interval_join_clicks_before_errors(errors, clicks)
    name = "ivjoin_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="append")


@register("dedup_connected_components", sql=None, tags=("llm", "dedup", "iterative"))
def dedup_connected_components(spark, sf_dir):
    """Near-dup clusters: exact Jaccard>=0.8 pairs folded into connected
    components via iterative min-label propagation (rows-only: iterative
    driver loop; verified against a Python union-find in tests). The
    component id doubles as the dedup keeper (min doc_id per cluster)."""
    from ..operators.graph import connected_components
    from .llm import dedup_ngram_jaccard

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("da", "db")
    return connected_components(pairs)


@register("streaming_static_enrich_replay", sql=None, tags=("streaming", "events", "join"))
def streaming_static_enrich_replay(spark, sf_dir):
    """Stream-static enrichment join: the event stream joined to a
    static per-user dimension (built batch-side from the same fixture).
    The static side broadcasts per micro-batch — the standard shape for
    enriching a stream with a slowly-changing dimension (rows-only;
    equals the batch join on a bounded replay)."""
    import uuid

    from ..streaming.events import read_events_stream, run_available_now

    user_dim = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("lifetime_events"))
    )
    stream = (
        read_events_stream(spark, sf_dir)
        .join(F.broadcast(user_dim), "user_id")
        .select("event_id", "user_id", "event_type", "lifetime_events")
    )
    name = "enrich_" + uuid.uuid4().hex[:8]
    return run_available_now(stream, name, mode="append")


@register(
    "applyinpandas_group_rank",
    sql="""
    SELECT user_id, event_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
                AS BIGINT) AS rnk
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("pandas-udf", "grouped-map", "events"),
)
def applyinpandas_group_rank(spark, sf_dir):
    """Grouped-map applyInPandas: per-user pandas DataFrame in/out,
    computing a dense per-group rank. Integer ranks make the Python-side
    computation oracle-exact — demonstrating the grouped-map surface
    without float drift. (The native-window twin is what production
    would use; this exists to exercise/verify the pandas path.)"""
    import pandas as pd

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"], ascending=[False, True])
        pdf["rnk"] = range(1, len(pdf) + 1)
        return pdf[["user_id", "event_id", "rnk"]]

    ev = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.groupBy("user_id").applyInPandas(
        rank_group, schema="user_id bigint, event_id bigint, rnk bigint"
    )


@register("agg_approx_quantiles", sql=None, tags=("agg", "approx"))
def agg_approx_quantiles(spark, sf_dir):
    """approx_percentile sketch (KLL/GK-style): p50/p95/p99 of order
    totals per priority. Rows-only: sketch internals are engine-specific
    (the exactness policy forbids tolerance compares); bounds sanity is
    asserted in tests."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile_approx("o_totalprice", [0.5, 0.95, 0.99], 10000).alias(
                "pcts"
            ),
            F.count("*").alias("n"),
        )
        .select(
            "o_orderpriority",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p95"),
            F.col("pcts")[2].alias("p99"),
            "n",
        )
    )
