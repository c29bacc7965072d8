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


@register(
    "events_retention_cohort",
    sql="""
    WITH first_day AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN first_day f ON f.user_id = e.user_id)
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day, day_offset,
           COUNT(*) AS n_active
    FROM activity WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
    tags=("events", "cohort", "retention"),
)
def events_retention_cohort(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted once
    per (cohort, day-offset) they return on — the product-analytics
    matrix behind every retention curve. Two aggregations over the fact
    (first-day, then distinct activity) joined on user_id; at scale the
    first-day relation is user-dimension-sized, so the join shuffles
    keyed on user_id once and the offset cap bounds the output to
    cohorts × 8 rows."""
    ev = T(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = (
        ev.join(first_day, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count("*").alias("n_active"))
    )


@register(
    "events_funnel_click_purchase",
    sql="""
    WITH clicks AS (
      SELECT user_id, MIN(ts) AS first_click FROM events
      WHERE event_type = 'click' GROUP BY user_id),
    conv AS (
      SELECT c.user_id, c.first_click,
             MIN(p.ts) AS first_purchase_after
      FROM clicks c
      LEFT JOIN events p ON p.user_id = c.user_id
        AND p.event_type = 'purchase' AND p.ts > c.first_click
        AND p.ts <= c.first_click + INTERVAL 24 HOUR
      GROUP BY c.user_id, c.first_click)
    SELECT COUNT(*) AS n_clickers,
           CAST(SUM(CASE WHEN first_purchase_after IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
    FROM conv
    """,
    tags=("events", "funnel", "conversion"),
)
def events_funnel_click_purchase(spark, sf_dir):
    """Conversion funnel: of users who clicked, how many purchased
    within 24 h of their FIRST click — the two-step funnel as a
    per-user reduce (first click) plus a windowed existence probe.
    Both sides are type-filtered BEFORE the user-keyed join, so the
    shuffle carries two thin event subsets, and the 24 h predicate is
    the join residual — the same interval-join shape the streaming
    surface runs with watermarks."""
    ev = T(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    conv = (
        clicks.join(
            purchases,
            (clicks.user_id == purchases.user_id)
            & (F.col("p_ts") > F.col("first_click"))
            & (F.col("p_ts") <= F.col("first_click") + F.expr("INTERVAL 24 HOUR")),
            "left",
        )
        .groupBy(clicks.user_id, "first_click")
        .agg(F.min("p_ts").alias("first_purchase_after"))
    )
    return conv.agg(
        F.count("*").alias("n_clickers"),
        F.sum(
            F.when(F.col("first_purchase_after").isNotNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_converted"),
    )


@register(
    "events_anomaly_3sigma",
    sql="""
    WITH q AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 100) AS HUGEINT) AS v
      FROM events),
    stats AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(v) AS s,
             SUM(v * v) AS q2
      FROM q GROUP BY event_type)
    SELECT q.event_id, q.event_type, q.value
    FROM q JOIN stats t ON t.event_type = q.event_type
    WHERE (t.n * q.v - t.s) * (t.n * q.v - t.s)
          > 9 * (t.n * t.q2 - t.s * t.s)
    """,
    tags=("events", "anomaly", "stats"),
)
def events_anomaly_3sigma(spark, sf_dir):
    """Per-type 3-sigma outliers in EXACT INTEGER arithmetic — no sqrt
    (engines differ in ulps) and no float summation (double SUM is
    addition-order-dependent, so a var_pop built from it is not
    cross-engine-stable): values quantize to cents (2-dp by
    construction), and |x−μ| > 3σ_pop becomes
        (n·v − S)² > 9·(n·Q − S²),   S = Σv, Q = Σv²
    — multiply both sides of (v − S/n)² > 9·(Q/n − (S/n)²) by n².
    Integer sums are order-independent, so this is bit-exact at ANY
    partitioning. Spark side runs in DECIMAL(38,0) (≈1e38 headroom:
    n·v ≤ 1e12·1e7 → lhs ≤ 1e38 at a trillion rows), DuckDB in HUGEINT.
    One aggregation pass + a broadcast stats join; the filter evaluates
    against per-type constants in the scan stage."""
    ev = T(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("bigint")
    q = ev.select("event_id", "event_type", "value", v.alias("v"))
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    stats = q.groupBy("event_type").agg(
        big(F.count("*")).alias("n"),
        big(F.sum("v")).alias("s"),
        big(F.sum(F.col("v") * F.col("v"))).alias("q2"),
    )
    lhs_root = big(F.col("n") * F.col("v")) - F.col("s")
    rhs = F.lit(9).cast("decimal(38,0)") * (
        big(F.col("n") * F.col("q2")) - big(F.col("s") * F.col("s"))
    )
    return (
        q.join(F.broadcast(stats), "event_type")
        .filter(lhs_root * lhs_root > rhs)
        .select("event_id", "event_type", "value")
    )


@register(
    "events_rollup_hll_incremental",
    sql="""
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS merge_consistent, TRUE AS hll_ok
    FROM events GROUP BY event_type
    """,
    tags=("events", "rollup", "incremental", "approx"),
)
def events_rollup_hll_incremental(spark, sf_dir):
    """Approx-distinct rollup maintenance: per-day HLL sketches are the
    stored partials, daily refresh merges the new day's sketch instead
    of re-scanning history — COUNT(DISTINCT) is NOT re-aggregable but
    its sketch is, which is why production rollups store sketch bytes
    (Datasketches HLL via hll_sketch_agg/hll_union_agg). Checkable
    surface (sketch bytes are engine-internal): the exact count, a
    boolean that the merged estimate tracks the whole-table sketch
    within 1% (Datasketches unions promote through an HLL_8 gadget, so
    merged and directly-built sketches differ by a few registers —
    measured 1488 vs 1494 on 1500 at sf0.1; bit-equality would be a
    false contract), and the 5% accuracy contract vs exact."""
    ev = T(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    parts = ev.groupBy("event_type", day).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = parts.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
    )
    whole = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("whole_est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return (
        merged.join(whole, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("merged_est") - F.col("whole_est"))
                <= F.lit(0.01) * F.col("whole_est")
            ).alias("merge_consistent"),
            (
                F.abs(F.col("merged_est") - F.col("exact_users"))
                <= F.lit(0.05) * F.col("exact_users")
            ).alias("hll_ok"),
        )
    )


@register(
    "events_funnel_3step",
    sql=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT v.user_id, v.first_view, MIN(e.ts) AS first_click
      FROM v JOIN events e ON e.user_id = v.user_id
       AND e.event_type = 'click' AND e.ts > v.first_view
       AND e.ts <= v.first_view + INTERVAL 24 HOUR
      GROUP BY v.user_id, v.first_view),
    p AS (
      SELECT c.user_id, MIN(e.ts) AS first_purchase
      FROM c JOIN events e ON e.user_id = c.user_id
       AND e.event_type = 'purchase' AND e.ts > c.first_click
       AND e.ts <= c.first_view + INTERVAL 24 HOUR
      GROUP BY c.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewers,
           (SELECT COUNT(*) FROM c) AS n_clicked,
           (SELECT COUNT(*) FROM p) AS n_purchased
    """,
    tags=("events", "funnel"),
)
def events_funnel_3step(spark, sf_dir):
    """Ordered 3-step funnel (view → click → purchase, strictly
    increasing timestamps, all within 24 h of the first view) — the
    k-step generalization of events_funnel_click_purchase and the
    canonical product-analytics query engines special-case
    (windowFunnel in ClickHouse): each step is a MIN-aggregation
    constrained by the previous step's anchor, so determinism needs no
    per-event ordering beyond the min.

    100 TB plan: three shuffles at user grain with map-side partial
    mins; each stage's join keys on user_id so all three reuse one
    partitioning (no re-exchange between steps under AQE); final counts
    are 1-row aggregates joined without shuffles."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts")
    )
    c = (
        v.join(clicks, "user_id")
        .filter(
            (F.col("c_ts") > F.col("first_view"))
            & (F.col("c_ts") <= F.col("first_view") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id", "first_view")
        .agg(F.min("c_ts").alias("first_click"))
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    p = (
        c.join(purch, "user_id")
        .filter(
            (F.col("p_ts") > F.col("first_click"))
            & (F.col("p_ts") <= F.col("first_view") + F.expr("INTERVAL 24 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("p_ts").alias("first_purchase"))
    )
    nv = v.agg(F.count("*").alias("n_viewers"))
    nc = c.agg(F.count("*").alias("n_clicked"))
    np_ = p.agg(F.count("*").alias("n_purchased"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


_RATE_LIMIT_N = 5


@register(
    "events_rate_limit",
    sql=f"""
    WITH r AS (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN rn <= {_RATE_LIMIT_N} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN rn > {_RATE_LIMIT_N} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped
    FROM r GROUP BY user_id
    """,
    tags=("events", "ingest", "quota"),
)
def events_rate_limit(spark, sf_dir):
    """Per-user ingest rate limiting: keep the first {_RATE_LIMIT_N}
    events per (user, hour), report kept/dropped per user — the quota /
    throttle primitive every multi-tenant ingest runs in front of the
    expensive stages (dedup, scoring), deterministic via the
    (ts, event_id) total order.

    100 TB plan: ONE shuffle on user_id — the row_number window
    partitions by (user, hour) which user-partitioning co-locates, and
    the per-user rollup reuses the same exchange (AQE observes the
    sub-partitioning). Per-partition state is a counter per open hour
    bucket, nothing global."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id", F.date_trunc("hour", "ts")).orderBy(
        "ts", "event_id"
    )
    r = ev.select("user_id", "event_id", F.row_number().over(w).alias("rn"))
    return r.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("rn") <= _RATE_LIMIT_N, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > _RATE_LIMIT_N, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )


@register(
    "events_cumulative_distinct_users",
    sql=f"""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id),
    daily AS (
      SELECT first_day, COUNT(*) AS new_users FROM fs GROUP BY first_day)
    SELECT strftime(first_day, '%Y-%m-%d') AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily
    """,
    tags=("events", "window-agg", "distinct"),
)
def events_cumulative_distinct_users(spark, sf_dir):
    """Cumulative distinct users per day — the growth-curve query.
    COUNT(DISTINCT) OVER a growing window is not re-aggregable, so the
    scalable form is the first-seen decomposition: distinct collapses
    to MIN(first day) per user, the cumulative distinct count becomes a
    plain running SUM of daily first-seen counts.

    100 TB plan: one user-grain shuffle (map-side partial mins), one
    tiny day-grain rollup; the running sum's single-partition window
    touches #days rows only — bounded by the calendar, not the data."""
    ev = T(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = fs.groupBy("first_day").agg(F.count("*").alias("new_users"))
    w = W.orderBy("first_day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("first_day", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cum_users"),
    )


@register(
    "events_exact_quantiles",
    sql="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
    h AS (SELECT event_type, v, COUNT(*) AS c FROM q GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
        SUM(c) OVER (PARTITION BY event_type ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50_cents,
      MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END) AS p95_cents,
      MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99_cents
    FROM cum GROUP BY event_type
    """,
    tags=("events", "quantile", "stats"),
)
def events_exact_quantiles(spark, sf_dir):
    """EXACT per-type p50/p95/p99 of the event value — no global sort,
    no approx_percentile. Values are cents-quantized integers, so the
    per-type value histogram is bounded (≤ value-range cells, ~10^4
    here) regardless of event count; the quantile is read off the
    histogram's running sum. The same trick as quality_percentile_gate,
    per group: at 100 TB this is one shuffle to (type, cents) partials
    — map-side combine does nearly all the work — then window+argmin on
    the tiny histogram relation. approx_percentile trades accuracy for
    memory it doesn't need to here; the p99 of a latency/value column is
    exactly the row a monitoring pipeline pages on, so exact matters."""
    ev = T(spark, sf_dir, "events")
    q = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
    )
    h = q.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    cw = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    nw = W.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "v",
        F.sum("c").over(cw).alias("cum"),
        F.sum("c").over(nw).alias("n"),
    )
    def at(pct):
        k = F.expr(f"(n * {pct} + 99) div 100")
        return F.min(F.when(F.col("cum") >= k, F.col("v")))

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        at(50).alias("p50_cents"),
        at(95).alias("p95_cents"),
        at(99).alias("p99_cents"),
    )


@register(
    "streaming_quantiles_replay",
    sql="""
    WITH q AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events),
    h AS (SELECT event_type, v, COUNT(*) AS c FROM q GROUP BY event_type, v),
    cum AS (
      SELECT event_type, v, c,
        SUM(c) OVER (PARTITION BY event_type ORDER BY v
                     ROWS UNBOUNDED PRECEDING) AS cum,
        SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h)
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN v END) AS p50_cents,
      MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END) AS p95_cents,
      MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN v END) AS p99_cents
    FROM cum GROUP BY event_type
    """,
    tags=("streaming", "events", "quantile", "stats"),
)
def streaming_quantiles_replay(spark, sf_dir):
    """events_exact_quantiles maintained STREAMING-side: the event feed
    replays through foreachBatch, each micro-batch appends bounded
    (type, cents, count) histogram cells, and the exact p50/p95/p99 are
    read off the merged store — equal to the batch quantiles
    bit-for-bit because histogram cells are mergeable partials (the
    oracle is literally the batch SQL). This is how a 100 TB pipeline
    keeps an EXACT live p99 without re-scanning history: per-batch
    reduce is value-range-bounded, the store compacts by
    re-aggregation, nothing grows with event count."""
    import tempfile
    import uuid

    from ..streaming.events import (
        foreach_batch_value_hist_partials,
        read_events_stream,
    )

    base = tempfile.mkdtemp(prefix=f"qhist_{uuid.uuid4().hex[:8]}_")
    target, ck = f"{base}/partials", f"{base}/ck"
    q = foreach_batch_value_hist_partials(
        read_events_stream(spark, sf_dir), target, ck
    )
    q.awaitTermination()
    h = (
        spark.read.parquet(target)
        .groupBy("event_type", "v")
        .agg(F.sum("c").alias("c"))
    )
    cw = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    nw = W.partitionBy("event_type")
    cum = h.select(
        "event_type",
        "v",
        F.sum("c").over(cw).alias("cum"),
        F.sum("c").over(nw).alias("n"),
    )

    def at(pct):
        k = F.expr(f"(n * {pct} + 99) div 100")
        return F.min(F.when(F.col("cum") >= k, F.col("v")))

    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        at(50).alias("p50_cents"),
        at(95).alias("p95_cents"),
        at(99).alias("p99_cents"),
    )


@register(
    "events_gap_fill",
    sql=f"""
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS ht,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, MIN(ht) AS lo, MAX(ht) AS hi FROM h GROUP BY 1),
    grid AS (
      SELECT s.event_type, g.ht
      FROM span s CROSS JOIN LATERAL
        unnest(generate_series(s.lo, s.hi, INTERVAL 1 HOUR)) AS g(ht)),
    joined AS (
      SELECT g.event_type, g.ht, h.n, h.sum_value
      FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.ht = g.ht)
    SELECT event_type, strftime(ht, '{_DFMT}') AS hour_ts,
      COALESCE(n, 0) AS n,
      COALESCE(sum_value, 0.0) AS sum_value,
      last_value(sum_value IGNORE NULLS) OVER (
        PARTITION BY event_type ORDER BY ht ROWS UNBOUNDED PRECEDING)
        AS ffill_sum
    FROM joined
    """,
    tags=("events", "timeseries", "gap-fill", "window"),
)
def events_gap_fill(spark, sf_dir):
    """Time-series gap filling + forward fill: the dense hourly grid per
    event type (min..max observed hour), empty hours emitted as
    n=0/sum=0 with the LAST OBSERVED hourly sum carried forward — the
    resample('1H').ffill() a metrics pipeline runs before rate math,
    anomaly windows, or charting (a gap silently skewing a moving
    average is the classic monitoring bug).

    Distributed shape: the grid explodes from a 1-row-per-type span
    relation (never from the events), the left join is hash on
    (type, hour) at hourly grain — both sides tiny relative to the raw
    feed — and the forward fill is last(ignorenulls) over the same
    (type, hour) partitioning the join produced. Exact: hourly sums go
    through DECIMAL, the grid arithmetic is timestamp sequence in both
    engines."""
    ev = T(spark, sf_dir, "events")
    h = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("ht"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dsum("value").alias("sum_value"),
        )
    )
    span = h.groupBy("event_type").agg(F.min("ht").alias("lo"), F.max("ht").alias("hi"))
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("ht"),
    )
    g = grid.join(h, ["event_type", "ht"], "left")
    fw = (
        W.partitionBy("event_type")
        .orderBy("ht")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        "event_type",
        F.date_format("ht", _FMT).alias("hour_ts"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        F.last("sum_value", ignorenulls=True).over(fw).alias("ffill_sum"),
    )


@register(
    "events_markov_transitions",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type FROM ordered
      WHERE prev_type IS NOT NULL),
    c AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM pairs GROUP BY prev_type, next_type),
    tot AS (SELECT prev_type, SUM(n) AS row_n FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n AS DOUBLE) / t.row_n AS p
    FROM c JOIN tot t ON t.prev_type = c.prev_type
    """,
    tags=("events", "markov", "sessions", "window"),
)
def events_markov_transitions(spark, sf_dir):
    """Per-user event-type TRANSITION MATRIX — the first-order Markov
    chain over each user's time-ordered event stream (counts + row-
    normalized probabilities), the model behind next-action prediction,
    funnel-leak ranking, and bot detection (a user whose transition
    rows diverge from the corpus matrix is the anomaly signal).

    Shape: one window (lag over user_id, ordered by ts with event_id
    as the deterministic tie-break) = one shuffle on user_id, then a
    #types²-bounded aggregation — the reduce side is 25 rows here and
    constant at any corpus size. Probabilities are exact-integer count
    ratios, IEEE-identical across engines."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    c = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tw = W.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tw)).alias("p"),
    )


@register(
    "events_dau_wau_stickiness",
    sql="""
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
      FROM events),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY d),
    wau AS (
      SELECT days.d, CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
      FROM days JOIN du ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d)
    SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON wau.d = dau.d
    """,
    tags=("events", "analytics", "distinct", "window"),
)
def events_dau_wau_stickiness(spark, sf_dir):
    """DAU / WAU / stickiness (DAU÷WAU) per day — the product-analytics
    engagement row. Exact rolling-7-day distinct users WITHOUT a
    distinct-over-window (Spark doesn't support it and approximations
    drift): dedup once to the (day, user) activity relation — the only
    corpus-sized shuffle — then the WAU side is a bounded range join of
    the DAY GRID against activity (≤ 7× activity-relation fan-out,
    day-grain), re-deduped per anchor day. At 100 TB the activity
    relation is users×days — tiny next to raw events — and everything
    after the first dedup runs at that grain."""
    ev = T(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    wau = (
        days.alias("g")
        .join(
            du.alias("a"),
            F.col("a.d").between(F.date_sub(F.col("g.d"), 6), F.col("g.d")),
        )
        .groupBy(F.col("g.d").alias("d"))
        .agg(F.countDistinct("a.user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "streaming_markov_replay",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    pairs AS (
      SELECT prev_type, event_type AS next_type FROM ordered
      WHERE prev_type IS NOT NULL),
    c AS (SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM pairs GROUP BY prev_type, next_type),
    tot AS (SELECT prev_type, SUM(n) AS row_n FROM c GROUP BY prev_type)
    SELECT c.prev_type, c.next_type, c.n,
           CAST(c.n AS DOUBLE) / t.row_n AS p
    FROM c JOIN tot t ON t.prev_type = c.prev_type
    """,
    tags=("streaming", "events", "markov", "stateful", "pandas-udf"),
)
def streaming_markov_replay(spark, sf_dir):
    """events_markov_transitions maintained STREAMING-side through real
    per-user state: the feed replays through applyInPandasWithState
    (streaming/stateful.user_transition_pairs), which carries each
    user's LAST EVENT across micro-batches — the piece that makes
    transition counts exact under chunking (per-batch lag would drop
    every boundary-straddling transition; counts are NOT mergeable
    partials, which is precisely when custom state earns its keep over
    the foreachBatch-partials pattern). The emitted pair stream
    aggregates to the same matrix as the batch window, bit-for-bit —
    the oracle IS the batch SQL, and the multi-batch equivalence test
    splits the feed to force boundary carries."""
    import uuid

    from ..streaming.events import read_events_stream, run_available_now
    from ..streaming.stateful import user_transition_pairs

    stream = user_transition_pairs(read_events_stream(spark, sf_dir))
    name = "markov_" + uuid.uuid4().hex[:8]
    pairs = run_available_now(stream, name, mode="append")
    c = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tw = W.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(tw)).alias("p"),
    )


@register(
    "events_behavior_ngrams",
    sql="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LAG(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p1,
             LAG(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p2
      FROM events),
    tri AS (
      SELECT user_id, p2 || '>' || p1 || '>' || event_type AS trigram
      FROM ordered WHERE p2 IS NOT NULL)
    SELECT trigram, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tri GROUP BY trigram
    ORDER BY n DESC, trigram LIMIT 50
    """,
    tags=("events", "ngram", "sessions", "window"),
)
def events_behavior_ngrams(spark, sf_dir):
    """Behavioral event-type TRIGRAMS — the order-2 extension of the
    Markov matrix (events_markov_transitions): per-user time-ordered
    action motifs counted corpus-wide with their user support, the
    feature behind sequence-model pretraining data selection, funnel
    mining, and scripted-bot detection (a bot's top motifs have huge n
    over tiny n_users).

    Shape: ONE shuffle — both lag windows share the (user_id) partition
    and (ts, event_id) order, so Catalyst runs them in a single Window
    node over a single exchange; the trigram aggregation's reduce side
    is bounded by #types^3 (125 cells here), constant in corpus size,
    and n_users rides the same aggregation as a distinct count. Top-50
    is a TakeOrdered over the bounded relation — no global sort."""
    ev = T(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            "event_type",
            F.lag("event_type", 1).over(w).alias("p1"),
            F.lag("event_type", 2).over(w).alias("p2"),
        )
        .filter(F.col("p2").isNotNull())
        .select(
            "user_id",
            F.concat_ws(">", "p2", "p1", "event_type").alias("trigram"),
        )
    )
    return (
        tri.groupBy("trigram")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), F.asc("trigram"))
        .limit(50)
    )
