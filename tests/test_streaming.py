"""Structured Streaming tests (SURVEY.md §5.2(5)): replay the events
fixture via Trigger.AvailableNow and verify against batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.session import load_table
from chchfr_data_collection_spark.streaming.events import (
    dedup_latest_within_watermark,
    read_events_stream,
    run_available_now,
    tumbling_counts,
)


def test_streaming_tumbling_equals_batch(spark, sf_small):
    """The streamed watermarked tumbling agg must equal the batch
    groupBy-window over the same bounded input (no rows are late in a
    replay: watermark only drops rows behind the max seen ts)."""
    stream = tumbling_counts(read_events_stream(spark, sf_small))
    streamed = run_available_now(stream, "t_tumbling_test", mode="complete")

    ev = load_table(spark, sf_small, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    s = {(r.window_start, r.event_type): (r.n, round(r.sum_value, 6)) for r in streamed.collect()}
    b = {(r.window_start, r.event_type): (r.n, round(r.sum_value, 6)) for r in batch.collect()}
    assert s == b


def test_streaming_dedup_one_per_key(spark, sf_small):
    stream = dedup_latest_within_watermark(read_events_stream(spark, sf_small))
    out = run_available_now(stream, "t_dedup_test", mode="append")
    total = out.count()
    distinct_keys = out.select("user_id", "event_type").distinct().count()
    assert total == distinct_keys
    # every (user_id, event_type) present in the source survives exactly once
    src_keys = (
        load_table(spark, sf_small, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert distinct_keys == src_keys


def test_streaming_session_equals_batch(spark, sf_small):
    from chchfr_data_collection_spark.streaming.events import session_counts

    stream = session_counts(read_events_stream(spark, sf_small))
    streamed = run_available_now(stream, "t_session_test", mode="complete")
    ev = load_table(spark, sf_small, "events")
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    s = {(r.user_id, r.session_start, r.session_end): r.n_events for r in streamed.collect()}
    b = {(r.user_id, r.session_start, r.session_end): r.n_events for r in batch.collect()}
    assert s == b


def test_foreach_batch_upsert_idempotent(spark, sf_small, tmp_path):
    """The MERGE sink applies K2 semantics per micro-batch; replaying the
    same bounded stream twice (fresh checkpoint) converges to the same
    target state."""
    from chchfr_data_collection_spark.streaming.events import foreach_batch_upsert

    target = str(tmp_path / "target")
    for run in (1, 2):
        ckpt = str(tmp_path / f"ckpt{run}")
        dedup = dedup_latest_within_watermark(read_events_stream(spark, sf_small))
        foreach_batch_upsert(dedup, target, keys=["user_id", "event_type"], checkpoint=ckpt)
        n = spark.read.parquet(target).count()
        keys = (
            spark.read.parquet(target)
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        assert n == keys  # one row per key after merge


def test_stateful_user_stats_equals_batch(spark, sf_small):
    """applyInPandasWithState accumulator over a bounded replay equals the
    batch groupBy aggregate (single batch -> final state = totals)."""
    from chchfr_data_collection_spark.streaming.stateful import running_user_stats

    stream = running_user_stats(read_events_stream(spark, sf_small))
    out = run_available_now(stream, "t_stateful_test", mode="update")
    ev = load_table(spark, sf_small, "events")
    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
    )
    s = {
        r.user_id: (r.n_events, round(r.sum_value, 6), r.n_errors)
        for r in out.collect()
    }
    b = {
        r.user_id: (r.n_events, round(r.sum_value, 6), r.n_errors)
        for r in batch.collect()
    }
    assert s == b


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Real late-data semantics across restarts: three AvailableNow runs
    sharing one checkpoint (the watermark persists in the checkpoint, so
    each run is a genuine later micro-batch).

    Run 1 (row at 12:00) advances the watermark to 10:00. Run 2 delivers
    a too-late row (07:00 — its window closed before the watermark:
    DROPPED) and a late-but-inside-horizon row (11:30: KEPT). Run 3
    (15:00) pushes the watermark past the open windows so append mode
    flushes them — the output must contain the 11:00 window with n=1 and
    no 07:00 window at all."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_path / "events_src"
    src.mkdir()
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"{name}.parquet")
        )

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .parquet(str(src / "*.parquet"))
            .withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_batch([(1, base, 1, "click", 1.0, "{}")], "b1")
    run_once()
    write_batch(
        [
            (2, base - dt.timedelta(hours=5), 1, "click", 1.0, "{}"),   # too late
            (3, base - dt.timedelta(minutes=30), 1, "click", 1.0, "{}"),  # in horizon
        ],
        "b2",
    )
    run_once()
    write_batch([(4, base + dt.timedelta(hours=3), 1, "click", 1.0, "{}")], "b3")
    run_once()

    got = {str(r.ws): r.n for r in spark.read.parquet(out).collect()}
    assert got.get("2026-01-01 11:00:00") == 1   # late-but-valid row kept
    assert got.get("2026-01-01 12:00:00") == 1
    assert "2026-01-01 07:00:00" not in got      # too-late row dropped


def test_streaming_interval_join_equals_batch(spark, sf_small):
    """Stream-stream interval join on a bounded replay equals the batch
    interval join (no state eviction can fire mid-replay that would not
    also fire in batch: all rows are within the watermark at end)."""
    from chchfr_data_collection_spark.streaming.events import (
        interval_join_clicks_before_errors,
    )

    ev_stream = read_events_stream(spark, sf_small)
    errors_s = ev_stream.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks_s = ev_stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id"), F.col("ts").alias("click_ts")
    )
    streamed = run_available_now(
        interval_join_clicks_before_errors(errors_s, clicks_s),
        "t_ivjoin_test",
        mode="append",
    )

    ev = load_table(spark, sf_small, "events")
    errors_b = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("eu"), F.col("ts").alias("error_ts")
    )
    clicks_b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("click_ts")
    )
    batch = errors_b.join(
        clicks_b,
        (F.col("eu") == F.col("cu"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("click_ts") <= F.col("error_ts")),
    )
    s = {(r.event_id, r.click_ts) for r in streamed.collect()}
    b = {(r.event_id, r.click_ts) for r in batch.collect()}
    assert s == b


def test_streaming_ivf_assign_equals_batch(spark, sf_small):
    """The streamed IVF insert path (foreachBatch assignment into a
    cent_id-partitioned index) equals the batch assignment of the whole
    table: per-row argmax against a static dim is batch-boundary- and
    order-independent."""
    from chchfr_data_collection_spark.queries import catalog
    from chchfr_data_collection_spark.streaming.embeddings import (
        ivf_assign,
        ivf_centroids,
    )

    streamed = catalog()["streaming_ivf_assign_replay"].fn(spark, sf_small)
    batch = ivf_assign(
        load_table(spark, sf_small, "embeddings"), ivf_centroids(spark, sf_small)
    )
    s = {(r.vec_id, r.cent_id, r.cos_c) for r in streamed.collect()}
    b = {(r.vec_id, r.cent_id, r.cos_c) for r in batch.collect()}
    assert s == b
    # every vector assigned exactly once
    assert len({v for v, _, _ in s}) == len(s)


def test_streaming_static_enrich_equals_batch(spark, sf_small):
    from chchfr_data_collection_spark.queries import catalog

    streamed = catalog()["streaming_static_enrich_replay"].fn(spark, sf_small)
    ev = load_table(spark, sf_small, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("lifetime_events"))
    batch = ev.join(dim, "user_id").select(
        "event_id", "user_id", "event_type", "lifetime_events"
    )
    s = {(r.event_id, r.lifetime_events) for r in streamed.collect()}
    b = {(r.event_id, r.lifetime_events) for r in batch.collect()}
    assert s == b


def test_transform_with_state_plan_constructs(spark, sf_small):
    """Spark 4 state API v2 (transformWithStateInPandas): the operator
    builds a valid streaming plan; execution needs protobuf (absent in
    this container), so the replay-equals-batch check runs only where
    the runtime protocol is available."""
    from chchfr_data_collection_spark.streaming.stateful import (
        running_user_extremes_tws,
        transform_with_state_available,
    )

    stream = running_user_extremes_tws(read_events_stream(spark, sf_small))
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        "user_id", "min_value", "max_value", "n_events",
    ]

    if not transform_with_state_available():
        import pytest

        pytest.skip("google.protobuf absent: transformWithState runtime unavailable")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = run_available_now(stream, "t_tws_extremes", mode="update")
    ev = load_table(spark, sf_small, "events")
    batch = ev.groupBy("user_id").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count("*").alias("n_events"),
    )
    s = {r.user_id: (r.min_value, r.max_value, r.n_events) for r in out.collect()}
    b = {r.user_id: (r.min_value, r.max_value, r.n_events) for r in batch.collect()}
    assert s == b


def test_streaming_pq_encode_equals_batch(spark, sf_small):
    """The streamed PQ insert path (foreachBatch encode into the code
    table) equals the batch encode of the whole table: per-row argmin
    against a static codebook is batch-boundary- and order-independent;
    every vector gets exactly PQ_M codes."""
    from chchfr_data_collection_spark.queries import catalog
    from chchfr_data_collection_spark.streaming.embeddings import (
        PQ_M,
        pq_codebook,
        pq_encode,
    )

    streamed = catalog()["streaming_pq_encode_replay"].fn(spark, sf_small)
    batch = pq_encode(
        load_table(spark, sf_small, "embeddings"), pq_codebook(spark, sf_small)
    )
    s = {(r.vec_id, r.j, r.code) for r in streamed.collect()}
    b = {(r.vec_id, r.j, r.code) for r in batch.collect()}
    assert s == b
    per_vec = {}
    for v, j, _ in s:
        per_vec.setdefault(v, set()).add(j)
    assert all(js == set(range(PQ_M)) for js in per_vec.values())


def test_streaming_trending_equals_batch(spark, sf_small):
    """The replayed top-25 must equal the batch word count's top-25
    bit-for-bit — count partials are batch-boundary independent."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from chchfr_data_collection_spark.queries import catalog

    got = catalog()["streaming_topk_trending_replay"].fn(spark, sf_small).collect()
    rw = W.orderBy(F.desc("c"), F.asc("word"))
    want = (
        spark.read.parquet(f"{sf_small}/documents.parquet")
        .select(F.explode(F.split("text", " ", -1)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("c"))
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= 25)
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_streaming_quantiles_equals_batch(spark, sf_small):
    """Replayed exact quantiles must equal the batch query bit-for-bit
    — histogram cells are batch-boundary-independent partials."""
    from chchfr_data_collection_spark.queries import catalog

    cat = catalog()
    got = sorted(map(tuple, cat["streaming_quantiles_replay"].fn(spark, sf_small).collect()))
    want = sorted(map(tuple, cat["events_exact_quantiles"].fn(spark, sf_small).collect()))
    assert got == want


def test_streaming_markov_multibatch_boundary_carry(spark, sf_small, tmp_path):
    """Split the feed into 3 time-ordered files streamed one per
    micro-batch: the stateful pair emitter must carry each user's last
    event across batches, so the aggregated transition counts equal the
    batch lag() computation EXACTLY (per-batch lag would lose every
    boundary-straddling transition — assert the split really creates
    some)."""
    import uuid

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from chchfr_data_collection_spark.streaming.stateful import user_transition_pairs

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    n = ev.count()
    ordered = ev.orderBy("ts", "event_id")
    import glob
    import shutil

    land = tmp_path / "markovland"
    land.mkdir()
    parts = [
        ordered.limit(n // 3),
        ordered.offset(n // 3).limit(n // 3),
        ordered.offset(2 * (n // 3)),
    ]
    for i, p in enumerate(parts):
        tmp = tmp_path / f"part{i}"
        p.coalesce(1).write.parquet(str(tmp))
        (src,) = glob.glob(str(tmp / "part-*.parquet"))
        shutil.copy(src, land / f"b{i}.parquet")
    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
    )
    name = "markov_t_" + uuid.uuid4().hex[:8]
    q = (
        user_transition_pairs(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(q.recentProgress) >= 3
    got = {
        (r.prev_type, r.next_type): r.n
        for r in spark.sql(
            f"SELECT prev_type, next_type, COUNT(*) AS n FROM {name} GROUP BY 1, 2"
        ).collect()
    }
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    want = {
        (r.prev_type, r.next_type): r.n
        for r in ev.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # the split really straddles users: batch 1 and 2 share users
    import pyarrow.parquet as pq

    u0 = set(pq.read_table(str(land / "b0.parquet"), columns=["user_id"]).column("user_id").to_pylist())
    u1 = set(pq.read_table(str(land / "b1.parquet"), columns=["user_id"]).column("user_id").to_pylist())
    assert u0 & u1, "split must force cross-batch state carries"


def test_foreach_batch_partials_retry_idempotent(spark, sf_small, tmp_path):
    """A foreachBatch RETRY of an already-landed micro-batch (driver
    failure before the checkpoint commit) must REPLACE its partials,
    not append a second copy. Simulated by re-running the sink with the
    checkpoint wiped: availableNow restarts from batch_id 0 over the
    same feed, so every batch replays — with the batch_id-partitioned
    dynamic overwrite the merged counts are unchanged; with a plain
    append they would exactly double."""
    import shutil

    from chchfr_data_collection_spark.streaming.documents import (
        foreach_batch_word_count_partials,
        read_documents_stream,
    )

    target = str(tmp_path / "partials")
    ck = str(tmp_path / "ck")
    foreach_batch_word_count_partials(
        read_documents_stream(spark, sf_small), target, ck
    ).awaitTermination()

    def merged():
        return {
            r.word: r.c
            for r in spark.read.parquet(target)
            .groupBy("word")
            .agg(F.sum("c").alias("c"))
            .collect()
        }

    first = merged()
    assert first, "sink landed no partials"
    shutil.rmtree(ck)  # lose the commit log -> full replay, same ids
    foreach_batch_word_count_partials(
        read_documents_stream(spark, sf_small), target, ck
    ).awaitTermination()
    assert merged() == first


def test_markov_out_of_order_batch_deterministic(spark, tmp_path):
    """A micro-batch containing an event OLDER than the carried tail
    (out-of-order arrival across batches) is handled DETERMINISTICALLY:
    the carried event merges into the (ts, event_id) sort — it does not
    blindly prepend — and the stored tail stays the true maximum, so
    state never moves backwards. (Exactness under late arrival is
    impossible in append mode without retraction; this pins the
    documented degradation.)"""
    import glob
    import shutil
    import uuid

    from pyspark.sql import types as T

    from chchfr_data_collection_spark.streaming.stateful import user_transition_pairs

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    import datetime as dt

    def t(s):
        return dt.datetime(2026, 1, 1, 0, 0, s)

    batches = [
        [(1, 7, "A", t(1), 0.0), (3, 7, "C", t(3), 0.0)],
        # B arrives LATE: older than the carried tail C
        [(2, 7, "B", t(2), 0.0), (4, 7, "D", t(4), 0.0)],
        [(5, 7, "E", t(5), 0.0)],
    ]
    land = tmp_path / "land"
    land.mkdir()
    for i, rows in enumerate(batches):
        tmp = tmp_path / f"part{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(tmp))
        (src,) = glob.glob(str(tmp / "part-*.parquet"))
        shutil.copy(src, land / f"b{i}.parquet")
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
    )
    name = "markov_ooo_" + uuid.uuid4().hex[:8]
    q = (
        user_transition_pairs(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.prev_type, r.next_type)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    # batch1: (A,C); batch2 merged-sort [B,C,D]: (B,C),(C,D) — the late
    # B pairs by true time order, and the tail D (not B) carries to
    # batch3: (D,E). A blind prepend would have emitted (C,B),(B,D).
    assert got == sorted([("A", "C"), ("B", "C"), ("C", "D"), ("D", "E")])


def test_streaming_minhash_multibatch_equals_oneshot(spark, sf_small, tmp_path):
    """The delta feed split into two files streamed one per micro-batch
    probes the EVOLVING persisted MinHash index; the batch_id-partitioned
    pair store's union must equal the one-shot incremental probe (pairs
    across the file boundary surface when the later endpoint lands)."""
    import glob
    import shutil

    from chchfr_data_collection_spark.operators.minhash_index import MinHashIndex
    from chchfr_data_collection_spark.queries.llm import dedup_minhash_incremental
    from chchfr_data_collection_spark.streaming.documents import (
        DOCUMENTS_SCHEMA,
        foreach_batch_minhash_probe,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    landed = docs.filter(F.col("doc_id") % 4 != 0)
    land = tmp_path / "feed"
    land.mkdir()
    for i, part in enumerate(
        [docs.filter(F.col("doc_id") % 8 == 0), docs.filter(F.col("doc_id") % 8 == 4)]
    ):
        tmp = tmp_path / f"part{i}"
        part.coalesce(1).write.parquet(str(tmp))
        (src,) = glob.glob(str(tmp / "part-*.parquet"))
        shutil.copy(src, land / f"b{i}.parquet")
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(landed)
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(land))
    )
    pairs, ck = str(tmp_path / "pairs"), str(tmp_path / "ck")
    q = foreach_batch_minhash_probe(stream, idx, pairs, ck)
    q.awaitTermination()
    assert len(q.recentProgress) >= 2
    got = {
        (r.da, r.db, round(r.jaccard, 12))
        for r in spark.read.parquet(pairs).collect()
    }
    want = {
        (r.da, r.db, round(r.jaccard, 12))
        for r in dedup_minhash_incremental(spark, sf_small).collect()
    }
    assert got == want and got
