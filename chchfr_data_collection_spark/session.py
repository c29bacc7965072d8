"""SparkSession factory tuned for both local testing and cluster scale.

Local runs use ``local[N]`` with shuffle partitions ≈ cores; on a real
cluster the same builder works unchanged — AQE re-plans shuffle
partitioning at runtime, so the static number only sets the pre-AQE
ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "chchfr_data_collection_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    - AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
      join-strategy demotion) — this is what makes one set of configs
      survive a 1000× scale-up.
    - Session timezone pinned to UTC so timestamp semantics match the
      naive-UTC parquet fixtures (and the DuckDB oracle).
    - Arrow enabled for the pandas-UDF slow path.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one fixture table, normalizing engine-specific gotchas.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    generations and TIMESTAMP(MICROS) in others, so the loader dispatches
    on the schema Spark actually infers rather than assuming a physical
    type (a hard-coded assumption here silently broke when the fixtures
    flipped). Session timezone is pinned to UTC so naive-UTC fixture
    timestamps keep their face value.

    The returned LAZY DataFrame is memoized per (session, sf_dir,
    table): `spark.read.parquet` pays a driver-side footer/schema
    inference pass (~0.2 s) on every call, and a typical catalog entry
    loads 1-4 tables per invocation — measured this round, that was
    ~10% of the whole headline bench in schema re-inference alone.
    This caches only the UNEVALUATED plan (the exact object a fresh
    read would return): every action still scans the parquet, so no
    result or data is ever reused across runs. Fixture tables are
    immutable for the life of a session, which is what makes the memo
    sound. Keyed on the SESSION OBJECT (weakly), not applicationId:
    `spark.newSession()` shares one context/applicationId but carries
    its own session state (confs, timezone), and a plan built under one
    session must not serve another (round-15 ADVICE, low). Dead
    sessions fall out of the WeakKeyDictionary automatically.
    """
    per_session = _TABLE_PLAN_CACHE.get(spark)
    if per_session is None:
        per_session = _TABLE_PLAN_CACHE[spark] = {}
    key = (sf_dir, name)
    hit = per_session.get(key)
    if hit is not None:
        return hit
    if name == "events":
        df = _load_events(spark, f"{sf_dir}/{name}.parquet")
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if len(per_session) >= 64:
        per_session.clear()
    per_session[key] = df
    return df


from weakref import WeakKeyDictionary as _WeakKeyDictionary  # noqa: E402

_TABLE_PLAN_CACHE: _WeakKeyDictionary = _WeakKeyDictionary()


_EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def _load_events(spark: SparkSession, path: str):
    """Load events with ``ts`` normalized to microsecond TimestampType.

    Three physical layouts are handled:
    - TIMESTAMP(MICROS) / TIMESTAMP_NTZ → cast to session-TZ TimestampType
      (UTC-pinned, so this is a relabel, not a wall-clock shift);
    - INT64 nanos already surfaced as LongType (legacy conf active) →
      floor-divide to micros, same truncation DuckDB applies;
    - TIMESTAMP(NANOS), which Spark cannot infer without the legacy
      ``nanosAsLong`` conf → enable it (fallback only; the conf is a
      no-op for non-NANOS parquet, so later micros reads are unaffected)
      and take the LongType path.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) parquet is unreadable without the legacy conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df.select(*_EVENTS_COLS)


def parallelize_scan(df, min_factor: float = 0.5):
    """Give a compute-bound stage full parallelism after a low-parallelism scan.

    Small/single-row-group parquet files scan as 1 task, which serializes
    any expensive per-row work (shingling, quantization, regex) onto one
    core. If the scan yields fewer partitions than `min_factor` × the
    default parallelism, round-robin repartition to the default
    parallelism — a tiny shuffle that unlocks every core. On a real
    cluster reading 100 TB the scan already has >> cores partitions, so
    this is a structural no-op there (no extra shuffle in the plan).

    Catalyst pushes filters and column pruning below RepartitionByExpression,
    so predicate pushdown to the parquet scan is unaffected.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target * min_factor:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict:
    """Read every fixture table from ``sf_dir`` as a DataFrame."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each fixture table as a temp view named after itself."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
