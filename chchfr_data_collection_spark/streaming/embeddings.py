"""Streaming embedding ingest: the IVF index's INSERT path.

A 100 TB pipeline trains centroids once (embedding_centroids /
similarity_ivf_ann's fixed seed set) and then keeps the index current as
new crawl batches land: every arriving vector is assigned to its nearest
centroid and appended to that cell's inverted list. This module streams
the embeddings fixture through Structured Streaming and runs exactly
that maintenance loop — `foreachBatch` + the batch assignment operator,
appending parquet PARTITIONED BY the centroid id, so the landed layout
IS the inverted-file index (a probe for cell c reads only `cent_id=c/`,
partition pruning does the list lookup).

foreachBatch rather than a streaming aggregation because assignment is a
per-row argmax over a tiny static centroid set: each micro-batch is a
plain batch frame, the centroid side broadcasts, and a window argmax
needs no cross-batch state at all — the stateless-maintenance shape that
scales with arrival rate, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ..functions import vectors as V

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the embeddings fixture through the parquet file source —
    the stand-in for a crawl feed's embedding stage output."""
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )


def ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fixed centroid set (same convention as similarity_ivf_ann:
    the vec_id < 8 seed vectors), quantized, as a broadcastable dim."""
    from ..session import load_table

    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("cent_id"),
            V.quantize("embedding").alias("cv"),
            V.dot_exact("embedding", "embedding").alias("cn2"),
        )
    )


def ivf_assign(batch: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment of a batch of vectors: broadcast the
    centroid dim, exact int64-quantized cosine, window argmax with the
    asc-cent_id tie-break — identical arithmetic to similarity_ivf_ann's
    assignment stage, so the streamed index equals the batch-built one."""
    emb = batch.select(
        "vec_id",
        V.quantize("embedding").alias("qv"),
        V.dot_exact("embedding", "embedding").alias("n2"),
    )
    dotvc = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    cosvc = dotvc.cast("double") / (
        F.sqrt(F.col("n2").cast("double")) * F.sqrt(F.col("cn2").cast("double"))
    )
    aw = W.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cent_id"))
    return (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "cent_id", cosvc.alias("cos_c"))
        .withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id", "cos_c")
    )


def foreach_batch_ivf_assign(
    stream_df: DataFrame,
    cent: DataFrame,
    target_path: str,
    checkpoint: str,
):
    """Run the IVF insert path over a stream: per micro-batch, assign
    vectors to centroids and append to the index, partitioned by cell.

    Append is safe under replay at the file level (a re-delivered batch
    re-appends; production pairs this with the export sink's batch-id
    manifest or an upsert target — here the AvailableNow replay delivers
    each batch once and the equivalence test pins the result)."""

    def _assign_and_append(batch: DataFrame, batch_id: int) -> None:
        (
            ivf_assign(batch, cent)
            .write.mode("append")
            .partitionBy("cent_id")
            .parquet(target_path)
        )

    return (
        stream_df.writeStream.foreachBatch(_assign_and_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# -------------------------------------------------- PQ encode (insert path)

PQ_M = 16
PQ_DIM = 4
PQ_C = 16


def pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic PQ codebook (same convention as
    queries.llm.similarity_pq_adc: the first PQ_C vectors' quantized
    subvectors), one row per (cent_id), carrying the full quantized
    vector — subspace slicing happens in the encoder so the dim stays
    one broadcastable row per centroid."""
    from ..session import load_table

    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < PQ_C)
        .select(F.col("vec_id").alias("cent_id"), V.quantize("embedding").alias("cv"))
    )


def pq_encode(batch: DataFrame, cent: DataFrame) -> DataFrame:
    """Encode a batch of vectors to PQ codes: per subspace, the nearest
    sub-centroid by integer-exact quantized L2 (asc-cent_id tie-break) —
    identical arithmetic to similarity_pq_adc's encode stage, so the
    streamed code table equals the batch-built one bit-for-bit."""

    def sub_d2(j):
        return F.aggregate(
            F.zip_with(
                F.slice(F.col("qv"), j * PQ_DIM + 1, PQ_DIM),
                F.slice(F.col("cv"), j * PQ_DIM + 1, PQ_DIM),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0).cast("bigint"),
            lambda a, v: a + v,
        )

    sd = (
        batch.select("vec_id", V.quantize("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cent_id",
            F.posexplode(F.array(*[sub_d2(j) for j in range(PQ_M)])).alias("j", "d2"),
        )
    )
    wcode = W.partitionBy("vec_id", "j").orderBy("d2", "cent_id")
    return (
        sd.withColumn("rn", F.row_number().over(wcode))
        .filter(F.col("rn") == 1)
        .select("vec_id", "j", F.col("cent_id").alias("code"))
    )


def foreach_batch_pq_encode(
    stream_df: DataFrame,
    cent: DataFrame,
    target_path: str,
    checkpoint: str,
):
    """Run the PQ insert path over a stream: per micro-batch, encode
    arriving vectors to codes and append to the compressed index — the
    16x-smaller table similarity_pq_adc serves from. Same replay story
    as foreach_batch_ivf_assign (per-row encode vs a static dim)."""

    def _encode_and_append(batch: DataFrame, batch_id: int) -> None:
        pq_encode(batch, cent).write.mode("append").parquet(target_path)

    return (
        stream_df.writeStream.foreachBatch(_encode_and_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
