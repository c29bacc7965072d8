"""Maintenance UNDER ingest (round-14 verdict, next #4): every
lifecycle op is lease-fenced in isolation, but production runs
`compact()` / `expire()` WHILE a foreachBatch stream delivers to the
same store. These tests force multi-batch streams (maxFilesPerTrigger=1
over a multi-file landing) and run a TIERED fold and an expire from
inside the micro-batch callback — i.e., between deliveries — then pin:

- IvfAssignmentStore: the final serving rows equal the batch twin of
  the retained window, and a full checkpoint-wipe REPLAY afterwards
  resurrects nothing — folded batches drop on the redelivery ledger
  gate, the replay's own mid-stream fold re-tiers harmlessly, and the
  expired window stays expired (monotone floor).
- MinHashIndex: the per-batch pair union with a mid-stream tiered fold
  equals the one-shot incremental probe (folds never change rows), an
  expire of the generation between micro-batches retires exactly the
  folded corpus while the last batch keeps serving, and a replay that
  redelivers a FOLDED delta fails FAST on the fold tombstone (this
  store's documented no-silent-resurrection gate) leaving the store
  unchanged.
"""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.minhash_index import MinHashIndex
from chchfr_data_collection_spark.streaming.documents import DOCUMENTS_SCHEMA
from chchfr_data_collection_spark.streaming.embeddings import (
    EMBEDDINGS_SCHEMA,
    IvfAssignmentStore,
    ivf_assign,
    ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _one_file_feed(tmp_path, parts, name="feed"):
    """Write each part as ONE parquet file into a landing dir — with
    maxFilesPerTrigger=1 each file is its own micro-batch."""
    land = tmp_path / name
    land.mkdir()
    for i, part in enumerate(parts):
        stage = tmp_path / f"{name}_part{i}"
        part.coalesce(1).write.parquet(str(stage))
        (src,) = glob.glob(str(stage / "part-*.parquet"))
        shutil.copy(src, land / f"b{i}.parquet")
    return str(land)


def test_ivf_fold_and_expire_between_microbatches(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = ivf_centroids(spark, SF_DIR)
    bounds = [0, 125, 250, 375, 10**9]
    parts = [
        emb.filter(
            (F.col("vec_id") >= bounds[i]) & (F.col("vec_id") < bounds[i + 1])
        )
        for i in range(4)
    ]
    land = _one_file_feed(tmp_path, parts)
    store = IvfAssignmentStore(spark, str(tmp_path / "ivf"))

    def cb(batch, bid):
        s = IvfAssignmentStore(batch.sparkSession, store.base_path)
        s.append_batch(ivf_assign(batch, cent), bid)
        if bid == 1:
            # tiered fold of the landed prefix, between deliveries
            r = s.compact(merge_ratio=None)
            assert r["compacted"] is True
        if bid == 2:
            # retention retires the folded generation whole
            s.expire(before_batch=2)

    def run(ck):
        stream = (
            spark.readStream.schema(EMBEDDINGS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(land)
        )
        q = (
            stream.writeStream.foreachBatch(cb)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(q.recentProgress) >= 4

    run(str(tmp_path / "ck"))
    got = {(r.vec_id, r.cent_id) for r in store.read().collect()}
    want = {
        (r.vec_id, r.cent_id)
        for r in ivf_assign(
            emb.filter(F.col("vec_id") >= bounds[2]), cent
        ).collect()
    }
    assert got == want, "stream with mid-flight fold+expire != batch twin"

    # checkpoint-wipe replay: every batch redelivers; folded batches
    # drop on the ledger gate, the expired window stays expired, the
    # replay's own bid==1 fold re-tiers the retained batches — rows
    # identical, nothing resurrected
    shutil.rmtree(str(tmp_path / "ck"))
    run(str(tmp_path / "ck"))
    again = {(r.vec_id, r.cent_id) for r in store.read().collect()}
    assert again == want, "replay resurrected folded/expired rows"
    low_ids = {r.vec_id for r in parts[0].union(parts[1]).collect()}
    assert not ({v for v, _ in again} & low_ids), (
        "expired batches' vectors re-entered via the replay"
    )


def test_minhash_fold_and_expire_between_microbatches(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    landed = docs.filter(F.col("doc_id") % 4 != 0)
    parts = [
        docs.filter(F.col("doc_id") % 12 == 0),
        docs.filter(F.col("doc_id") % 12 == 4),
        docs.filter(F.col("doc_id") % 12 == 8),
    ]
    land = _one_file_feed(tmp_path, parts, name="docfeed")

    # reference: the same chunking probed against an evolving index
    # with NO maintenance — folds must not change what the pairs are
    ref = MinHashIndex(spark, str(tmp_path / "ref"))
    ref.bootstrap(landed)
    want_pairs = set()
    for i, p in enumerate(parts):
        want_pairs |= {
            (r.da, r.db, round(r.jaccard, 12))
            for r in ref.probe_and_insert(p, delta_id=f"r{i}").collect()
        }

    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(landed)
    state: dict = {}

    def cb(batch, bid):
        did = f"b{bid:06d}"
        pairs = idx.probe_and_insert(batch, delta_id=did, materialize=False)
        (
            pairs.withColumn("batch_id", F.lit(bid).cast("bigint"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(str(tmp_path / "pairs"))
        )
        idx.finalize_delta(did)
        if bid == 1:
            # tiered fold between deliveries: bootstrap + b0 + b1
            r = idx.compact(merge_ratio=None)
            assert r["postings"]["compacted"] is True
            state["gen"] = r["generation"]
        if bid == 2:
            # retention retires the folded generation whole, between
            # deliveries — the last batch keeps serving
            idx.expire([state["gen"]])

    def run(ck):
        stream = (
            spark.readStream.schema(DOCUMENTS_SCHEMA)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(land)
        )
        q = (
            stream.writeStream.foreachBatch(cb)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ck"))
    got_pairs = {
        (r.da, r.db, round(r.jaccard, 12))
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    assert got_pairs == want_pairs and got_pairs, (
        "mid-stream fold changed the probed pairs"
    )
    # the expire retired the folded corpus (bootstrap, b0, b1); the
    # post-expire delivery is what serves
    served = {
        r.doc_id
        for r in idx._read_relation("arrays").select("doc_id").collect()
    }
    b2_ids = {
        r.doc_id
        for r in parts[2]
        .filter(F.size(F.split("text", " ", -1)) >= 3)
        .collect()
    }
    assert served == b2_ids, "expire between micro-batches missed"

    # replay after a fold: the redelivered FOLDED delta fails FAST on
    # the fold tombstone — this store's no-silent-resurrection gate
    # (the batch stores drop silently; the index refuses loudly) —
    # and the failed replay leaves the store unchanged
    shutil.rmtree(str(tmp_path / "ck"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="already compacted"):
        run(str(tmp_path / "ck2"))
    after = {
        r.doc_id
        for r in idx._read_relation("arrays").select("doc_id").collect()
    }
    assert after == served, "failed replay mutated the store"
