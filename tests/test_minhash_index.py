"""Persisted-MinHash-index incremental dedup (round-5 verdict item 2):
the probe result equals the from-scratch banded run restricted to
delta-touching pairs, replaying the delta in sub-batches yields the
same union, and inserts are appends (no index rewrite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.minhash_index import MinHashIndex
from chchfr_data_collection_spark.queries.llm import (
    dedup_minhash_banded,
    dedup_minhash_incremental,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _pairs(df):
    return {(r.da, r.db, round(r.jaccard, 12)) for r in df.collect()}


def test_incremental_equals_batch_restriction(spark):
    """The catalog entry == the full banded run filtered to pairs with
    >= 1 delta endpoint (the oracle's definition), exact jaccard and
    all."""
    inc = _pairs(dedup_minhash_incremental(spark, SF_DIR))
    full = dedup_minhash_banded(spark, SF_DIR).filter(
        (F.col("da") % 4 == 0) | (F.col("db") % 4 == 0)
    )
    assert inc == _pairs(full)
    assert inc, "fixture produced no delta-touching near-dup pairs"


def test_two_batch_replay_equals_single_probe(spark, tmp_path):
    """Splitting the delta into two sub-batches probed against the
    EVOLVING index finds the same union of pairs as one probe: pairs
    across the sub-batch boundary surface when the second endpoint
    lands (the index already holds the first)."""
    docs = _docs(spark)
    landed = docs.filter(F.col("doc_id") % 4 != 0)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(landed)
    p1 = _pairs(idx.probe_and_insert(docs.filter(F.col("doc_id") % 8 == 0)))
    p2 = _pairs(idx.probe_and_insert(docs.filter(F.col("doc_id") % 8 == 4)))
    single = _pairs(dedup_minhash_incremental(spark, SF_DIR))
    assert p1 | p2 == single
    # a pair inside sub-batch 1 is found at probe 1, not re-emitted at
    # probe 2 (probe work is delta-bounded)
    assert not {p for p in p2 if p[0] % 8 == 0 and p[1] % 8 == 0}


def test_insert_is_append_only(spark, tmp_path):
    """probe_and_insert grows the index by exactly the delta's rows and
    never rewrites landed files (in-place update contract)."""
    docs = _docs(spark)
    landed = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(landed)
    before_files = set((tmp_path / "idx").rglob("*.parquet"))
    arrays_before = spark.read.parquet(idx.arrays_path).count()
    idx.probe_and_insert(delta).count()
    after_files = set((tmp_path / "idx").rglob("*.parquet"))
    assert before_files <= after_files, "bootstrap files were rewritten"
    arrays_after = spark.read.parquet(idx.arrays_path).count()
    n_delta = delta.filter(F.size(F.split("text", " ", -1)) >= 3).count()
    assert arrays_after - arrays_before == n_delta


def test_probe_result_is_stable_snapshot(spark, tmp_path):
    """The returned pairs are a materialized snapshot: collecting them
    AFTER a later insert yields the same set (a lazy plan would re-read
    postings/ and pick up the later delta's buckets — the round-6
    review finding), and no persisted RDD outlives the call."""
    sc = spark.sparkContext
    docs = _docs(spark)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(docs.filter(F.col("doc_id") % 4 != 0))
    persisted_before = sc._jsc.getPersistentRDDs().size()
    probe1 = idx.probe_and_insert(docs.filter(F.col("doc_id") % 8 == 0))
    assert sc._jsc.getPersistentRDDs().size() == persisted_before, (
        "probe_and_insert leaked a persisted handle"
    )
    first = _pairs(probe1)
    idx.probe_and_insert(docs.filter(F.col("doc_id") % 8 == 4))
    assert _pairs(probe1) == first, (
        "probe result drifted after a subsequent insert"
    )


def test_probe_zero_pairs_reads_back_empty(spark, tmp_path):
    """A probe that verifies no pairs still returns a well-formed empty
    frame (the pairs store has no partition to infer a schema from —
    the explicit read schema covers it)."""
    docs = _docs(spark)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(docs.filter(F.col("doc_id") % 4 != 0))
    lone = docs.filter(F.col("doc_id") == -1)  # empty delta
    out = idx.probe_and_insert(lone)
    assert out.columns == ["da", "db", "jaccard"]
    assert out.count() == 0


def test_probe_retry_same_delta_id_idempotent(spark, tmp_path):
    """Re-landing the SAME delta_id (a retried probe after a mid-insert
    failure) replaces the delta's partitions instead of duplicating
    them: index row counts and the verified pair set are unchanged, and
    bucket sizes don't creep toward the cap."""
    docs = _docs(spark)
    landed = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.bootstrap(landed)
    p1 = _pairs(idx.probe_and_insert(delta, delta_id="crawl-2026-08-14"))
    arrays_1 = spark.read.parquet(idx.arrays_path).count()
    postings_1 = spark.read.parquet(idx.postings_path).count()
    p2 = _pairs(idx.probe_and_insert(delta, delta_id="crawl-2026-08-14"))
    assert p2 == p1
    assert spark.read.parquet(idx.arrays_path).count() == arrays_1
    assert spark.read.parquet(idx.postings_path).count() == postings_1
