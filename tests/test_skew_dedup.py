"""Skew-hardening tests for the fuzzy-dedup family (SURVEY.md §4.2):
hot-shingle buckets must not explode into quadratic pair generation,
while genuine near-dups (which always share RARE shingles too) are kept.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from chchfr_data_collection_spark.queries import catalog
from chchfr_data_collection_spark.queries.llm import _NGRAM_DF_CAP


@pytest.fixture(scope="module")
def skew_dir(spark, tmp_path_factory):
    """Synthetic corpus: 100 IDENTICAL boilerplate docs (every shingle df
    = 100 > cap) + 3 near-dup pairs built from rare words (J = 0.9)."""
    base = tmp_path_factory.mktemp("skewcorpus")
    rows = []
    boiler = "the quick brown fox jumps over the lazy dog again and again today"
    for i in range(100):
        rows.append((i, boiler))
    for p in range(3):
        uniq = " ".join(f"p{p}x{j}" for j in range(20))
        rows.append((1000 + 2 * p, uniq + " endA"))
        rows.append((1000 + 2 * p + 1, uniq + " endB"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string").select(
        "doc_id",
        "text",
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length("text").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(base / "documents.parquet"))
    return str(base)


def test_ngram_jaccard_df_cap_bounds_hot_buckets(spark, skew_dir):
    """The 100 identical boilerplate docs share only shingles with
    df=100 > cap: the df cap must suppress their 100*99/2 = 4950
    candidate pairs (identical docs are the exact-hash pass's job),
    while all 3 rare-shingle near-dup pairs survive with their exact
    Jaccard."""
    assert 100 > _NGRAM_DF_CAP
    got = {
        (r.da, r.db): r.jaccard
        for r in catalog()["dedup_ngram_jaccard"].fn(spark, skew_dir).collect()
    }
    assert set(got) == {(1000, 1001), (1002, 1003), (1004, 1005)}
    # 21 words -> 19 shingles, only the final shingle differs:
    # J = 18 / (19 + 19 - 18) = 0.9
    for j in got.values():
        assert j == pytest.approx(18 / 20)


def test_minhash_banded_bucket_cap(spark, skew_dir):
    """Banded MinHash: the identical boilerplate docs all land in the
    same (band, sig) buckets — width 100 > cap, so those buckets are
    skipped; the rare near-dup pairs still band together and verify."""
    got = {
        (r.da, r.db)
        for r in catalog()["dedup_minhash_banded"].fn(spark, skew_dir).collect()
    }
    assert got == {(1000, 1001), (1002, 1003), (1004, 1005)}


def test_exact_hash_catches_what_the_cap_drops(spark, skew_dir):
    """The documented division of labor: identical boilerplate is exact
    dedup's territory. The content-hash pass must collapse the 100
    identical docs into one group with 100 copies."""
    rows = catalog()["dedup_exact_hash"].fn(spark, skew_dir).collect()
    by_copies = {r.n_copies: r.keeper_doc_id for r in rows}
    assert by_copies.get(100) == 0
