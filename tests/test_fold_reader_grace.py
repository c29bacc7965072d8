"""Fold-source reader grace (round-14 verdict, wrong #2 / next #2):
a committed fold RETIRES its read sources into the `_vacuum.json`
ledger instead of deleting them — bytes stay at their original paths,
so a probe plan or read-back that pinned its file listing BEFORE the
fold completes successfully across it, while every fresh read excludes
the retired sources. A later maintenance call sweeps entries past the
FOLD_VACUUM_GRACE cycle horizon; a purge force-sweeps everything first
(byte-erasure claims cover parked bytes). The MinHash leg is pinned in
test_minhash_index.test_lazy_probe_delta_unfoldable_until_finalized;
this file covers the batch-store and ComponentStore legs plus the
horizon mechanics and receipt surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.component_store import (
    ComponentStore,
)
from chchfr_data_collection_spark.operators.store_base import (
    FOLD_VACUUM_GRACE,
)
from chchfr_data_collection_spark.streaming.embeddings import (
    IvfAssignmentStore,
    ivf_assign,
    ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _ivf(spark, tmp_path, n_batches=3, name="ivf"):
    store = IvfAssignmentStore(spark, str(tmp_path / name))
    cent = ivf_centroids(spark, SF_DIR)
    store.bootstrap(
        ivf_assign(_emb(spark).filter(F.col("vec_id") < 150), cent)
    )
    bounds = [150, 300, 450, 10**9]
    for b in range(1, n_batches):
        store.append_batch(
            ivf_assign(
                _emb(spark).filter(
                    (F.col("vec_id") >= bounds[b - 1])
                    & (F.col("vec_id") < bounds[b])
                ),
                cent,
            ),
            b,
        )
    return store, cent


def test_batch_store_plan_held_across_fold_completes(spark, tmp_path):
    """A read() plan built BEFORE a fold (file listing pinned, empty
    exclusion set) collects successfully AFTER the fold commits and
    returns the pre-fold serving rows — the retired sources keep its
    listing readable. A FRESH read resolves the generation only (same
    rows, no duplicates), and the receipt surfaces the backlog."""
    store, cent = _ivf(spark, tmp_path)
    held = store.read()  # plan + listing pinned pre-fold
    want = {(r.vec_id, r.cent_id) for r in store.read().collect()}

    receipt = store.compact(merge_ratio=0)
    assert receipt["compacted"] is True
    assert receipt["vacuum_backlog"], "receipt must surface the backlog"
    assert {(r.vec_id, r.cent_id) for r in held.collect()} == want, (
        "plan held across the fold broke or drifted"
    )
    fresh = {(r.vec_id, r.cent_id) for r in store.read().collect()}
    assert fresh == want
    assert store.read().count() == len(want), "retired sources double-serve"


def test_component_store_plan_held_across_fold_completes(spark, tmp_path):
    """The ComponentStore leg: a labels() plan held across a tiered
    fold completes with identical labels (allow-list resolve + parked
    bytes), and the fresh resolve agrees."""
    s = ComponentStore(spark, str(tmp_path / "cc"))
    s.bootstrap(
        spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "da: bigint, db: bigint"
        )
    )
    s.apply_pairs(
        spark.createDataFrame([(3, 4)], "da: bigint, db: bigint"), "d0"
    )
    held = s.labels()
    want = {(r.node, r.component) for r in s.labels().collect()}
    receipt = s.compact(merge_ratio=0)
    assert receipt["compacted"] is True
    assert receipt["vacuum_backlog"]
    assert {(r.node, r.component) for r in held.collect()} == want
    assert {(r.node, r.component) for r in s.labels().collect()} == want


def test_grace_horizon_sweeps_after_n_cycles(spark, tmp_path):
    """Retired entries survive the next FOLD_VACUUM_GRACE-1 fold
    cycles and are deleted by the sweep after that — bounded parking,
    not a leak. Cycle count advances per retiring fold."""
    store, cent = _ivf(spark, tmp_path, n_batches=2)
    r1 = store.compact(merge_ratio=None)  # fold [0,1] -> gen -1
    assert r1["compacted"] is True
    first = store._vacuum_state()["retired"]
    assert len(first) == 1 and first[0]["cycle"] == 0
    first_paths = first[0]["paths"]
    fs, HPath = store._fs()
    assert all(fs.exists(HPath(p)) for p in first_paths)

    extra = ivf_assign(
        _emb(spark).filter(F.col("vec_id") < 5), cent
    ).withColumn("vec_id", F.col("vec_id") + 700000)

    # each subsequent retiring fold advances the cycle; the first
    # entry survives until the sweep sees cycle0 <= cycle - GRACE
    cycles_needed = FOLD_VACUUM_GRACE
    for i in range(cycles_needed):
        store.append_batch(extra.withColumn(
            "vec_id", F.col("vec_id") + 1000 * (i + 1)
        ), 10 + 2 * i)
        store.append_batch(extra.withColumn(
            "vec_id", F.col("vec_id") + 1000 * (i + 1) + 500
        ), 11 + 2 * i)
        r = store.compact(merge_ratio=None)  # folds the two new batches
        assert r["compacted"] is True
        if i < cycles_needed - 1:
            assert all(fs.exists(HPath(p)) for p in first_paths), (
                f"swept too early at cycle {i + 1}"
            )
    # the final fold's entry sweep ran at cycle == GRACE: entry 0 gone
    assert not any(fs.exists(HPath(p)) for p in first_paths), (
        "grace horizon never swept the oldest entry"
    )
    backlog = store._vacuum_state()["retired"]
    assert all(e["cycle"] > 0 for e in backlog)


def test_purge_force_sweeps_backlog(spark, tmp_path):
    """purge_forgotten() deletes the WHOLE vacuum backlog before its
    rewrite — a byte-erasure claim covers parked sources too."""
    store, cent = _ivf(spark, tmp_path)
    store.compact(merge_ratio=0)
    assert store._vacuum_state()["retired"]
    store.forget(
        spark.createDataFrame([(9,)], "vec_id: bigint"), "t1"
    )
    receipt = store.purge_forgotten()
    assert receipt["tombstones_cleared"] == ["t1"]
    assert store._vacuum_state()["retired"] == []
    raw = spark.read.parquet(store.data_path)
    assert raw.filter(F.col("vec_id") == 9).count() == 0
