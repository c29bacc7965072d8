"""Tiered / bounded log compaction (round-13 verdict, missing #1 and
next #3): `compact(upto=B)` folds only committed real batches <= B,
standing generations are NOT re-folded on every call (two successive
bounded folds leave the first generation's files byte-identical), the
size-ratio walk merges generations only when the trigger fires, and
retention composes — a WHOLE old generation expires while younger
generations stand. merge_ratio=0 (fold everything) remains the
round-13 behavior and is pinned by the pre-existing compact suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.streaming.embeddings import (
    IvfAssignmentStore,
    ivf_assign,
    ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _rows(df):
    return {(r.vec_id, r.cent_id, r.batch_id) for r in df.collect()}


def _ivf4(spark, tmp_path, name="ivf"):
    """Four committed batches 0..3, ~equal size."""
    store = IvfAssignmentStore(spark, str(tmp_path / name))
    cent = ivf_centroids(spark, SF_DIR)
    bounds = [0, 150, 300, 450, 10**9]
    store.bootstrap(
        ivf_assign(_emb(spark).filter(F.col("vec_id") < 150), cent)
    )
    for b in (1, 2, 3):
        store.append_batch(
            ivf_assign(
                _emb(spark).filter(
                    (F.col("vec_id") >= bounds[b])
                    & (F.col("vec_id") < bounds[b + 1])
                ),
                cent,
            ),
            b,
        )
    return store, cent


def _gen_files(store, gen):
    """Sorted (name, mtime, size) fingerprint of a generation's files."""
    import pathlib

    return sorted(
        (str(p.relative_to(store.data_path)), p.stat().st_mtime_ns,
         p.stat().st_size)
        for p in pathlib.Path(store.data_path).glob(
            f"**/batch_id={gen}/*.parquet"
        )
    )


def test_bounded_fold_leaves_later_batches_and_first_gen_untouched(
    spark, tmp_path
):
    """compact(upto=1) folds [0,1] only; a second bounded fold of
    [2,3] creates a SECOND generation without rewriting the first —
    maintenance cost scales with the new deltas, not the corpus."""
    store, cent = _ivf4(spark, tmp_path)
    serving = {(r.vec_id, r.cent_id) for r in store.read().collect()}

    r1 = store.compact(upto=1, merge_ratio=None)
    assert r1["compacted"] is True
    assert r1["generation"] == -1
    assert r1["folded"] == [0, 1]
    assert r1["upto"] == 1
    assert store._landed_batch_values() == [-1, 2, 3]
    assert store.history() == [1, 2, 3]
    assert {(r.vec_id, r.cent_id) for r in store.read().collect()} == serving

    gen1_before = _gen_files(store, -1)
    assert gen1_before, "generation -1 must hold files"

    r2 = store.compact(upto=3, merge_ratio=None)
    assert r2["compacted"] is True
    assert r2["generation"] == -2
    assert r2["folded"] == [2, 3]
    assert r2["upto"] == 3
    assert store._landed_batch_values() == [-2, -1]
    assert store.history() == [3]
    assert {(r.vec_id, r.cent_id) for r in store.read().collect()} == serving

    assert _gen_files(store, -1) == gen1_before, (
        "a bounded fold must NOT rewrite the standing generation"
    )

    # ledger: per-generation records + cumulative flat keys
    led = store._read_json(store.folded_ledger_path)
    assert led["batches"] == [0, 1, 2, 3]
    assert led["upto"] == 3
    assert led["gen"] == -2
    assert led["generations"] == [
        {"gen": -2, "upto": 3, "batches": [2, 3]},
        {"gen": -1, "upto": 1, "batches": [0, 1]},
    ]

    # VACUUM horizon is global: every folded point refuses
    for b in (0, 1, 2):
        with pytest.raises(ValueError, match="VACUUM"):
            store.read(as_of_batch=b)
    assert store.read(as_of_batch=3).count() == len(serving)

    # redeliveries of batches in EITHER generation drop
    for bid in (0, 3):
        store.append_batch(
            ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent), bid
        )
    assert store._landed_batch_values() == [-2, -1]
    assert {(r.vec_id, r.cent_id) for r in store.read().collect()} == serving

    # a fresh instance resolves the two-generation layout identically
    fresh = IvfAssignmentStore(spark, store.base_path)
    assert {(r.vec_id, r.cent_id) for r in fresh.read().collect()} == serving
    assert fresh.history() == [3]


def test_size_ratio_trigger_merges_generations(spark, tmp_path):
    """The LSM walk: a fold whose gathered bytes outweigh
    merge_ratio x a standing generation's bytes consumes it; a fold
    far smaller leaves it standing (the default-path behavior)."""
    store, cent = _ivf4(spark, tmp_path)

    # fold [0,1] into gen -1
    store.compact(upto=1, merge_ratio=None)
    gen1 = _gen_files(store, -1)

    # [2,3] is ~the same byte weight as gen -1 -> with the default
    # ratio 0.5 the walk pulls gen -1 into the fold: ONE generation
    r = store.compact()
    assert r["compacted"] is True
    assert r["generation"] == -2
    assert r["folded"] == [-1, 2, 3]
    assert store._landed_batch_values() == [-2]
    led = store._read_json(store.folded_ledger_path)
    assert led["generations"] == [
        {"gen": -2, "upto": 3, "batches": [0, 1, 2, 3]}
    ]
    assert _gen_files(store, -1) == [] and gen1  # merged away

    # a tiny new batch against the big generation, with a ratio the
    # tiny bytes cannot reach (at toy scale parquet file overhead
    # dominates real bytes, so the threshold is explicit here): the
    # trigger does not fire and the fold set is a single batch — a
    # no-op (folding one batch into its own generation bounds nothing)
    tiny = ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent).withColumn(
        "vec_id", F.col("vec_id") + 700000
    )
    store.append_batch(tiny, 4)
    gen2 = _gen_files(store, -2)
    assert store.compact(merge_ratio=25.0) == {
        "compacted": False, "folded": [], "rows": None,
    }
    assert _gen_files(store, -2) == gen2
    assert store._landed_batch_values() == [-2, 4]

    # two tiny batches: they fold together into a YOUNG generation,
    # the big one still untouched
    store.append_batch(
        tiny.withColumn("vec_id", F.col("vec_id") + 1000), 5
    )
    r = store.compact(merge_ratio=25.0)
    assert r["compacted"] is True
    assert r["folded"] == [4, 5]
    assert store._landed_batch_values() == [-3, -2]
    assert _gen_files(store, -2) == gen2, (
        "the size-ratio trigger must not re-fold a generation far "
        "above the new deltas' weight"
    )


def test_expire_whole_old_generation_with_younger_standing(spark, tmp_path):
    """Retention x tiered compaction: a boundary above an old
    generation's whole batch range retires it while a younger
    generation and live batches stand; a boundary SPLITTING either
    generation refuses with the per-generation message."""
    store, cent = _ivf4(spark, tmp_path)
    store.compact(upto=1, merge_ratio=None)   # gen -1 = [0,1]
    store.compact(upto=3, merge_ratio=None)   # gen -2 = [2,3]
    extra = ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent).withColumn(
        "vec_id", F.col("vec_id") + 700000
    )
    store.append_batch(extra, 4)

    with pytest.raises(ValueError, match=r"\[0, 1\].*inside"):
        store.expire(1)  # splits gen -1
    with pytest.raises(ValueError, match=r"\[2, 3\].*inside"):
        store.expire(3)  # splits gen -2

    receipt = store.expire(2)  # retires gen -1 whole
    assert receipt == {"expired": [-1], "before": 2}
    assert store._landed_batch_values() == [-2, 4]
    want = {(r.vec_id, r.cent_id) for r in store.read().collect()}
    assert {
        (r.vec_id, r.cent_id)
        for r in IvfAssignmentStore(spark, store.base_path).read().collect()
    } == want

    # expired-generation redeliveries still drop (floor covers them)
    store.append_batch(
        ivf_assign(_emb(spark).filter(F.col("vec_id") < 150), cent), 0
    )
    assert store._landed_batch_values() == [-2, 4]

    # the next fold prunes the retired generation from the ledger's
    # records while the flat redelivery-drop set stays cumulative
    store.append_batch(
        extra.withColumn("vec_id", F.col("vec_id") + 2000), 5
    )
    store.compact(merge_ratio=None)
    led = store._read_json(store.folded_ledger_path)
    assert [g["gen"] for g in led["generations"]] == [-3, -2]
    assert led["batches"] == [0, 1, 2, 3, 4, 5]


def test_snapshot_and_sync_with_two_generations(spark, tmp_path):
    """DR on the tiered layout: a snapshot carries BOTH generations
    verbatim; an incremental sync ships later real batches; a source
    fold since the export refuses down BOTH detection paths (foreign
    clone batches / unshippable generation) with honest remedies."""
    store, cent = _ivf4(spark, tmp_path)
    store.compact(upto=1, merge_ratio=None)
    store.compact(upto=3, merge_ratio=None)

    dest = str(tmp_path / "clone")
    store.snapshot_to(dest)
    clone = IvfAssignmentStore(spark, dest)
    assert clone._landed_batch_values() == [-2, -1]
    assert clone.history() == [3]
    with pytest.raises(ValueError, match="VACUUM"):
        clone.read(as_of_batch=2)

    # a second clone that will NEVER see batches 4/5 — the
    # unshippable-generation path below
    dest_stale = str(tmp_path / "clone_stale")
    store.snapshot_to(dest_stale)

    # incremental: a new real batch ships
    extra = ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent).withColumn(
        "vec_id", F.col("vec_id") + 700000
    )
    store.append_batch(extra, 4)
    assert store.sync_to(dest)["batches_shipped"] == [4]
    assert {(r.vec_id, r.cent_id) for r in clone.read().collect()} == {
        (r.vec_id, r.cent_id) for r in store.read().collect()
    }

    # fold batches 4+5 on the source
    store.append_batch(
        extra.withColumn("vec_id", F.col("vec_id") + 1000), 5
    )
    store.compact(merge_ratio=None)
    assert store._landed_batch_values() == [-3, -2, -1]

    # clone holds batch 4 as a real id the source folded -> foreign
    with pytest.raises(RuntimeError, match="fresh snapshot"):
        store.sync_to(dest)
    # clone_stale never saw 4/5: nothing foreign, but the generation
    # holding them cannot ship through append_batch
    with pytest.raises(RuntimeError, match="not incrementally shippable"):
        store.sync_to(dest_stale)


def test_sync_refuses_retention_ahead_clone(spark, tmp_path):
    """Round-13 ADVICE (low): a clone whose retention floor is AHEAD
    of the source's would silently re-drop shipped batches while the
    manifest attested them — refused with the remedy named."""
    store, cent = _ivf4(spark, tmp_path)
    dest = str(tmp_path / "clone")
    store.snapshot_to(dest)
    clone = IvfAssignmentStore(spark, dest)
    clone.expire(2)

    with pytest.raises(RuntimeError, match="retention floor"):
        store.sync_to(dest)

    # remedy: expire the source to the clone's boundary, then sync
    store.expire(2)
    receipt = store.sync_to(dest)
    assert receipt["batches_shipped"] == []
    assert {(r.vec_id, r.cent_id) for r in clone.read().collect()} == {
        (r.vec_id, r.cent_id) for r in store.read().collect()
    }


def test_history_maps_folded_ids_in_commit_pending_window(spark, tmp_path):
    """Round-13 ADVICE (low): with the commit manifest pending (fold
    verified, finish crashed before the ledger write) history() must
    collapse the folded ids to the commit's upto — every reported
    entry stays a point read(as_of_batch=...) can resolve."""
    store, cent = _ivf4(spark, tmp_path)

    real_wj = IvfAssignmentStore._write_json

    def boom(self, path, obj):
        if path.endswith("_folded.json"):
            raise RuntimeError("crash before ledger")
        real_wj(self, path, obj)

    IvfAssignmentStore._write_json = boom
    try:
        with pytest.raises(RuntimeError, match="crash before ledger"):
            store.compact(upto=2, merge_ratio=None)
    finally:
        IvfAssignmentStore._write_json = real_wj
    assert store._read_json(store.compact_commit_path) is not None
    assert store._read_json(store.folded_ledger_path) is None

    # [0,1,2] folded (commit pending), batch 3 untouched
    assert store.history() == [2, 3]
    for b in store.history():
        store.read(as_of_batch=b)  # every entry resolves
    for b in (0, 1):
        with pytest.raises(ValueError, match="VACUUM"):
            store.read(as_of_batch=b)

    # recovery rolls forward; history unchanged
    store.purge_forgotten()
    assert store.history() == [2, 3]


def test_refused_sync_leaves_clone_untouched(spark, tmp_path):
    """Round-14 self-review (medium): a sync refused for an
    unshippable post-snapshot generation must not have mutated the
    clone first — the schema-reconciliation sidecar write used to
    precede the refusal, flipping a live clone's append guard while
    shipping nothing."""
    from pyspark.sql import types as T

    store, cent = _ivf4(spark, tmp_path)
    store.compact(merge_ratio=0)  # clone will hold generation -1
    dest = str(tmp_path / "clone")
    store.snapshot_to(dest)
    clone = IvfAssignmentStore(spark, dest)
    clone_schema_before = clone.data_schema()

    # evolve the SOURCE schema, then fold two post-snapshot batches —
    # the sync now has both a sidecar to reconcile and an unshippable
    # generation; the refusal must come first
    store.evolve_schema(
        T.StructType(
            list(IvfAssignmentStore.DATA_SCHEMA.fields)
            + [T.StructField("crawl_src", T.StringType(), True)]
        )
    )
    extra = ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent).withColumn(
        "vec_id", F.col("vec_id") + 700000
    ).withColumn("crawl_src", F.lit("cc"))
    store.append_batch(extra, 4)
    store.append_batch(
        extra.withColumn("vec_id", F.col("vec_id") + 1000), 5
    )
    store.compact(merge_ratio=None)

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not incrementally shippable"):
        store.sync_to(dest)
    assert clone.data_schema() == clone_schema_before, (
        "a refused sync must leave the clone's schema sidecar untouched"
    )
    assert clone._read_json(clone.schema_sidecar_path) is None


def test_pinned_snapshot_exports_as_of_batch(spark, tmp_path):
    """snapshot_to(pin_batch=B): only committed values <= B travel —
    the consistent-point export that makes a quiesce-free fleet
    snapshot possible; a later sync ships the beyond-pin batches."""
    store, cent = _ivf4(spark, tmp_path)
    dest = str(tmp_path / "pinned")
    receipt = store.snapshot_to(dest, pin_batch=2)
    assert receipt["pin_batch"] == 2
    assert receipt["batches"] == [0, 1, 2]
    assert receipt["high_water"] == {"kind": "batch", "value": 2}

    clone = IvfAssignmentStore(spark, dest)
    assert clone._landed_batch_values() == [0, 1, 2]
    assert {(r.vec_id, r.cent_id) for r in clone.read().collect()} == {
        (r.vec_id, r.cent_id)
        for r in store.read(as_of_batch=2).collect()
    }

    # incremental catch-up past the pin
    assert store.sync_to(dest)["batches_shipped"] == [3]
    assert clone._landed_batch_values() == [0, 1, 2, 3]


def test_pinned_snapshot_fold_and_retention_interplay(spark, tmp_path):
    """A pin inside a generation refuses (fold boundaries bound the
    pinnable points); a generation wholly under the pin ships with a
    TRIMMED ledger — the clone keeps VACUUM/redelivery semantics for
    what it holds, while a beyond-pin folded batch is a legitimate
    new batch on the fork."""
    store, cent = _ivf4(spark, tmp_path)
    store.compact(upto=1, merge_ratio=None)  # gen -1 = [0,1]
    store.append_batch(
        ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent)
        .withColumn("vec_id", F.col("vec_id") + 700000),
        4,
    )
    store.compact(upto=4, merge_ratio=None)  # gen -2 = [2,3,4]

    with pytest.raises(ValueError, match="inside generation"):
        store.snapshot_to(str(tmp_path / "bad"), pin_batch=3)

    dest = str(tmp_path / "pin1")
    receipt = store.snapshot_to(dest, pin_batch=1)
    assert receipt["batches"] == [-1]
    clone = IvfAssignmentStore(spark, dest)
    led = clone._read_json(clone.folded_ledger_path)
    assert led["generations"] == [{"gen": -1, "upto": 1, "batches": [0, 1]}]
    assert led["upto"] == 1 and led["batches"] == [0, 1]
    with pytest.raises(ValueError, match="VACUUM"):
        clone.read(as_of_batch=0)
    # a redelivery of a batch folded UNDER the pin drops...
    clone.append_batch(
        ivf_assign(_emb(spark).filter(F.col("vec_id") < 150), cent), 0
    )
    assert clone._landed_batch_values() == [-1]
    # ...while a batch folded BEYOND the pin lands as new on the fork
    clone.append_batch(
        ivf_assign(
            _emb(spark).filter(
                (F.col("vec_id") >= 150) & (F.col("vec_id") < 300)
            ),
            cent,
        ),
        2,
    )
    assert clone._landed_batch_values() == [-1, 2]

    # retention floor bounds the pin
    store.expire(2)
    with pytest.raises(ValueError, match="below the retention floor"):
        store.snapshot_to(str(tmp_path / "bad2"), pin_batch=1)


def test_fleet_snapshot_pin_batches_consistent_without_quiesce(
    spark, tmp_path
):
    """snapshot_everywhere(pin_batches=True): batch stores pinned at
    the fleet's minimum committed batch — skew {} by construction on
    a DELIBERATELY skewed fleet — with no fleet-wide lease window."""
    from chchfr_data_collection_spark.operators.takedown import (
        restore_everywhere,
        snapshot_everywhere,
    )
    from chchfr_data_collection_spark.streaming.embeddings import (
        PqCodesStore,
        pq_codebook,
        pq_encode,
    )

    emb = _emb(spark)
    cent = ivf_centroids(spark, SF_DIR)
    cb = pq_codebook(spark, SF_DIR)
    a = emb.filter(F.col("vec_id") < 300)
    b = emb.filter(F.col("vec_id") >= 300)
    ivf = IvfAssignmentStore(spark, str(tmp_path / "ivf"))
    ivf.bootstrap(ivf_assign(a, cent))
    ivf.append_batch(ivf_assign(b, cent), 1)  # ivf at batch 1
    pq = PqCodesStore(spark, str(tmp_path / "pq"))
    pq.bootstrap(pq_encode(a, cb))            # pq still at batch 0

    with pytest.raises(ValueError, match="pick one"):
        snapshot_everywhere(
            str(tmp_path / "x"), (ivf, "ivf"), (pq, "pq"),
            quiesce=True, pin_batches=True,
        )

    root = str(tmp_path / "set")
    catalog = snapshot_everywhere(
        root, (ivf, "ivf"), (pq, "pq"), pin_batches=True
    )
    assert catalog["pin_batch"] == 0
    assert catalog["skew"] == {}, "pinned marks must agree"
    assert all(
        rec["high_water"] == {"kind": "batch", "value": 0}
        for rec in catalog["stores"].values()
    )
    restored = restore_everywhere(
        spark,
        root,
        {
            "IvfAssignmentStore": IvfAssignmentStore,
            "PqCodesStore": PqCodesStore,
        },
        on_skew="raise",
    )
    # the restored IVF holds exactly the pinned prefix
    assert restored["ivf"]._landed_batch_values() == [0]
    assert {
        (r.vec_id, r.cent_id) for r in restored["ivf"].read().collect()
    } == {(r.vec_id, r.cent_id) for r in ivf.read(as_of_batch=0).collect()}


def test_sync_refuses_diverged_same_id_generations(spark, tmp_path):
    """Round-14 self-review: tiered folds make same-id generations
    with DIFFERENT fold membership reachable (the clone compacts
    itself with other boundaries; both ledger counters count down
    from the shipped state) — the landed-value diff alone would
    attest divergent rows as in-sync."""
    store, cent = _ivf4(spark, tmp_path)
    dest = str(tmp_path / "clone")
    store.snapshot_to(dest)
    clone = IvfAssignmentStore(spark, dest)

    extra = ivf_assign(_emb(spark).filter(F.col("vec_id") < 5), cent).withColumn(
        "vec_id", F.col("vec_id") + 700000
    )
    store.append_batch(extra, 4)
    store.append_batch(
        extra.withColumn("vec_id", F.col("vec_id") + 1000), 5
    )
    store.compact(merge_ratio=None)   # source gen -1 = [4,5]
    clone.compact(merge_ratio=0)      # clone gen -1 = [0,1,2,3]

    with pytest.raises(RuntimeError, match="DIFFERENT fold membership"):
        store.sync_to(dest)
