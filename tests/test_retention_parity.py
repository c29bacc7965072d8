"""Retention parity across the fleet (round-13 verdict, missing #2 /
next #4): `expire()` exists on every store layout, in the batch-store
idiom — ledger/marker FIRST (read-atomic retirement), loud refusals
(folded-real-id, empty-store), crash recovery by any maintenance call,
and snapshot/sync interplay (floor travels; a retention-ahead clone
refuses). The batch-store (IVF/PQ) expire is pinned by
test_batch_stores / test_tiered_compaction; this file covers the
MinHash index (delta-keyed) and the ComponentStore (seq-keyed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chchfr_data_collection_spark.operators.component_store import (
    ComponentStore,
)
from chchfr_data_collection_spark.operators.minhash_index import MinHashIndex

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# ---------------------------------------------------------------------------
# MinHash index


def _idx(spark, tmp_path, name="mh"):
    """Index with a bootstrap corpus and one probed delta 'd1'."""
    docs = _docs(spark)
    idx = MinHashIndex(spark, str(tmp_path / name))
    idx.bootstrap(docs.filter(F.col("doc_id") % 4 == 1))
    d1 = docs.filter(F.col("doc_id") % 4 == 2)
    idx.probe_and_insert(d1, "d1")
    return idx, docs, d1


def _twins_of(d1, offset=10_000_000):
    """Byte-identical copies of d1's docs under fresh doc_ids — every
    twin pairs with its original at jaccard 1.0 while it is indexed."""
    return d1.withColumn("doc_id", F.col("doc_id") + offset)


def test_minhash_expire_retires_delta_from_probes(spark, tmp_path):
    idx, docs, d1 = _idx(spark, tmp_path)
    d1_ids = {r.doc_id for r in d1.select("doc_id").collect()}
    seqs = dict((d, s) for s, d in idx.history())
    assert "d1" in seqs

    # twins of d1 pair with the originals while d1 is indexed (pairs
    # are emitted da < db, so the lower original ids sit in da)
    p = idx.probe_and_insert(_twins_of(d1), "probe_pre")
    assert p.filter(F.col("da").isin(list(d1_ids))).count() > 0

    reader = MinHashIndex(spark, idx.base_path)  # primed second handle
    assert (
        reader._read_relation("arrays")
        .filter(F.col("doc_id").isin(list(d1_ids)))
        .count()
        > 0
    )

    receipt = idx.expire(["d1", "probe_pre"])
    assert receipt == {"expired": ["d1", "probe_pre"], "already": []}

    # the retired docs are out of the index — reader handle included
    for h in (idx, reader):
        assert (
            h._read_relation("arrays")
            .filter(F.col("doc_id").isin(list(d1_ids)))
            .count()
            == 0
        )
    # a fresh probe of the twins finds no partner (originals retired)
    p2 = idx.probe_and_insert(_twins_of(d1, 20_000_000), "probe_post")
    assert p2.filter(F.col("db").isin(list(d1_ids))).count() == 0
    assert p2.filter(F.col("da").isin(list(d1_ids))).count() == 0

    # history collapsed; the retired snapshot's seq refuses
    hist_ids = {d for _, d in idx.history()}
    assert "d1" not in hist_ids and "probe_pre" not in hist_ids
    with pytest.raises(ValueError, match="retired|expired"):
        idx.pairs_as_of(seqs["d1"])

    # re-inserting a retired delta_id refuses; idempotent retry reports
    with pytest.raises(RuntimeError, match="retired by expire"):
        idx.insert(d1, "d1")
    assert idx.expire(["d1"]) == {"expired": [], "already": ["d1"]}

    # a fresh instance agrees
    fresh = MinHashIndex(spark, idx.base_path)
    assert (
        fresh._read_relation("arrays")
        .filter(F.col("doc_id").isin(list(d1_ids)))
        .count()
        == 0
    )


def test_minhash_expire_refusals(spark, tmp_path):
    idx, docs, d1 = _idx(spark, tmp_path)

    with pytest.raises(ValueError, match="not a landed delta"):
        idx.expire(["never-landed"])
    with pytest.raises(ValueError, match="would empty the index"):
        idx.expire(["bootstrap", "d1"])

    # fold d1 + bootstrap into a generation: the REAL id now refuses
    # with the expire-the-generation remedy; the generation id works
    idx.compact(merge_ratio=0)
    with pytest.raises(ValueError, match="Expire the generation"):
        idx.expire(["d1"])
    gens = sorted(
        d
        for d in idx._landed_ids(idx.landed_path)
        if d.startswith("gen-")
    )
    assert len(gens) == 1
    # expiring the only generation would empty the index
    with pytest.raises(ValueError, match="would empty the index"):
        idx.expire(gens)

    # land a new delta, then the old generation CAN retire whole
    d2 = docs.filter(F.col("doc_id") % 4 == 3)
    idx.insert(d2, "d2")
    receipt = idx.expire(gens)
    assert receipt["expired"] == gens
    d1_ids = {r.doc_id for r in d1.select("doc_id").collect()}
    assert (
        idx._read_relation("arrays")
        .filter(F.col("doc_id").isin(list(d1_ids)))
        .count()
        == 0
    )
    d2_ids = {r.doc_id for r in d2.limit(5).select("doc_id").collect()}
    assert (
        idx._read_relation("arrays")
        .filter(F.col("doc_id").isin(list(d2_ids)))
        .count()
        > 0
    )


def test_minhash_expire_crash_recovers(spark, tmp_path):
    """Die after the expired marker but before the drops: reads are
    already consistent (the marker excludes the delta), and the next
    maintenance call sweeps the leftovers."""
    idx, docs, d1 = _idx(spark, tmp_path)
    d1_ids = {r.doc_id for r in d1.select("doc_id").collect()}

    real = MinHashIndex._drop_expired

    def boom(self, did):
        raise RuntimeError("crash after marker")

    MinHashIndex._drop_expired = boom
    try:
        with pytest.raises(RuntimeError, match="crash after marker"):
            idx.expire(["d1"])
    finally:
        MinHashIndex._drop_expired = real

    # marker up, partitions still on disk — reads already exclude
    assert "d1" in idx._landed_ids(idx.expired_path)
    assert "d1" in idx._landed_ids(idx.landed_path)  # not yet swept
    assert (
        idx._read_relation("arrays")
        .filter(F.col("doc_id").isin(list(d1_ids)))
        .count()
        == 0
    )
    # any maintenance call finishes the drop
    idx.compact()
    assert "d1" not in idx._landed_ids(idx.landed_path)
    assert idx._delta_dirs("arrays", "d1") == []


def test_minhash_expire_snapshot_sync_interplay(spark, tmp_path):
    idx, docs, d1 = _idx(spark, tmp_path)
    dest = str(tmp_path / "clone")
    idx.snapshot_to(dest)
    clone = MinHashIndex(spark, dest)

    # clone retention AHEAD: refuse with the remedy named
    clone.expire(["d1"])
    with pytest.raises(RuntimeError, match="retention is ahead"):
        idx.sync_to(dest)

    # remedy: expire the same delta on the source, then sync
    idx.expire(["d1"])
    idx.sync_to(dest)

    # markers traveled: the clone refuses the retired id
    with pytest.raises(RuntimeError, match="retired by expire"):
        clone.insert(d1, "d1")

    # source-expired-first direction on a second clone: foreign
    # refusal names the expire-the-clone remedy
    d2 = docs.filter(F.col("doc_id") % 4 == 3)
    idx.insert(d2, "d2")
    dest2 = str(tmp_path / "clone2")
    idx.snapshot_to(dest2)
    idx.expire(["d2"])
    with pytest.raises(RuntimeError, match="expire the same delta_ids"):
        idx.sync_to(dest2)
    MinHashIndex(spark, dest2).expire(["d2"])
    idx.sync_to(dest2)


def test_minhash_tiered_fold_leaves_standing_generation(spark, tmp_path):
    """The size-tier walk on the index: a second fold of small new
    deltas does NOT rewrite the standing generation (byte-identical
    files), and merge_ratio=0 still folds everything."""
    import pathlib

    docs = _docs(spark)
    idx = MinHashIndex(spark, str(tmp_path / "mh"))
    idx.bootstrap(docs.filter(F.col("doc_id") % 2 == 0))
    idx.insert(docs.filter(F.col("doc_id") % 8 == 1), "a")
    idx.compact(merge_ratio=0)
    gens = sorted(
        d for d in idx._landed_ids(idx.landed_path) if d.startswith("gen-")
    )
    assert len(gens) == 1

    def _gen_files(g):
        return sorted(
            (str(p), p.stat().st_mtime_ns, p.stat().st_size)
            for p in pathlib.Path(idx.postings_path).glob(
                f"band=*/delta_id={g}/*.parquet"
            )
        )

    before = _gen_files(gens[0])
    assert before

    # two tiny deltas, then a fold with a ratio their bytes can't
    # reach: they fold together, the big generation stands untouched
    idx.insert(docs.filter(F.col("doc_id") % 8 == 3).limit(5), "b")
    idx.insert(docs.filter(F.col("doc_id") % 8 == 5).limit(5), "c")
    receipt = idx.compact(merge_ratio=50.0)
    assert receipt["postings"]["compacted"] is True
    assert _gen_files(gens[0]) == before, (
        "a tiered fold must not rewrite a standing generation far "
        "above the new deltas' weight"
    )
    gens2 = sorted(
        d for d in idx._landed_ids(idx.landed_path) if d.startswith("gen-")
    )
    assert gens[0] in gens2 and len(gens2) == 2

    # merge_ratio=0: everything folds into one generation again
    idx.compact(merge_ratio=0)
    gens3 = sorted(
        d for d in idx._landed_ids(idx.landed_path) if d.startswith("gen-")
    )
    assert len(gens3) == 1 and gens3[0] not in gens2


# ---------------------------------------------------------------------------
# ComponentStore


def _cc(spark, tmp_path, name="cs"):
    s = ComponentStore(spark, str(tmp_path / name))
    s.bootstrap(
        spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "da: bigint, db: bigint"
        )
    )
    # seq 2: re-observes 10 (bridges to 12); nodes 1,2,3,11 untouched
    s.apply_pairs(
        spark.createDataFrame([(10, 12)], "da: bigint, db: bigint"), "p1"
    )
    return s


def test_component_expire_retires_stale_nodes(spark, tmp_path):
    s = _cc(spark, tmp_path)
    hist = s.history()
    assert [d for _, d in hist] == ["bootstrap", "p1"]
    top = hist[-1][0]

    receipt = s.expire(top)
    assert receipt["before"] == top
    assert [tuple(e) for e in receipt["expired"]] == [(hist[0][0], "bootstrap")]

    # nodes whose latest PATCH ROW predates the floor retire — and a
    # patch row means a label CHANGE: node 10's label (10) did not
    # change when (10,12) applied, so 10 wrote no row at seq 2 and
    # ages out with the bootstrap; first-seen 12 survives
    got = {(r.node, r.component) for r in s.labels().collect()}
    nodes = {n for n, _ in got}
    assert not ({1, 2, 3, 10, 11} & nodes)
    # survivors' labels are VALUES and may name retired nodes
    assert got == {(12, 10)}

    # VACUUM below the floor; at/above serves; fresh handle agrees
    with pytest.raises(ValueError, match="expired by retention"):
        s.labels(as_of_seq=hist[0][0])
    assert {
        (r.node, r.component)
        for r in ComponentStore(spark, s.base_path).labels(top).collect()
    } == got

    # monotone: lower/equal boundary is a no-op with the standing floor
    assert s.expire(1) == {"expired": [], "before": top}
    # emptying refuses
    with pytest.raises(ValueError, match="would empty the store"):
        s.expire(top + 1)


def test_component_expire_crash_recovers(spark, tmp_path):
    s = _cc(spark, tmp_path)
    hist = s.history()
    top = hist[-1][0]

    real = ComponentStore._unmark
    def boom(self, seq, did):
        raise RuntimeError("crash before unmark")

    ComponentStore._unmark = boom
    try:
        with pytest.raises(RuntimeError, match="crash before unmark"):
            s.expire(top)
    finally:
        ComponentStore._unmark = real

    # ledger landed; any maintenance call finishes the drops
    assert s._read_json(s.expired_ledger_path) == {"before": top}
    s.compact()
    assert all(seq >= top for seq, _ in s.history())
    nodes = {r.node for r in s.labels().collect()}
    assert not ({1, 2, 3, 11} & nodes)


def test_component_expire_snapshot_sync_interplay(spark, tmp_path):
    s = _cc(spark, tmp_path)
    top = s.history()[-1][0]
    dest = str(tmp_path / "clone")
    s.snapshot_to(dest)
    clone = ComponentStore(spark, dest)

    # clone retention ahead -> refuse with the remedy named
    clone.expire(top)
    with pytest.raises(RuntimeError, match="retention floor"):
        s.sync_to(dest)
    s.expire(top)
    s.sync_to(dest)

    # a post-expiry snapshot carries the floor
    dest2 = str(tmp_path / "clone2")
    s.snapshot_to(dest2)
    with pytest.raises(ValueError, match="expired by retention"):
        ComponentStore(spark, dest2).labels(as_of_seq=1)

    # source-expired-first on a stale clone: foreign refusal names
    # the expire-the-clone remedy
    s.apply_pairs(
        spark.createDataFrame([(20, 21)], "da: bigint, db: bigint"), "p2"
    )
    dest3 = str(tmp_path / "clone3")
    s.snapshot_to(dest3)
    s.expire(s.history()[-1][0])
    with pytest.raises(RuntimeError, match="expire the clone"):
        s.sync_to(dest3)
    ComponentStore(spark, dest3).expire(s.history()[-1][0])
    s.sync_to(dest3)


def test_component_expire_gen_crash_orphan_swept(spark, tmp_path):
    """An expire() that dies between the gens-ledger rewrite (the
    read-atomic removal) and the generation directory delete leaves an
    UNLISTED gid dir. The next maintenance call's _recover_fold sweeps
    it — without that, a later purge could clear tombstones while the
    orphan still held their bytes (round-15 self-review). Deliberately
    parked (vacuum-retired) dirs are not touched."""
    s = _cc(spark, tmp_path)                       # patches 1,2
    s.apply_pairs(
        spark.createDataFrame([(30, 31)], "da: bigint, db: bigint"), "p2"
    )
    r1 = s.compact(upto=2, merge_ratio=None)       # gen1@2 = [1,2]
    fs, HPath = s._fs()
    gd = s._gen_dir(r1["generation"])
    # simulate the crash state: ledger no longer lists gen1, dir stays
    keep = [g for g in s._generations() if g["gid"] != r1["generation"]]
    s._write_json(s.gens_ledger_path, {"generations": keep})
    assert fs.exists(HPath(gd))
    s.compact()  # any maintenance call recovers
    assert not fs.exists(HPath(gd)), "orphan generation dir lingered"
    # a vacuum-retired dir in the same location is NOT swept early:
    # patches retired by the fold above are still parked
    assert s._vacuum_state()["retired"], "fold should have parked sources"
