"""IvfAssignmentStore right-to-be-forgotten (round-10 verdict item 3):
tombstones mask every read immediately (re-arrivals included), purge
byte-erases ONLY the cells that hold tombstoned rows (untouched cells
keep their exact files), a forget landing mid-purge survives the
tombstone clearing, and one forget_everywhere() call erases an id from
all four serving stores (MinHash, IVF, PQ codes, ComponentStore)."""

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


def _build_store(spark, base) -> IvfAssignmentStore:
    store = IvfAssignmentStore(spark, str(base))
    store.bootstrap(ivf_assign(_emb(spark), ivf_centroids(spark, SF_DIR)))
    return store


def _files_by_cell(store):
    import pathlib

    out = {}
    for p in pathlib.Path(store.assign_path).glob("cent_id=*/**/*.parquet"):
        cell = p.relative_to(store.assign_path).parts[0]
        out.setdefault(cell, set()).add((p.name, p.stat().st_mtime_ns, p.stat().st_size))
    return out


def test_forget_masks_reads_and_rearrival(spark, tmp_path):
    """read() excludes tombstoned vec_ids immediately, a fresh instance
    on the same path agrees (persisted, not in-memory), and a forgotten
    vector RE-APPENDED by a later maintenance batch stays hidden."""
    store = _build_store(spark, tmp_path / "ivf")
    gone = _emb(spark).filter(F.col("vec_id") % 16 == 9).select("vec_id")
    n_gone = gone.count()
    assert n_gone > 0
    total = store.read().count()
    store.forget(gone, "t1")
    masked = store.read()
    assert masked.filter(F.col("vec_id") % 16 == 9).count() == 0
    assert masked.count() == total - n_gone
    fresh = IvfAssignmentStore(spark, store.base_path)
    assert fresh.read().filter(F.col("vec_id") % 16 == 9).count() == 0
    # re-arrival: the maintenance loop appends the forgotten vectors
    # again (a later batch) — bytes land, reads stay masked
    cent = ivf_centroids(spark, SF_DIR)
    store.append_batch(
        ivf_assign(_emb(spark).filter(F.col("vec_id") % 16 == 9), cent), 1
    )
    assert store.read().filter(F.col("vec_id") % 16 == 9).count() == 0


def test_tombstone_listing_cached_and_invalidated(spark, tmp_path):
    store = _build_store(spark, tmp_path / "ivf")
    store.forget(
        _emb(spark).filter(F.col("vec_id") % 16 == 9).select("vec_id"), "t1"
    )
    assert store._deleted_listings == 0
    for _ in range(3):
        store.read().count()
    assert store._deleted_listings == 1
    store.forget(
        _emb(spark).filter(F.col("vec_id") % 16 == 5).select("vec_id"), "t2"
    )
    assert store.read().filter(F.col("vec_id") % 16 == 5).count() == 0
    assert store._deleted_listings == 2


def test_purge_rewrites_only_touched_cells(spark, tmp_path):
    """purge_forgotten() byte-erases tombstoned rows, rewrites ONLY the
    cent_id partitions that held them (untouched cells keep their exact
    files — name, mtime, size), clears the tombstones, and the read
    view is identical before and after."""
    store = _build_store(spark, tmp_path / "ivf")
    # a takedown confined to ONE vector => at most one touched cell
    one = _emb(spark).filter(F.col("vec_id") == 9).select("vec_id")
    store.forget(one, "t1")
    before_files = _files_by_cell(store)
    hit_cells = {
        f"cent_id={int(r.cent_id)}"
        for r in spark.read.parquet(store.assign_path)
        .filter(F.col("vec_id") == 9)
        .select("cent_id")
        .distinct()
        .collect()
    }
    assert len(hit_cells) == 1
    want = {(r.vec_id, r.cent_id) for r in store.read().collect()}

    receipt = store.purge_forgotten()
    assert receipt["cells_rewritten"] == 1
    assert receipt["rows_removed"] == 1
    assert receipt["tombstones_cleared"] == ["t1"]
    assert store._deleted_vecs()[0] is None, "tombstones not cleared"
    raw = spark.read.parquet(store.assign_path)
    assert raw.filter(F.col("vec_id") == 9).count() == 0, "bytes survived"
    assert {(r.vec_id, r.cent_id) for r in store.read().collect()} == want
    after_files = _files_by_cell(store)
    for cell, files in before_files.items():
        if cell not in hit_cells:
            assert after_files[cell] == files, f"untouched {cell} was rewritten"
    assert after_files[next(iter(hit_cells))] != before_files[next(iter(hit_cells))]


def test_forget_landing_mid_purge_survives_clearing(spark, tmp_path):
    """The forget/purge race (the MinHash fingerprint guard, on this
    store): a forget() extending a planned forget_id between the
    purge's tombstone snapshot and its clearing step keeps its (newer)
    tombstones — the late takedown masks reads and the NEXT purge
    erases it."""
    store = _build_store(spark, tmp_path / "ivf")
    emb = _emb(spark)
    store.forget(emb.filter(F.col("vec_id") == 9).select("vec_id"), "t1")
    other = IvfAssignmentStore(spark, store.base_path)
    real_fp = store._partition_fingerprint
    calls = {"n": 0}

    def fp_with_race(path):
        calls["n"] += 1
        if calls["n"] == 2:
            # clearing-time re-check: the takedown was extended between
            # snapshot and now
            other.forget(
                emb.filter(F.col("vec_id").isin(9, 25)).select("vec_id"), "t1"
            )
        return real_fp(path)

    store._partition_fingerprint = fp_with_race
    receipt = store.purge_forgotten()
    store._partition_fingerprint = real_fp
    # the receipt reports what was ACTUALLY cleared: the extended
    # partition's fingerprint changed, so nothing was
    assert receipt["tombstones_cleared"] == []
    deleted = store._deleted_vecs()[0]
    assert deleted is not None, "late forget was silently un-forgotten"
    assert {r.vec_id for r in deleted.collect()} == {9, 25}
    assert store.read().filter(F.col("vec_id").isin(9, 25)).count() == 0
    receipt2 = store.purge_forgotten()
    assert receipt2["tombstones_cleared"] == ["t1"]
    assert store._deleted_vecs()[0] is None
    assert (
        spark.read.parquet(store.assign_path)
        .filter(F.col("vec_id").isin(9, 25))
        .count()
        == 0
    )


def test_forget_everywhere_erases_from_all_stores(spark, tmp_path):
    """One takedown call → the id is gone from the MinHash probe, the
    IVF read, the PQ code table, AND the ComponentStore labels; a store
    failing mid-fanout leaves a partial forget that the SAME call
    retried completes (idempotent-by-replacement on every store)."""
    from chchfr_data_collection_spark.operators.component_store import (
        ComponentStore,
    )
    from chchfr_data_collection_spark.operators.minhash_index import MinHashIndex
    from chchfr_data_collection_spark.operators.takedown import forget_everywhere
    from chchfr_data_collection_spark.streaming.embeddings import (
        PqCodesStore,
        pq_codebook,
        pq_encode,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mh = MinHashIndex(spark, str(tmp_path / "mh"))
    mh.bootstrap(docs.filter(F.col("doc_id") % 4 != 0))
    ivf = _build_store(spark, tmp_path / "ivf")
    pq = PqCodesStore(spark, str(tmp_path / "pq"))
    pq.bootstrap(pq_encode(_emb(spark), pq_codebook(spark, SF_DIR)))
    cs = ComponentStore(spark, str(tmp_path / "cs"))
    cs.bootstrap(
        spark.createDataFrame([(1, 2), (2, 3), (9, 10)], "da: bigint, db: bigint")
    )

    ids = docs.filter(F.col("doc_id") % 16 == 9).select("doc_id")
    assert ids.count() > 0

    # fail-fast + retry: the IVF leg dies on the first call
    real_forget = ivf.forget
    state = {"failed": False}

    def flaky(vec_ids, forget_id):
        if not state["failed"]:
            state["failed"] = True
            raise IOError("simulated store outage")
        real_forget(vec_ids, forget_id)

    ivf.forget = flaky
    with pytest.raises(IOError, match="simulated store outage"):
        forget_everywhere(ids, "req-1", mh, ivf, pq, cs)
    # partial state: MinHash already masked, IVF not yet
    assert ivf._deleted_vecs()[0] is None or state["failed"]
    done = forget_everywhere(ids, "req-1", mh, ivf, pq, cs)  # retry completes
    ivf.forget = real_forget
    # audit keys carry the base path: two stores of one class must not
    # collapse to a single audit entry (round-11 ADVICE, low)
    assert done == {
        f"MinHashIndex@{mh.base_path}": "ok",
        f"IvfAssignmentStore@{ivf.base_path}": "ok",
        f"PqCodesStore@{pq.base_path}": "ok",
        f"ComponentStore@{cs.base_path}": "ok",
    }

    p = mh.probe_and_insert(docs.filter(F.col("doc_id") % 4 == 0), "d1")
    assert (
        p.filter((F.col("da") % 16 == 9) | (F.col("db") % 16 == 9)).count() == 0
    )
    assert ivf.read().filter(F.col("vec_id") % 16 == 9).count() == 0
    assert pq.read().filter(F.col("vec_id") % 16 == 9).count() == 0
    assert not {
        n for n, _ in ((r.node, r.component) for r in cs.labels().collect())
    } & {9, 25, 41}


def test_purge_erases_fully_tombstoned_cell_and_empty_store_reads(spark, tmp_path):
    """A cell whose EVERY vector is tombstoned has no kept rows for the
    dynamic overwrite to land, so its partition must be deleted
    explicitly — and a store whose every cell is purged still reads
    back EMPTY (pinned schema) instead of failing inference."""
    store = _build_store(spark, tmp_path / "ivf")
    import pathlib

    cells = (
        spark.read.parquet(store.assign_path)
        .groupBy("cent_id")
        .count()
        .collect()
    )
    cell = min(cells, key=lambda r: r["count"]).cent_id
    in_cell = (
        spark.read.parquet(store.assign_path)
        .filter(F.col("cent_id") == cell)
        .select("vec_id")
    )
    store.forget(in_cell, "t1")
    receipt = store.purge_forgotten()
    assert receipt["tombstones_cleared"] == ["t1"]
    assert not pathlib.Path(
        f"{store.assign_path}/cent_id={int(cell)}"
    ).exists(), "fully-tombstoned cell's partition survived the purge"
    assert store.read().filter(F.col("cent_id") == cell).count() == 0
    assert store._deleted_vecs()[0] is None

    # total purge: every vector tombstoned -> empty store, working reads
    total = IvfAssignmentStore(spark, str(tmp_path / "ivf2"))
    total.bootstrap(ivf_assign(_emb(spark), ivf_centroids(spark, SF_DIR)))
    total.forget(_emb(spark).select("vec_id"), "all")
    total.purge_forgotten()
    assert total.read().count() == 0


def test_streaming_append_with_lease_fences_and_matches(spark, tmp_path):
    """The lease-fenced variant of the IVF maintenance stream (the
    append-vs-purge fence): results identical to the unfenced append,
    and the claims land under the STORE ROOT's lease dir — the same
    lock purge_forgotten() takes, so the two actually exclude each
    other."""
    import pathlib

    from chchfr_data_collection_spark.streaming.embeddings import (
        foreach_batch_ivf_assign,
        read_embeddings_stream,
    )

    store = IvfAssignmentStore(spark, str(tmp_path / "ivf"))
    cent = ivf_centroids(spark, SF_DIR)
    q = foreach_batch_ivf_assign(
        read_embeddings_stream(spark, SF_DIR),
        cent,
        store.base_path,
        str(tmp_path / "ck"),
        lease=True,
    )
    q.awaitTermination()
    got = {(r.vec_id, r.cent_id) for r in store.read().collect()}
    want = {
        (r.vec_id, r.cent_id)
        for r in ivf_assign(_emb(spark), cent).collect()
    }
    assert got == want
    # the fence is real only if it keyed on the store ROOT (what
    # purge_forgotten() locks), not on the assignments subdir
    assert pathlib.Path(f"{store.base_path}__lease").exists()
    assert not pathlib.Path(f"{store.assign_path}__lease").exists()
