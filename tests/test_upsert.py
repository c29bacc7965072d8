"""Upsert / MERGE emulation tests (SURVEY.md §2 K2) incl. idempotence
and concurrent-writer fencing (round-2 verdict item 5)."""

from __future__ import annotations

import datetime as dt
import threading
import time

import pytest

from chchfr_data_collection_spark.operators.lease import (
    ConcurrentWriteError,
    WriterLease,
)
from chchfr_data_collection_spark.operators.upsert import (
    overwrite_date_partition,
    upsert_by_key,
    upsert_last_wins,
)

SCHEMA = "location_id string, fuel_type string, price double"


def test_upsert_by_key_incoming_wins(spark):
    existing = spark.createDataFrame(
        [("a", "Diesel", 2.10), ("b", "Diesel", 2.15)], SCHEMA
    )
    incoming = spark.createDataFrame(
        [("a", "Diesel", 2.50), ("c", "Diesel", 2.05)], SCHEMA
    )
    out = upsert_by_key(existing, incoming, keys=["location_id", "fuel_type"])
    got = {(r.location_id, r.fuel_type): r.price for r in out.collect()}
    assert got == {("a", "Diesel"): 2.50, ("b", "Diesel"): 2.15, ("c", "Diesel"): 2.05}


def test_upsert_by_key_idempotent(spark):
    existing = spark.createDataFrame([("a", "Diesel", 2.10)], SCHEMA)
    incoming = spark.createDataFrame([("a", "Diesel", 2.50)], SCHEMA)
    once = upsert_by_key(existing, incoming, keys=["location_id", "fuel_type"])
    twice = upsert_by_key(once, incoming, keys=["location_id", "fuel_type"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_upsert_last_wins_versioned(spark):
    schema = SCHEMA + ", v int"
    existing = spark.createDataFrame([("a", "Diesel", 2.10, 1)], schema)
    incoming = spark.createDataFrame(
        [("a", "Diesel", 2.50, 2), ("a", "Diesel", 2.60, 3)], schema
    )
    out = upsert_last_wins(existing, incoming, ["location_id", "fuel_type"], "v")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].price == 2.60 and rows[0].v == 3


def test_overwrite_date_partition_idempotent(spark, tmp_path):
    """Re-running the same date rewrites the same partition, no dup rows;
    other dates are untouched (dynamic partitionOverwriteMode)."""
    path = str(tmp_path / "fuel_price")
    d1, d2 = dt.date(2026, 8, 1), dt.date(2026, 8, 2)
    day1 = spark.createDataFrame(
        [("a", "Diesel", 2.10, d1)], SCHEMA + ", date date"
    )
    day2 = spark.createDataFrame(
        [("a", "Diesel", 2.20, d2)], SCHEMA + ", date date"
    )
    overwrite_date_partition(day1, path)
    overwrite_date_partition(day2, path)
    # retry day2 with a corrected price: replaces only the d2 partition
    day2_retry = spark.createDataFrame(
        [("a", "Diesel", 2.25, d2)], SCHEMA + ", date date"
    )
    overwrite_date_partition(day2_retry, path)
    got = {
        (str(r.date)): r.price for r in spark.read.parquet(path).collect()
    }
    assert got == {"2026-08-01": 2.10, "2026-08-02": 2.25}


def test_lease_mutual_exclusion(spark, tmp_path):
    target = str(tmp_path / "t")
    a = WriterLease(spark, target, timeout_s=0.0)
    b = WriterLease(spark, target, timeout_s=0.3, poll_s=0.05)
    a.acquire()
    assert not b.try_acquire()
    with pytest.raises(ConcurrentWriteError):
        b.acquire()
    a.release()
    b.acquire()
    assert not a.try_acquire()
    b.release()


def test_lease_breaks_stale_holder(spark, tmp_path):
    """A lease past its TTL is presumed orphaned (crashed writer) and is
    broken by the next acquirer."""
    target = str(tmp_path / "t")
    dead = WriterLease(spark, target, timeout_s=0.0)
    dead.acquire()  # never released: simulated crash
    taker = WriterLease(spark, target, ttl_s=0.2, timeout_s=2.0, poll_s=0.05)
    time.sleep(0.4)
    taker.acquire()
    taker.release()


def test_lease_heartbeat_protects_slow_holder(spark, tmp_path):
    """A protected section that deliberately OUTLIVES the TTL keeps the
    lease: the holder's heartbeat refreshes the claim, so a waiter never
    breaks a live holder mid-commit (round-5 verdict: the last
    lost-update window in the MERGE emulation). The read-sleep-write
    counter makes a broken lease visible as a lost update (final 1, not
    2)."""
    target = str(tmp_path / "t")
    counter = tmp_path / "counter.txt"
    counter.write_text("0")
    ttl = 0.6  # heartbeat period = ttl/3 = 0.2 s

    def bump(hold_s: float) -> None:
        lease = WriterLease(
            spark, target, ttl_s=ttl, timeout_s=30.0, poll_s=0.05
        )
        with lease:
            v = int(counter.read_text())
            time.sleep(hold_s)
            counter.write_text(str(v + 1))

    slow = threading.Thread(target=bump, args=(3 * ttl,))
    slow.start()
    time.sleep(0.2)  # ensure the slow writer holds first
    fast = threading.Thread(target=bump, args=(0.05,))
    fast.start()
    slow.join()
    fast.join()
    assert counter.read_text() == "2", "waiter broke a live holder"


class _InertSetTimesFS:
    """Delegating FS proxy whose setTimes is an S3A-style silent no-op
    (the Hadoop FileSystem base-class default). Reports its own FS URI
    so the process-wide per-store inert cache neither reads the real
    local filesystem's verdict nor poisons it for other tests."""

    def __init__(self, fs):
        self.__dict__["_fs"] = fs

    def setTimes(self, *args):
        return None

    def getUri(self):
        return "inert://settimes-noop-test"

    def __getattr__(self, name):
        return getattr(self._fs, name)


def test_lease_heartbeat_survives_settimes_noop_store(spark, tmp_path):
    """On S3A-class object stores `FileSystem.setTimes` is a silent
    no-op, so a heartbeat built on setTimes alone never advances the
    claim's LastModified and a slow holder is still TTL-broken there —
    the round-7 ADVICE medium finding. The refresh now verifies the
    mtime advanced and falls back to re-landing the claim file
    (`create(overwrite=True)` refreshes LastModified on every store):
    with setTimes inert on BOTH contenders, a holder outliving 3x the
    TTL must keep the lease (final counter 2, no lost update), and the
    holder must have detected the inert store."""
    target = str(tmp_path / "t")
    counter = tmp_path / "counter.txt"
    counter.write_text("0")
    ttl = 0.6  # heartbeat period = ttl/3 = 0.2 s
    leases = []

    def bump(hold_s: float) -> None:
        lease = WriterLease(
            spark, target, ttl_s=ttl, timeout_s=30.0, poll_s=0.05
        )
        lease._fs = _InertSetTimesFS(lease._fs)
        leases.append(lease)
        with lease:
            v = int(counter.read_text())
            time.sleep(hold_s)
            counter.write_text(str(v + 1))

    slow = threading.Thread(target=bump, args=(3 * ttl,))
    slow.start()
    time.sleep(0.2)  # ensure the slow writer holds first
    fast = threading.Thread(target=bump, args=(0.05,))
    fast.start()
    slow.join()
    fast.join()
    assert counter.read_text() == "2", "waiter broke a live holder"
    assert leases[0]._settimes_inert, "inert setTimes went undetected"


def test_lease_order_is_token_not_mtime(spark, tmp_path):
    """Holder order is the bakery token embedded in the claim NAME, not
    the store mtime: on a second-granularity store (S3A LastModified)
    two claims can tie or even invert on mtime. Backdating the later
    claim below the holder's mtime must NOT steal the lease."""
    target = str(tmp_path / "t")
    a = WriterLease(spark, target, timeout_s=0.0)
    b = WriterLease(spark, target, timeout_s=0.0)
    assert a.try_acquire()
    b._land_claim()
    # simulate coarse timestamps: b's claim now sorts BEFORE a's on mtime
    b._fs.setTimes(b._claim, int(time.time() * 1000.0) - 5000, -1)
    assert not b._is_holder(), "mtime inversion stole the lease"
    assert a._is_holder()
    a.release()
    b.release()


def test_try_acquire_withdraws_claim_on_failure(spark, tmp_path):
    """A failed try_acquire is side-effect-free: the loser's claim is
    withdrawn, so a caller that backs off without release() never
    wedges the queue for up to ttl_s behind an abandoned claim."""
    target = str(tmp_path / "t")
    a = WriterLease(spark, target, timeout_s=0.0)
    a.acquire()
    b = WriterLease(spark, target, timeout_s=0.0)
    assert not b.try_acquire()
    names = [f.getPath().getName() for f in a._fs.listStatus(a._dir)]
    assert names == [f"claim-{a._token:020d}-{a.owner}"]
    a.release()
    c = WriterLease(spark, target, timeout_s=1.0, poll_s=0.02)
    c.acquire()  # instant: no abandoned claim ahead of it
    c.release()


def test_concurrent_overwrite_serializes(spark, tmp_path):
    """Two writers racing the same partition serialize via the lease:
    both complete, the survivor is exactly ONE writer's consistent
    output (no mixed-file partition), and the table stays readable."""
    path = str(tmp_path / "fuel_price")
    d = dt.date(2026, 8, 3)
    schema = SCHEMA + ", date date"
    # enough rows for a multi-file write so interleaving would be visible
    frame_a = spark.createDataFrame(
        [(f"loc{i}", "Diesel", 1.0, d) for i in range(200)], schema
    ).repartition(8)
    frame_b = spark.createDataFrame(
        [(f"loc{i}", "Diesel", 2.0, d) for i in range(200)], schema
    ).repartition(8)
    errs: list = []

    def write(df):
        try:
            overwrite_date_partition(df, path)
        except Exception as e:  # pragma: no cover - failure recorded for assert
            errs.append(e)

    threads = [threading.Thread(target=write, args=(f,)) for f in (frame_a, frame_b)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    rows = spark.read.parquet(path).collect()
    prices = {r.price for r in rows}
    assert len(rows) == 200, f"mixed partition: {len(rows)} rows"
    assert prices in ({1.0}, {2.0}), f"interleaved writers: {prices}"
