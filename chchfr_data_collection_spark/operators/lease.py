"""Writer fencing for non-transactional sinks: a claim-file lease.

The rename-swap MERGE sink (streaming/events.py:foreach_batch_upsert)
and the dynamic-partition daily overwrite (operators/upsert.py:
overwrite_date_partition) emulate the reference's transactional
`INSERT ... ON CONFLICT` (dag_daily_fuel_price_generation.py:120-125 /
dag_collection_data_from_mobil.py:88-96) over plain parquet. Each call
is individually idempotent, but two CONCURRENT writers on the same
target were last-writer-wins with no fencing: writer A could read the
pre-B target, then publish over B's freshly-renamed result, silently
dropping B's rows (the lost-update anomaly a real MERGE forbids).

`WriterLease` closes that window. Protocol history matters here: the
first implementation used a single create-if-absent lease FILE via
`FileSystem.createNewFile`, assuming atomicity — but Hadoop's
`FileSystem.createNewFile` is explicitly "not atomic" on several
filesystems: `ChecksumFileSystem`/`RawLocalFileSystem` implement it as
exists-check-then-create, so two same-millisecond writers could BOTH
"create" the lease and interleave their commit phases (observed in
round 5 as a nested `date=X/date=X` partition from two dynamic
overwrites renaming into each other). The fix is the CLAIM-DIRECTORY
protocol (ZooKeeper sequential-ephemeral-node shape, no coordination
service needed):

- every contender atomically lands a UNIQUE claim file
  `{target}__lease/claim-<owner>` (unique name -> no create contention
  at all);
- after a settle delay (>= timestamp granularity, so every claim that
  could sort before mine is visible), the holder is the claim with the
  smallest (mtime, name) — a deterministic total order every contender
  computes identically from a directory listing;
- losers poll with capped exponential backoff until they become the
  minimum or the wait budget expires;
- a TTL makes crashed holders recoverable: claims older than `ttl_s`
  are presumed orphaned and deleted by any waiter — the trade every
  lease system makes (Chubby/ZooKeeper ephemerals);
- release deletes the holder's own claim file only.

This is fencing for cooperating writers (both sides use the lease), the
same contract Delta's optimistic log gives cooperating Delta writers. A
rogue writer that ignores the lease is out of scope — as it is for any
table format.
"""

from __future__ import annotations

import time
import uuid


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the lease and the wait budget is exhausted."""


class WriterLease:
    """Mutual exclusion on a storage path via an ordered claim directory.

    Usage::

        with WriterLease(spark, target_path):
            ... read-merge-publish ...

    Claims live under `{target}__lease/` so they never collide with the
    target directory itself (parquet readers don't glob siblings).
    """

    def __init__(
        self,
        spark,
        target_path: str,
        ttl_s: float = 600.0,
        timeout_s: float = 300.0,
        poll_s: float = 0.1,
        poll_max_s: float = 2.0,
        settle_s: float = 0.05,
    ) -> None:
        self._spark = spark
        self.lease_dir = f"{target_path.rstrip('/')}__lease"
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        self.poll_s = poll_s
        self.poll_max_s = poll_max_s
        self.settle_s = settle_s
        self.owner = uuid.uuid4().hex
        jvm = spark._jvm
        self._HPath = jvm.org.apache.hadoop.fs.Path
        self._dir = self._HPath(self.lease_dir)
        self._claim = self._HPath(f"{self.lease_dir}/claim-{self.owner}")
        self._fs = self._dir.getFileSystem(spark._jsc.hadoopConfiguration())
        self._held = False
        self._claimed = False

    # -- claim bookkeeping ---------------------------------------------------

    def _land_claim(self) -> None:
        """Create this contender's unique claim file (no contention: the
        name embeds the owner uuid, so creation always succeeds)."""
        if self._claimed:
            return
        self._fs.mkdirs(self._dir)
        self._fs.create(self._claim, True).close()
        self._claimed = True

    def _list_claims(self):
        """[(mtime_ms, name)] of live claims; deletes stale ones (age >
        ttl) along the way — any waiter may break an orphaned claim."""
        try:
            statuses = self._fs.listStatus(self._dir)
        except Exception:
            return []
        now_ms = time.time() * 1000.0
        live = []
        for st in statuses:
            name = st.getPath().getName()
            if not name.startswith("claim-"):
                continue
            mt = st.getModificationTime()
            if now_ms - mt > self.ttl_s * 1000.0:
                if name != f"claim-{self.owner}":
                    try:
                        self._fs.delete(st.getPath(), False)
                    except Exception:
                        pass  # another waiter broke it first
                continue
            live.append((mt, name))
        return live

    def _is_holder(self) -> bool:
        """True when this owner's claim is the (mtime, name) minimum."""
        live = self._list_claims()
        mine = f"claim-{self.owner}"
        if not any(name == mine for _, name in live):
            # our claim aged out or was broken: re-land and re-contend
            self._claimed = False
            return False
        return min(live)[1] == mine

    # -- public protocol -----------------------------------------------------

    def try_acquire(self) -> bool:
        """One non-blocking acquisition attempt."""
        self._land_claim()
        time.sleep(self.settle_s)  # claims that can sort before ours land
        if self._is_holder():
            self._held = True
            return True
        return False

    def acquire(self) -> None:
        deadline = time.monotonic() + self.timeout_s
        self._land_claim()
        time.sleep(self.settle_s)
        poll = self.poll_s
        while True:
            if not self._claimed:
                self._land_claim()
                time.sleep(self.settle_s)
            if self._is_holder():
                self._held = True
                return
            now = time.monotonic()
            if now >= deadline:
                self.release()
                raise ConcurrentWriteError(
                    f"another writer holds {self.lease_dir} "
                    f"(waited {self.timeout_s}s; lease TTL {self.ttl_s}s)"
                )
            # exponential backoff, capped: cheap on a long wait, still
            # sub-`poll_max_s` latency to take over a released lease
            time.sleep(min(poll, deadline - now))
            poll = min(poll * 2, self.poll_max_s)

    def release(self) -> None:
        if self._claimed:
            try:
                self._fs.delete(self._claim, False)
            except Exception:
                pass  # claim already broken as stale — nothing to release
            self._claimed = False
        self._held = False

    def __enter__(self) -> "WriterLease":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
