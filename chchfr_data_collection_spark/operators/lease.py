"""Writer fencing for non-transactional sinks: a lease-file protocol.

The rename-swap MERGE sink (streaming/events.py:foreach_batch_upsert)
and the dynamic-partition daily overwrite (operators/upsert.py:
overwrite_date_partition) emulate the reference's transactional
`INSERT ... ON CONFLICT` (dag_daily_fuel_price_generation.py:120-125 /
dag_collection_data_from_mobil.py:88-96) over plain parquet. Each call
is individually idempotent, but two CONCURRENT writers on the same
target were last-writer-wins with no fencing: writer A could read the
pre-B target, then publish over B's freshly-renamed result, silently
dropping B's rows (the lost-update anomaly a real MERGE forbids).

`WriterLease` closes that window with the standard create-if-absent
lease file next to the target:

- acquire = atomic zero-length file creation via the Hadoop FileSystem
  API (`FileSystem.createNewFile` — atomic on HDFS; on S3A, conditional
  create; on the local FS, atomic via O_CREAT|O_EXCL), so exactly one
  writer holds the target at a time;
- a TTL makes crashed holders recoverable: a lease older than `ttl_s`
  is presumed orphaned and broken (delete + re-race) — the trade
  every lease system makes (Chubby/ZooKeeper ephemeral nodes) without
  a coordination service on the classpath;
- `timeout_s` lets the loser wait-and-retry instead of failing, so two
  daily jobs racing the same date serialize instead of erroring. The
  default budget is sized for a CONTENDED box: the holder's write phase
  can stretch many times its idle duration under external load, and a
  waiting writer is far cheaper than a failed daily job, so the loser
  waits minutes (with exponential backoff polling, capped so a freed
  lease is still picked up promptly), not seconds.

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
    """Mutual exclusion on a storage path via an atomic lease file.

    Usage::

        with WriterLease(spark, target_path):
            ... read-merge-publish ...

    The lease file lives at `{target}__lease` so it never collides with
    the target directory itself (parquet readers don't glob siblings).
    """

    def __init__(
        self,
        spark,
        target_path: str,
        ttl_s: float = 600.0,
        timeout_s: float = 300.0,
        poll_s: float = 0.1,
        poll_max_s: float = 2.0,
    ) -> None:
        self._spark = spark
        self.lease_path = f"{target_path.rstrip('/')}__lease"
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        self.poll_s = poll_s
        self.poll_max_s = poll_max_s
        self.owner = uuid.uuid4().hex
        jvm = spark._jvm
        self._HPath = jvm.org.apache.hadoop.fs.Path
        self._lease = self._HPath(self.lease_path)
        self._fs = self._lease.getFileSystem(spark._jsc.hadoopConfiguration())
        self._held = False

    def _lease_age_s(self) -> float | None:
        """Age of the current lease file, or None if absent."""
        try:
            st = self._fs.getFileStatus(self._lease)
        except Exception:
            return None  # vanished between exists-check and stat: treat as free
        return max(0.0, time.time() - st.getModificationTime() / 1000.0)

    def try_acquire(self) -> bool:
        """One non-blocking acquisition attempt (breaks stale leases)."""
        if self._fs.createNewFile(self._lease):
            self._held = True
            return True
        age = self._lease_age_s()
        if age is not None and age > self.ttl_s:
            # presumed-orphaned lease: break it and re-race the create —
            # the delete+create is NOT atomic, so we race other breakers
            # through createNewFile again rather than claiming directly
            self._fs.delete(self._lease, False)
            if self._fs.createNewFile(self._lease):
                self._held = True
                return True
        return False

    def acquire(self) -> None:
        deadline = time.monotonic() + self.timeout_s
        poll = self.poll_s
        while True:
            if self.try_acquire():
                return
            now = time.monotonic()
            if now >= deadline:
                raise ConcurrentWriteError(
                    f"another writer holds {self.lease_path} "
                    f"(waited {self.timeout_s}s; lease TTL {self.ttl_s}s)"
                )
            # exponential backoff, capped: cheap on a long wait, still
            # sub-`poll_max_s` latency to grab a freed lease
            time.sleep(min(poll, deadline - now))
            poll = min(poll * 2, self.poll_max_s)

    def release(self) -> None:
        if self._held:
            self._fs.delete(self._lease, False)
            self._held = False

    def __enter__(self) -> "WriterLease":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
