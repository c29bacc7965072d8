"""Writer fencing for non-transactional sinks: a bakery-ordered claim lease.

The rename-swap MERGE sink (streaming/events.py:foreach_batch_upsert)
and the dynamic-partition daily overwrite (operators/upsert.py:
overwrite_date_partition) emulate the reference's transactional
`INSERT ... ON CONFLICT` (dag_daily_fuel_price_generation.py:120-125 /
dag_collection_data_from_mobil.py:88-96) over plain parquet. Each call
is individually idempotent, but two CONCURRENT writers on the same
target were last-writer-wins with no fencing: writer A could read the
pre-B target, then publish over B's freshly-renamed result, silently
dropping B's rows (the lost-update anomaly a real MERGE forbids).

`WriterLease` closes that window. Protocol history matters here:

1. The first implementation used a single create-if-absent lease FILE
   via `FileSystem.createNewFile`, assuming atomicity — but Hadoop's
   `createNewFile` is explicitly "not atomic" on several filesystems
   (ChecksumFileSystem / RawLocalFileSystem implement it as
   exists-check-then-create), so two same-instant writers could BOTH
   "create" the lease (observed in round 5 as a nested `date=X/date=X`
   partition from two dynamic overwrites renaming into each other).
2. The second implementation (round 5) used a claim DIRECTORY ordered
   by (mtime, name). Two residual defects, both flagged by the round-5
   review: (a) the order depended on store modification-time
   granularity — on second-granularity stores (S3A `LastModified`) two
   claims landing in the same tick tie on mtime and the uuid tie-break
   can hand the lease to the later writer while the earlier one already
   believes it holds; (b) a holder never refreshed its claim, so a
   protected section that legitimately outlives `ttl_s` (routine at
   100 TB partition sizes) had its claim broken by a waiter mid-commit
   — the lost-update window reopened for slow holders.

This (third) implementation fixes both at the root:

- **Ordering is a client-side monotonic TOKEN, not a store timestamp**
  (Lamport's bakery algorithm over a directory listing). Each
  contender (i) lands a `choosing-<owner>` marker, (ii) lists existing
  claims and takes token = max(token)+1, (iii) lands its unique claim
  file `claim-<token:020d>-<owner>` (zero-padded, so lexicographic
  name order == (token, owner) order), (iv) deletes its choosing
  marker. The holder is the lexicographically-smallest live claim —
  but only once NO other contender's choosing marker is visible: a
  chooser that started before my check may still be about to land a
  tied token, and the bakery wait makes the order stable before anyone
  trusts it. Ties (both listed before either landed) break on the
  owner uuid — a deterministic total order every contender computes
  identically, with NO dependency on store timestamp granularity.
- **A held lease heartbeats — with a refresh that works on object
  stores.** While held, a daemon thread refreshes the claim's mtime
  every `ttl_s / 3`, so the waiters' staleness check (`age > ttl_s` ⇒
  orphaned, break it) never fires on a LIVE holder no matter how long
  the protected section runs. `FileSystem.setTimes` is the cheap
  refresh, but setTimes is a DOCUMENTED NO-OP in the Hadoop FileSystem
  base class and on S3A-class object stores (S3 objects are immutable;
  LastModified can't be touched in place) — exactly the stores this
  module targets. So the first refresh PROBES the store once: a
  throwaway file's mtime is setTimes'd to a sentinel deep in the past
  and read back — if it didn't move, setTimes is inert there, and
  every refresh instead re-lands the claim file
  (`create(overwrite=True)` re-puts the object, which refreshes
  LastModified on every store). The probe is deterministic at any TTL
  (no "did now-ish move to now" ambiguity against mtime granularity),
  and its verdict sticks, so steady state on an object store pays one
  put per refresh. TTL-breaking now only reclaims claims
  whose writer actually stopped heartbeating — crashed or partitioned
  — the trade every lease system makes (Chubby/ZooKeeper session
  ephemerals). Staleness compares local clock to store mtime, so
  `ttl_s` must exceed worst-case client↔store clock skew by a wide
  margin (default 600 s).
- Losers poll with capped exponential backoff; release deletes the
  holder's own claim file only; a failed `try_acquire` removes its
  claim before returning so a non-context-manager caller that backs
  off never wedges the queue behind an abandoned claim.

Correctness needs list-after-write consistency from the store (true of
local filesystems, HDFS, and S3 since 2020-12). `settle_s` is a small
optional cushion after landing a claim, kept for stores with delayed
list visibility — the protocol's correctness no longer rests on it.

This is fencing for cooperating writers (both sides use the lease), the
same contract Delta's optimistic log gives cooperating Delta writers. A
rogue writer that ignores the lease is out of scope — as it is for any
table format.
"""

from __future__ import annotations

import threading
import time
import uuid


class ConcurrentWriteError(RuntimeError):
    """Another writer holds the lease and the wait budget is exhausted."""


class WriterLease:
    """Mutual exclusion on a storage path via a bakery-ordered claim dir.

    Usage::

        with WriterLease(spark, target_path):
            ... read-merge-publish ...

    Claims live under `{target}__lease/` so they never collide with the
    target directory itself (parquet readers don't glob siblings).
    """

    # setTimes-inert verdicts, keyed by filesystem URI: one probe per
    # STORE per process, not one per lease instance — a busy writer
    # creates many short-lived leases against the same store
    _settimes_inert_by_fs: dict[str, bool] = {}

    def __init__(
        self,
        spark,
        target_path: str,
        ttl_s: float = 600.0,
        timeout_s: float = 300.0,
        poll_s: float = 0.1,
        poll_max_s: float = 2.0,
        settle_s: float = 0.05,
        choose_ttl_s: float = 30.0,
        heartbeat: bool = True,
    ) -> None:
        self._spark = spark
        self.lease_dir = f"{target_path.rstrip('/')}__lease"
        self.ttl_s = ttl_s
        self.timeout_s = timeout_s
        self.poll_s = poll_s
        self.poll_max_s = poll_max_s
        self.settle_s = settle_s
        self.choose_ttl_s = choose_ttl_s
        self.heartbeat = heartbeat
        self.owner = uuid.uuid4().hex
        jvm = spark._jvm
        self._HPath = jvm.org.apache.hadoop.fs.Path
        self._dir = self._HPath(self.lease_dir)
        self._choosing = self._HPath(f"{self.lease_dir}/choosing-{self.owner}")
        self._fs = self._dir.getFileSystem(spark._jsc.hadoopConfiguration())
        self._token: int | None = None
        self._claim = None  # set once a token is chosen
        self._claimed = False
        # None = not yet probed; True = store ignores setTimes (S3A-class)
        self._settimes_inert: bool | None = None
        self._held = False
        self._hb_stop = threading.Event()
        self._hb_thread: threading.Thread | None = None

    # -- claim bookkeeping ---------------------------------------------------

    @staticmethod
    def _parse_token(name: str) -> int | None:
        # claim-<020d token>-<owner hex>
        parts = name.split("-", 2)
        if len(parts) != 3 or parts[0] != "claim" or not parts[1].isdigit():
            return None
        return int(parts[1])

    def _land_claim(self) -> None:
        """Choose a bakery token and land this contender's unique claim.

        The choosing marker makes the token pick safe: any holder-check
        running concurrently refuses to trust the order until our marker
        clears, by which point our claim (possibly tied, tie broken on
        owner uuid — deterministic for everyone) is visible.
        """
        if self._claimed:
            return
        self._fs.mkdirs(self._dir)
        if self._token is None:
            self._fs.create(self._choosing, True).close()
            try:
                max_tok = 0
                try:
                    for st in self._fs.listStatus(self._dir):
                        tok = self._parse_token(st.getPath().getName())
                        if tok is not None:
                            max_tok = max(max_tok, tok)
                except Exception:
                    pass
                self._token = max_tok + 1
                self._claim = self._HPath(
                    f"{self.lease_dir}/claim-{self._token:020d}-{self.owner}"
                )
                self._fs.create(self._claim, True).close()
            finally:
                try:
                    self._fs.delete(self._choosing, False)
                except Exception:
                    pass
        else:
            # re-land a claim that a waiter broke (e.g. clock skew beat
            # the heartbeat): same token, so our queue position holds
            self._fs.create(self._claim, True).close()
        self._claimed = True

    def _live_entries(self):
        """(claim_names, others_choosing) from one listing; stale claims
        (age > ttl — their writer stopped heartbeating) and stale
        choosing markers (crashed mid-choose) are broken along the way."""
        try:
            statuses = self._fs.listStatus(self._dir)
        except Exception:
            return [], False
        now_ms = time.time() * 1000.0
        mine = f"claim-{self._token:020d}-{self.owner}" if self._token else ""
        claims, others_choosing = [], False
        for st in statuses:
            name = st.getPath().getName()
            age_ms = now_ms - st.getModificationTime()
            if name.startswith("choosing-"):
                if name == f"choosing-{self.owner}":
                    continue
                if age_ms > self.choose_ttl_s * 1000.0:
                    try:
                        self._fs.delete(st.getPath(), False)
                    except Exception:
                        pass
                else:
                    others_choosing = True
                continue
            if self._parse_token(name) is None:
                continue
            if age_ms > self.ttl_s * 1000.0 and name != mine:
                try:
                    self._fs.delete(st.getPath(), False)
                except Exception:
                    pass  # another waiter broke it first
                continue
            claims.append(name)
        return claims, others_choosing

    def _is_holder(self) -> bool:
        """True when the order is stable (nobody mid-choose) and this
        owner's claim is the (token, owner) minimum."""
        claims, others_choosing = self._live_entries()
        mine = f"claim-{self._token:020d}-{self.owner}"
        if mine not in claims:
            # our claim was broken: re-land (same token) and re-contend
            self._claimed = False
            return False
        if others_choosing:
            return False
        return min(claims) == mine

    # -- heartbeat -----------------------------------------------------------

    def _settimes_is_inert(self) -> bool:
        """One-time probe: does this store's setTimes actually move
        mtimes? A throwaway file is setTimes'd to a sentinel deep in
        the past and read back — an inert store (S3A, base-class
        default) leaves it at ~now. Deterministic at any TTL, unlike
        checking whether a just-refreshed claim's mtime is 'recent'
        (it always is, the file was just created). The dotfile name is
        invisible to _live_entries (not a claim, not a choosing
        marker)."""
        if self._settimes_inert is None:
            try:
                fs_key = str(self._fs.getUri())
            except Exception:
                fs_key = ""
            cached = self._settimes_inert_by_fs.get(fs_key) if fs_key else None
            if cached is not None:
                self._settimes_inert = cached
                return cached
            probe = self._HPath(f"{self.lease_dir}/.settimes-probe-{self.owner}")
            sentinel = 1_000_000_000_000  # 2001-09-09: unambiguous past
            try:
                self._fs.create(probe, True).close()
                self._fs.setTimes(probe, sentinel, -1)
                got = self._fs.getFileStatus(probe).getModificationTime()
                # second-granularity stores round; anything NEAR the
                # sentinel (vs ~now) means setTimes took effect
                self._settimes_inert = abs(got - sentinel) > 2000
            except Exception:
                self._settimes_inert = True  # unsupported => same as inert
            finally:
                try:
                    self._fs.delete(probe, False)
                except Exception:
                    pass
            if fs_key:
                self._settimes_inert_by_fs[fs_key] = self._settimes_inert
        return self._settimes_inert

    def _refresh_claim(self) -> None:
        """Advance the claim's store mtime so the staleness check never
        fires on a live contender: `setTimes` where the store honors
        it, re-landing the claim file (`create(overwrite=True)` re-puts
        the object, refreshing LastModified on every store) where it
        does not — see _settimes_is_inert."""
        try:
            if self._settimes_is_inert():
                self._fs.create(self._claim, True).close()
            else:
                self._fs.setTimes(self._claim, int(time.time() * 1000.0), -1)
        except Exception:
            # claim vanished (broken despite the refresh — clock skew):
            # re-land with the same token to restore our position
            try:
                self._fs.create(self._claim, True).close()
            except Exception:
                pass

    def _hb_loop(self) -> None:
        period = max(0.02, self.ttl_s / 3.0)
        while not self._hb_stop.wait(period):
            self._refresh_claim()

    def _start_heartbeat(self) -> None:
        if not self.heartbeat or self._hb_thread is not None:
            return
        self._hb_stop.clear()
        self._hb_thread = threading.Thread(
            target=self._hb_loop, name=f"lease-hb-{self.owner[:8]}", daemon=True
        )
        self._hb_thread.start()

    def _stop_heartbeat(self) -> None:
        if self._hb_thread is None:
            return
        self._hb_stop.set()
        self._hb_thread.join(timeout=5.0)
        self._hb_thread = None

    # -- public protocol -----------------------------------------------------

    def try_acquire(self) -> bool:
        """One non-blocking acquisition attempt. Side-effect-free on
        failure: the claim is withdrawn, so a caller that backs off
        without release() never blocks other writers."""
        self._land_claim()
        if self.settle_s:
            time.sleep(self.settle_s)
        if self._is_holder():
            self._held = True
            self._start_heartbeat()
            return True
        self._withdraw_claim()
        return False

    def acquire(self) -> None:
        deadline = time.monotonic() + self.timeout_s
        self._land_claim()
        if self.settle_s:
            time.sleep(self.settle_s)
        poll = self.poll_s
        last_touch = time.monotonic()
        while True:
            if not self._claimed:
                self._land_claim()
                if self.settle_s:
                    time.sleep(self.settle_s)
            elif time.monotonic() - last_touch > self.ttl_s / 3.0:
                # a QUEUED claim ages too: refresh it (same verified
                # refresh as the holder heartbeat) so a long wait behind
                # a long-running holder never looks orphaned
                self._refresh_claim()
                last_touch = time.monotonic()
            if self._is_holder():
                self._held = True
                self._start_heartbeat()
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

    def _withdraw_claim(self) -> None:
        if self._claimed and self._claim is not None:
            try:
                self._fs.delete(self._claim, False)
            except Exception:
                pass  # claim already broken as stale — nothing to delete
            self._claimed = False
        # a fresh token is chosen on the next landing: a withdrawn
        # contender re-enters at the back of the queue, never ahead of
        # claims that were landed while it was out
        self._token = None
        self._claim = None

    def release(self) -> None:
        self._stop_heartbeat()
        self._withdraw_claim()
        self._held = False

    def __enter__(self) -> "WriterLease":
        self.acquire()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
