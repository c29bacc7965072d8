"""Persisted component-assignment store: incremental CC's serving state.

`queries.extras.dedup_cc_incremental` folds a delta batch's near-dup
pairs into an EXISTING (node, component) assignment without
re-clustering the landed corpus — but until round 11 that landed
assignment lived in a session cache, explicitly documented as the
stand-in for "the persisted assignment table the clustering pipeline
keeps next to the MinHash index". This module is that table (round-10
verdict, next #1): the MinHash index's productization arc (persisted
store → idempotent delta landing → lifecycle → takedowns) applied to
the clustering leg, so a crawl loop can maintain dedup clusters ACROSS
sessions, not just within one.

Layout (one parquet relation plus metadata under a base path):

- `assignments/` — (node, component), partitioned by `seq` (a
  zero-padded store-assigned sequence number): the bootstrap base plus
  one PATCH partition per applied delta. A patch holds ONLY the rows
  that changed — landed nodes whose component was merged into a
  smaller-id component, plus first-seen nodes — so a delta's write is
  O(delta + touched components), never O(corpus).
- `_landed/<seq>.<delta_id>` — empty marker, written AFTER a
  partition's write commits. The read view resolves through these:
  `labels()` reads only marked partitions and keeps, per node, the row
  from the HIGHEST marked seq (last-writer-wins). A crashed or
  mid-flight write's partition has no marker and is invisible — the
  same probe-visibility discipline as the MinHash index's fold
  manifests, but last-writer-wins makes it sufficient on its own: no
  two-phase fold manifest is needed anywhere in this store (see
  compact()).
- `_intent/<delta_id>` — records the seq an apply() attempt took,
  BEFORE it writes. A retry of a crashed apply finds the intent, wipes
  the orphaned unmarked partition, and lands under a FRESH seq — fresh
  rather than reused, because the retry recomputes its patch against
  the CURRENT resolved view (which may include deltas landed after the
  crash), and re-using the old, lower seq would let those newer
  deltas' rows win last-writer-wins over rows computed from a strictly
  newer view.
- `_deleted/` — (node), partitioned by forget_id: right-to-be-
  forgotten tombstones, anti-joined by every read (the MinHash index's
  forget() contract: result-level erasure now, byte-level at the next
  `compact(purge_forgotten=True)`). A forgotten node that re-enters
  via a later delta's pairs stays hidden until the tombstones clear.
- `_schema.json` — pinned read schema (node keeps the bootstrap
  caller's type), written at bootstrap: reads never pay footer
  inference and an emptied store reads as empty.

Why last-writer-wins needs no fold manifest: applying a pair batch is
a MONOTONE merge (components only ever coalesce toward smaller
representative ids), so re-applying an already-applied delta computes
an EMPTY patch against the current view — apply() is naturally
idempotent under at-least-once delivery (a foreachBatch replay after
checkpoint loss re-applies and lands nothing). compact() exploits the
same property: it writes the fully-resolved view as one fresh highest-
seq partition (marker after write), then deletes the folded sources —
a crash at ANY point between leaves a view that resolves identically
(the gen partition supersedes every source row it duplicates), so
recovery is simply "retry compact()".

Correctness of the incremental fold (the dedup_cc_incremental
argument, now load-bearing for the store): landed components are
labeled by their MINIMUM node id, so every contracted vertex is a real
node id minimal in its landed part; star-contraction CC over the
contracted delta graph therefore yields the true minimum of each
merged component, and components the delta never touches keep their
labels because no patch row names them. The fixed point after any
sequence of apply() calls equals batch CC over the union of all pairs
ever applied — which is the registered oracle — with one carve-out:
pairs are SEVERED at endpoints tombstoned at apply time (forgotten
nodes never bridge components; the surviving endpoint still enters as
a singleton), so under takedowns the fixed point is batch CC over the
union of the per-apply SEVERED pair batches.

At 100 TB: `labels()` (the serving read) is one shuffle on node over
base + patches (steady-state patches are delta-sized; compact() folds
them back into one base, keeping the resolve cheap). `apply_pairs` is
stricter — nothing in it shuffles the corpus assignment: endpoint
labels resolve through a broadcast semi-join + delta-sized groupBy,
CC runs on the contracted O(delta + touched components) graph, and
the relabel of touched components is a MAP-ONLY scan of the
assignment against a broadcast (old label -> new label) map — sound
because labels only ever decrease, so stale patch rows can never
match a current label (see _apply_pairs_locked). The one full pass
apply pays is that map-side scan; its shuffle volume is zero.

Concurrent WRITERS on one store need the WriterLease fence
(operators/lease.py), exactly as for the MinHash index; forget() is
lock-free (a takedown must not queue behind maintenance) and safe
against a racing purge via the same content-fingerprint guard the
MinHash index uses.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import connected_components, materialize
from .store_base import TOMBSTONE_BROADCAST_BYTES, StoreKernel, _UNSET

# kept name: the byte bound below which tombstone sets broadcast
CS_TOMBSTONE_BROADCAST_BYTES = TOMBSTONE_BROADCAST_BYTES


class ComponentStore(StoreKernel):
    """A persisted, incrementally-maintained (node, component) table.

    Usage (the production clustering loop)::

        store = ComponentStore(spark, store_path)
        store.bootstrap(initial_pairs)        # once: batch CC
        store.apply_pairs(delta_pairs, "b1")  # per arriving pair batch
        labels = store.labels()               # the serving view
    """

    TOMBSTONE_KEY = "node"

    def __init__(self, spark: SparkSession, base_path: str) -> None:
        self._init_kernel(spark, base_path)
        self.assign_path = f"{self.base_path}/assignments"
        self.landed_path = f"{self.base_path}/_landed"
        self.intent_path = f"{self.base_path}/_intent"
        self.schema_path = f"{self.base_path}/_schema.json"
        # retention floor (round 14): patches with seq below the
        # ledger's `before` were expired — labels(as_of) below it
        # refuses, and maintenance calls sweep any leftovers
        self.expired_ledger_path = f"{self.base_path}/_expired.json"
        self._schema = None

    # filesystem plumbing, tombstone cache, fingerprints: StoreKernel
    # (operators/store_base.py — the shared idioms, round-11 next #6)

    # -- markers -------------------------------------------------------------

    def _marked(self) -> dict[int, str]:
        """{seq: delta_id} of partitions whose write COMMITTED — the
        resolve view's allow-list."""
        fs, HPath = self._fs()
        if not fs.exists(HPath(self.landed_path)):
            return {}
        out = {}
        for st in fs.listStatus(HPath(self.landed_path)):
            name = st.getPath().getName()
            if st.isFile() and len(name) > 9 and name[:8].isdigit():
                out[int(name[:8])] = name[9:]
        return out

    def _mark(self, seq: int, delta_id: str) -> None:
        fs, HPath = self._fs()
        fs.create(HPath(f"{self.landed_path}/{seq:08d}.{delta_id}"), True).close()

    def _unmark(self, seq: int, delta_id: str) -> None:
        fs, HPath = self._fs()
        fs.delete(HPath(f"{self.landed_path}/{seq:08d}.{delta_id}"), False)

    def _max_seq(self) -> int:
        """Highest seq any attempt ever RESERVED (intents included, so
        a crashed attempt's number is never re-issued to a different
        delta while its orphan partition may still exist)."""
        fs, HPath = self._fs()
        mx = max(self._marked(), default=0)
        if fs.exists(HPath(self.intent_path)):
            for st in fs.listStatus(HPath(self.intent_path)):
                obj = self._read_json(st.getPath().toString())
                if isinstance(obj, dict) and "seq" in obj:
                    mx = max(mx, int(obj["seq"]))
        return mx

    def _require_bootstrapped(self) -> None:
        if self._read_json(self.schema_path) is None:
            raise RuntimeError(
                f"ComponentStore at {self.base_path} has no schema "
                "sidecar — bootstrap() it before applying deltas or "
                "reading labels (a crashed bootstrap leaves the same "
                "state: rebootstrap)."
            )

    def _read_schema(self):
        """The pinned read schema from the `_schema.json` sidecar —
        cached per instance, freshness-checked per call against the
        sidecar file's (mtime, size): a REBOOTSTRAP through another
        handle rewrites it, and a long-lived reader must not read the
        new corpus under the old pinned node type (round-14 cache
        audit, the `_deleted_seq` discipline at one getFileStatus per
        call). A (None, schema) entry is the in-flight bootstrap's own
        priming — the sidecar is written LAST, after the patch that
        needs the schema."""
        from pyspark.sql.types import StructType

        if self._schema is not None and self._schema[0] is None:
            return self._schema[1]
        self._require_bootstrapped()
        fs, HPath = self._fs()
        st = fs.getFileStatus(HPath(self.schema_path))
        stamp = (int(st.getModificationTime()), int(st.getLen()))
        if self._schema is not None and self._schema[0] == stamp:
            return self._schema[1]
        schema = StructType.fromJson(self._read_json(self.schema_path))
        self._schema = (stamp, schema)
        return schema

    # -- tombstones (right-to-be-forgotten) ----------------------------------

    def _tombstone_key_type(self):
        return self._read_schema()["node"].dataType

    def forget(self, node_ids: DataFrame, forget_id: str) -> None:
        """Tombstone nodes out of the assignment — every subsequent
        `labels()` excludes them, so a takedown disappears from
        survivorship decisions immediately; byte-level erasure happens
        at the next `compact(purge_forgotten=True)`. Lock-free and
        retry-idempotent (pre-delete + dynamic overwrite of the
        forget_id's own partition); a single-column input is accepted
        under any column name. The node ids are cast to the store's
        pinned node type; a cast that nulls any id fails loudly.
        (Mechanics: StoreKernel.forget.)"""
        self._require_bootstrapped()
        StoreKernel.forget(self, node_ids, forget_id)

    def _deleted_nodes(self) -> tuple[DataFrame | None, bool]:
        """(distinct tombstoned nodes | None, fits-a-broadcast); one
        listing per instance, invalidated by forget/compact/bootstrap
        (the kernel's cached-tombstone discipline)."""
        return self._deleted_keys()

    # -- read ----------------------------------------------------------------

    def _assign_marked(self) -> DataFrame:
        """The raw (node, component, seq) rows of COMMITTED partitions —
        the pre-resolve read every view builds on."""
        self._require_bootstrapped()
        marked = sorted(self._marked())
        df = self.spark.read.schema(self._read_schema()).parquet(self.assign_path)
        if marked:
            return df.filter(F.col("seq").isin([f"{s:08d}" for s in marked]))
        return df.filter(F.lit(False))

    def history(self) -> list:
        """The committed write log, oldest first: [(seq, delta_id)].
        Each entry is a point `labels(as_of_seq=seq)` can read — the
        audit surface for "which delivery changed this cluster"."""
        return sorted(self._marked().items())

    def labels(self, as_of_seq: int | None = None) -> DataFrame:
        """The resolved (node, component) view: marked partitions only,
        per-node last-writer-wins on seq, tombstoned nodes excluded.
        One shuffle on node over base + patches — `compact()` keeps the
        patch count small.

        `as_of_seq` is the TIME-TRAVEL read: resolve only partitions
        with seq <= as_of_seq, i.e. the assignment exactly as it stood
        after that delivery committed (patches are append-only, so any
        marked prefix is a consistent historical state — the audit
        read behind "what did this cluster look like before batch X").
        Two deliberate bounds: current tombstones apply to EVERY read,
        historical included (a takedown outranks an audit — a
        forgotten node must not resurface through time travel), and
        compact() collapses history into its generation (VACUUM
        semantics) — an as_of_seq older than the oldest surviving
        partition raises instead of silently resolving a partial
        state."""
        self._require_bootstrapped()
        df = self._assign_marked()
        if as_of_seq is not None:
            exp = self._read_json(self.expired_ledger_path)
            if exp is not None and int(as_of_seq) < int(exp["before"]):
                raise ValueError(
                    f"labels(as_of_seq={as_of_seq}): patches below seq "
                    f"{exp['before']} were expired by retention on "
                    f"{self.base_path} — that historical point no "
                    "longer exists. Earliest readable point: "
                    f"{exp['before']}."
                )
            eligible = [s for s in self._marked() if s <= as_of_seq]
            if not eligible:
                raise ValueError(
                    f"no committed state at or before seq {as_of_seq} in "
                    f"{self.base_path} — it predates the store, or "
                    "compact() folded that history into a newer "
                    "generation"
                )
            df = df.filter(F.col("seq") <= f"{as_of_seq:08d}")
        resolved = df.groupBy("node").agg(
            F.max_by("component", "seq").alias("component")
        )
        return self._excl_deleted(resolved)

    # -- write ---------------------------------------------------------------

    def _land_patch(self, patch: DataFrame, delta_id: str) -> int:
        """Crash-safe landing of one partition: record intent (seq
        reservation), wipe any prior crashed attempt's orphan, write,
        mark landed, clear intent. Returns the seq used."""
        fs, HPath = self._fs()
        prior = self._read_json(f"{self.intent_path}/{delta_id}")
        if prior is not None:
            old = int(prior["seq"])
            if old not in self._marked():
                # crashed BEFORE the marker: the partition is invisible
                # but must not linger as unreadable bytes — wipe it
                fs.delete(HPath(f"{self.assign_path}/seq={old:08d}"), True)
            # else: crashed AFTER the marker (before the intent
            # cleanup) — the prior attempt COMMITTED and its partition
            # is serving; wiping it would lose landed rows. The stale
            # intent is dropped and this (re)delivery lands as its own
            # fresh — typically empty — patch.
            fs.delete(HPath(f"{self.intent_path}/{delta_id}"), False)
        seq = self._max_seq() + 1
        if seq > 99_999_999:
            # the marker name is `{seq:08d}.{delta_id}` and resolve
            # compares the zero-padded strings lexicographically — a
            # 9-digit seq would widen past the fixed field, misparse in
            # _marked()'s name[:8] and silently break the ordering
            # (round-11 ADVICE, low). 10^8 deliveries on ONE store is a
            # compact()-starved pathology, not a capacity target.
            raise RuntimeError(
                f"ComponentStore at {self.base_path} exhausted its "
                "8-digit seq space — compact() folds history and keeps "
                "seq growth bounded; this store never was."
            )
        self._write_json(f"{self.intent_path}/{delta_id}", {"seq": seq})
        (
            patch.withColumn("seq", F.lit(f"{seq:08d}"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seq")
            .parquet(self.assign_path)
        )
        self._mark(seq, delta_id)
        fs.delete(HPath(f"{self.intent_path}/{delta_id}"), False)
        return seq

    def bootstrap(
        self, pairs: DataFrame, src: str = "da", dst: str = "db"
    ) -> None:
        """Build the store from the landed corpus's near-dup pairs (one
        batch CC). Clears any previous generation FIRST and writes the
        schema sidecar LAST — it doubles as the format marker, so a
        crash anywhere in between leaves a store every other method
        refuses with 'rebootstrap required' (the MinHash index's
        marker-last bootstrap discipline)."""
        fs, HPath = self._fs()
        fs.delete(HPath(self.schema_path), False)
        for p in (
            self.assign_path,
            self.landed_path,
            self.intent_path,
            self.deleted_path,
            self.deleted_seq_path,
            self.expired_ledger_path,
        ):
            fs.delete(HPath(p), True)
        self._schema = None
        self._deleted_cache = _UNSET
        labels = connected_components(pairs, src=src, dst=dst)
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType(
            [
                labels.schema["node"],
                labels.schema["component"],
                StructField("seq", StringType()),
            ]
        )
        self._schema = (None, schema)  # in-flight bootstrap priming
        self._land_patch(labels, "bootstrap")
        self._write_json(self.schema_path, schema.jsonValue())
        self._schema = None  # re-stamp from disk on next read

    def apply_pairs(
        self, delta_pairs: DataFrame, delta_id: str, src: str = "da", dst: str = "db"
    ) -> int:
        """Fold a delta batch's near-dup pairs into the assignment —
        the dedup_cc_incremental algorithm, landed as a crash-safe
        PATCH write instead of returned: contract the delta pairs
        through the current labels, run star-contraction CC on the
        contracted (delta-sized) graph, and write only the rows whose
        label changed plus first-seen nodes. Idempotent under replay
        (an already-applied delta computes an empty patch — still
        landed, so the marker records the delivery) and safe to retry
        after a crash (see _land_patch). Returns the seq landed.

        Tombstoned nodes never re-enter AND never bridge: every pair is
        severed at a tombstoned endpoint before contraction (the
        surviving endpoint keeps a self-edge, so it still registers as
        first-seen), so a forgotten node arriving in `delta_pairs`
        neither lands rows nor merges its old component with anything —
        in both the was-the-component-minimum and was-not cases
        (round-11 ADVICE, medium). The read-side anti-join stays as the
        mask for rows landed BEFORE the forget.

        Takes the WriterLease: an apply racing a compact() would have
        its patch computed against the pre-fold view but land BELOW
        the fold's generation seq, and last-writer-wins would silently
        discard its relabels. The lease serializes the two (and any
        two concurrent appliers — same fence as every non-transactional
        writer in this repo); forget() alone stays lock-free."""
        from .lease import WriterLease

        self._require_bootstrapped()
        with WriterLease(self.spark, self.base_path):
            return self._apply_pairs_locked(delta_pairs, delta_id, src, dst)

    def _apply_pairs_locked(
        self, delta_pairs: DataFrame, delta_id: str, src: str, dst: str
    ) -> int:
        # DELTA-BOUNDED shapes throughout (the 100 TB contract): the
        # corpus assignment is never resolved corpus-wide here — labels
        # are resolved ONLY for the delta's endpoints (broadcast
        # semi-join into the marked partitions, then a delta-sized
        # groupBy), and the relabel of touched components is a MAP-ONLY
        # scan of the assignment against a broadcast (old label -> new
        # label) map. The label-match is sound because labels only ever
        # DECREASE (components merge toward their minimum id): a node's
        # stale patch rows carry strictly larger, no-longer-current
        # labels, and the map's keys are current labels — so exactly
        # the newest row of each touched node matches, once.
        dp = delta_pairs.select(F.col(src).alias("da"), F.col(dst).alias("db"))
        # SEVER tombstoned endpoints (round-11 ADVICE, medium — the one
        # chosen semantic): a forgotten node must not BRIDGE components
        # through its edges, in either direction and regardless of
        # whether its id happens to be its old component's minimum
        # (pre-fix, a tombstoned min-node re-arriving merged its whole
        # old component with the delta cluster while a non-min one did
        # not — behavior hung on an id accident). An edge touching a
        # tombstoned node on ONE side keeps its surviving endpoint as a
        # self-edge (the survivor still registers as first-seen); both
        # sides tombstoned drops the edge entirely. The severed rows
        # still LAND nothing for the forgotten node, so there is no row
        # to mask — stronger than the read-side anti-join alone.
        deleted, small = self._deleted_nodes()
        if deleted is not None:
            excl = F.broadcast(deleted) if small else deleted
            flagged = dp.join(
                excl.select(F.col("node").alias("da"), F.lit(True).alias("_ta")),
                "da",
                "left",
            ).join(
                excl.select(F.col("node").alias("db"), F.lit(True).alias("_tb")),
                "db",
                "left",
            )
            dp = (
                flagged.filter(F.col("_ta").isNull() & F.col("_tb").isNull())
                .select("da", "db")
                .unionByName(
                    flagged.filter(
                        F.col("_ta").isNotNull() & F.col("_tb").isNull()
                    ).select(F.col("db").alias("da"), "db")
                )
                .unionByName(
                    flagged.filter(
                        F.col("_ta").isNull() & F.col("_tb").isNotNull()
                    ).select("da", F.col("da").alias("db"))
                )
            )
        dp = materialize(dp, None, "")
        nodes = (
            dp.select(F.col("da").alias("node"))
            .unionByName(dp.select(F.col("db").alias("node")))
            .distinct()
        )
        assign = self._assign_marked()
        # no _excl_deleted here: tombstoned ids cannot be endpoints
        # after the sever, so the anti-join would be dead weight — and
        # excluding them from the RESOLVE was exactly the bug (a
        # tombstoned endpoint contracting as a raw vertex).
        labels_sub = (
            assign.join(F.broadcast(nodes), "node", "left_semi")
            .groupBy("node")
            .agg(F.max_by("component", "seq").alias("component"))
        ).persist()
        try:
            la = labels_sub.select(
                F.col("node").alias("da"), F.col("component").alias("ca")
            )
            lb = labels_sub.select(
                F.col("node").alias("db"), F.col("component").alias("cb")
            )
            contracted = (
                dp.join(la, "da", "left")
                .join(lb, "db", "left")
                .select(
                    F.coalesce("ca", F.col("da")).alias("da"),
                    F.coalesce("cb", F.col("db")).alias("db"),
                )
            )
            cc2 = materialize(connected_components(contracted), None, "")
            # current labels touched by the delta, and where they move
            changed_map = cc2.select(
                F.col("node").alias("component"), F.col("component").alias("newc")
            ).where(F.col("newc") != F.col("component"))
            # map-only relabel scan: every row whose CURRENT label is in
            # the map emits its new assignment (stale rows can't match —
            # see above); tombstoned nodes' rows relabel too, staying
            # read-masked
            changed = assign.join(F.broadcast(changed_map), "component").select(
                "node", F.col("newc").alias("component")
            )
            # a contracted vertex is landed iff it arrived via a label
            # (it is some labels_sub component); everything else in cc2
            # is a first-seen delta node
            reps = (
                labels_sub.select(F.col("component").alias("node")).distinct()
            )
            fresh = cc2.join(F.broadcast(reps), "node", "left_anti").select(
                "node", "component"
            )
            return self._land_patch(changed.unionByName(fresh), delta_id)
        finally:
            labels_sub.unpersist()

    # -- lifecycle -----------------------------------------------------------

    def expire(self, before_seq: int) -> dict:
        """RETENTION on the patch store (round-13 verdict, missing
        #2 / next #4 — the batch-store `expire()` contract on the seq
        layout): drop every committed patch partition with
        seq < `before_seq`. Under last-writer-wins resolve this retires
        exactly the nodes whose latest PATCH ROW predates the floor —
        and a patch row means a label CHANGE or first appearance, not
        a mere re-observation (patches hold only changed rows: a node
        whose delta pairs confirmed its existing label wrote nothing
        and ages out with its last change). The rolling-window
        semantic on this layout is therefore "forget cluster
        membership not re-DERIVED since"; pipelines needing
        observation-based retention should route re-observations
        through a fresh apply_pairs (a first-seen singleton row is a
        patch row). Nodes patched at or above the floor keep their
        current labels (their winning rows live in the retained
        partitions); survivors' label VALUES may still name a retired
        node: labels are values, not references (the purge contract,
        unchanged).

        Contracts, aligned with the fleet:

        - The `_expired.json` ledger lands FIRST; each patch then
          disappears read-atomically (marker removal is one metadata
          op) before its partition deletes — a crash mid-expiry leaves
          fully-served-or-invisible patches only, and every
          maintenance call sweeps the remainder (`_apply_expiry`).
        - `labels(as_of_seq)` below the floor refuses loudly (VACUUM
          idiom); at/above it resolves the RETAINED partitions —
          retention, like tombstones, applies to every read.
        - Redeliveries cannot resurrect: `apply_pairs` always lands
          under a FRESH seq above every reservation ever made
          (`_max_seq` counts intents), so nothing can land below the
          floor by construction — no drop gate needed.
        - `compact()` re-lands the resolved view at the TOP seq, so a
          fold resets every node's retention age to the fold point —
          fold batches you intend to expire separately AFTER expiring,
          or accept the reset (documented, the batch-store inside-fold
          refusal has no analogue here because partitions are whole
          seq units).
        - Expiring everything refuses (keeps at least the newest
          committed patch; `bootstrap()` is the restart path).
        - Snapshots carry the ledger; a clone whose floor is AHEAD of
          the source's refuses to sync (shipped patches below its
          floor would resurrect retired rows).

        Returns {"expired": [[seq, delta_id] dropped now], "before":
        floor}; a lower-or-equal boundary is a no-op reporting the
        standing floor."""
        from .lease import WriterLease

        self._require_bootstrapped()
        before = int(before_seq)
        with WriterLease(self.spark, self.base_path):
            exp = self._read_json(self.expired_ledger_path)
            prior = int(exp["before"]) if exp is not None else None
            if prior is not None and before <= prior:
                return {"expired": [], "before": prior}
            marked = self._marked()
            if not any(s >= before for s in marked):
                raise ValueError(
                    f"expire(before_seq={before}) would empty the "
                    f"store at {self.base_path} — retention keeps at "
                    "least the newest committed patch; bootstrap anew "
                    "to restart the corpus."
                )
            self._write_json(self.expired_ledger_path, {"before": before})
            return {"expired": self._apply_expiry(), "before": before}

    def _apply_expiry(self) -> list:
        """Idempotently finish the expiry the ledger prescribes (also
        the crash-recovery path, run by every maintenance op): unmark
        then delete every committed patch below the floor, then sweep
        unmarked partition dirs below it (a crashed expiry between its
        unmark and delete — or a crashed apply's orphan — must not
        linger as unreadable bytes)."""
        exp = self._read_json(self.expired_ledger_path)
        if exp is None:
            return []
        before = int(exp["before"])
        fs, HPath = self._fs()
        out = []
        for s, did in sorted(self._marked().items()):
            if s < before:
                self._unmark(s, did)
                fs.delete(HPath(f"{self.assign_path}/seq={s:08d}"), True)
                out.append([s, did])
        if fs.exists(HPath(self.assign_path)):
            for st in fs.listStatus(HPath(self.assign_path)):
                name = st.getPath().getName()
                if st.isDirectory() and name.startswith("seq="):
                    try:
                        s = int(name[4:])
                    except ValueError:
                        continue
                    if s < before:
                        fs.delete(st.getPath(), True)
        return out

    def snapshot_to(self, dest_path: str) -> dict:
        """Export a consistent, compliance-clean CLONE of the store to
        a fresh path (the BatchAppendStore.snapshot_to contract on the
        patch layout). What travels: every MARKED patch partition
        verbatim-minus-tombstoned-node-rows (seq partitioning, markers,
        and delta_ids preserved, so `labels(as_of_seq)` and `history()`
        work on the clone) and the schema sidecar. What does not:
        tombstoned nodes' BYTES (the export rewrites through the
        tombstone anti-join — a clone of a store with standing
        takedowns is byte-clean and starts with no tombstones), orphan
        partitions of crashed applies, and stale intents. A forget()
        landing on the source after the snapshot does not propagate:
        clones are forks — list them in `forget_everywhere`.

        Crash story: the schema sidecar is the clone's format marker
        and is written only after markers land and a counted verify
        passes, so a crash mid-export leaves a clone every read refuses
        with 'rebootstrap required'; `_snapshot.json` (the completeness
        attestation `snapshot_manifest()` returns) lands last. Recovery
        is delete-and-retry (the destination must be fresh). Runs under
        the SOURCE WriterLease so the export never captures a
        half-landed apply or mid-compact state."""
        from .lease import WriterLease

        self._require_bootstrapped()
        with WriterLease(self.spark, self.base_path):
            return self._snapshot_locked(dest_path)

    def high_water(self) -> dict:
        """Last committed position (the highest marked patch seq)
        — the fleet-catalog skew mark (round-12 verdict, next #3);
        seq coordinates are store-local."""
        marked = self._marked()
        return {"kind": "seq", "value": (max(marked) if marked else None)}

    def _snapshot_locked(self, dest_path: str) -> dict:
        """snapshot_to's body; the CALLER holds this store's
        WriterLease (snapshot_everywhere's quiesce mode holds the
        fleet's leases and calls this directly)."""
        self._require_bootstrapped()
        dest = dest_path.rstrip("/")
        self._require_fresh_dest(dest)
        clone = ComponentStore(self.spark, dest)
        self._deleted_cache = _UNSET  # re-list under the lease
        self._apply_expiry()  # sweep a crashed expire() first
        marked = self._marked()
        fids = sorted(self._tombstone_fingerprints())
        rows = self._excl_deleted(self._assign_marked())
        expected = rows.count()
        (
            rows.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("seq")
            .parquet(clone.assign_path)
        )
        # a fully-masked export writes no files; the dir must still
        # exist so the clone's schema-pinned reads resolve as empty
        dfs, DP = self._fs_for(clone.assign_path)
        dfs.mkdirs(DP(clone.assign_path))
        got = (
            self.spark.read.schema(self._read_schema())
            .parquet(clone.assign_path)
            .count()
        )
        if got != expected:
            raise IOError(
                f"snapshot row mismatch exporting {self.base_path} "
                f"-> {dest}: expected {expected}, staged {got}; the "
                "destination has no schema sidecar (unreadable) — "
                "delete it and snapshot again"
            )
        for seq, did in sorted(marked.items()):
            clone._mark(seq, did)
        # the retention floor travels: the clone refuses the same
        # as-of points and keeps the same earliest readable seq
        exp = self._read_json(self.expired_ledger_path)
        if exp is not None:
            clone._write_json(clone.expired_ledger_path, exp)
        clone._write_json(
            clone.schema_path, self._read_schema().jsonValue()
        )
        manifest = {
            "source": self.base_path,
            "history": [[s, d] for s, d in sorted(marked.items())],
            "rows": got,
            "tombstones_applied": fids,
            "high_water": self.high_water(),
        }
        clone._write_json(f"{dest}/_snapshot.json", manifest)
        return {**manifest, "dest": dest}

    def sync_to(self, dest_path: str) -> dict:
        """INCREMENTAL backup of the patch store (the
        BatchAppendStore.sync_to contract on this layout): ship only
        the marked patch partitions the clone lacks (masked through
        the CURRENT tombstones — no forgotten bytes travel), mark them
        on the clone after the write commits (a crashed sync leaves
        them invisible; the re-run replaces them via dynamic
        overwrite), mirror the standing tombstones per forget_id, and
        rewrite the attestation manifest LAST. Rows forgotten after
        the original snapshot already sit in the clone's older patches
        as bytes: the mirrored tombstones mask them immediately;
        `compact(purge_forgotten=True)` on the clone erases them.

        Refuses a destination that is not a clone of this store: no
        snapshot attestation, or marked (seq, delta_id) entries the
        source does not hold — which is also what a source-side
        compact() since the snapshot looks like (the fold retired
        those seqs): history was collapsed, take a fresh snapshot."""
        from .lease import WriterLease

        self._require_bootstrapped()
        with WriterLease(self.spark, self.base_path):
            return self._sync_locked(dest_path)

    def _sync_locked(self, dest_path: str) -> dict:
        """sync_to's body; the CALLER holds this store's
        WriterLease (sync_everywhere's quiesce mode holds the
        fleet's leases and calls this directly)."""
        self._require_bootstrapped()
        dest = dest_path.rstrip("/")
        clone = ComponentStore(self.spark, dest)
        if clone.snapshot_manifest() is None:
            raise RuntimeError(
                f"sync_to(): {dest} has no snapshot attestation — sync "
                "only updates a completed snapshot_to() clone; take a "
                "full snapshot first"
            )
        self._deleted_cache = _UNSET
        # identity gate: the manifest records which store the clone
        # was exported from — (seq, delta_id) overlap alone is not
        # an identity (round-12 ADVICE, medium, on the batch
        # stores; same discipline here)
        recorded = clone.snapshot_manifest().get("source")
        if recorded != self.base_path:
            raise RuntimeError(
                f"sync_to(): the clone at {dest} was exported from "
                f"{recorded!r}, not from {self.base_path} — syncing "
                "into another store's clone would merge unrelated "
                "corpora. Snapshot THIS store to a fresh path."
            )
        self._apply_expiry()  # sweep a crashed expire() first
        # retention-floor gate (the batch-store discipline): a clone
        # whose floor is ahead would have patches below it re-shipped
        # and re-served — resurrecting retired rows on the replica
        src_exp = self._read_json(self.expired_ledger_path)
        clone_exp = clone._read_json(clone.expired_ledger_path)
        src_floor = int(src_exp["before"]) if src_exp is not None else None
        clone_floor = (
            int(clone_exp["before"]) if clone_exp is not None else None
        )
        if clone_floor is not None and (
            src_floor is None or clone_floor > src_floor
        ):
            raise RuntimeError(
                f"sync_to(): the clone at {dest} has a retention floor "
                f"({clone_floor}) ahead of the source's ({src_floor}) "
                "— patches the source still holds would resurrect on "
                "the replica. Expire the source to the clone's "
                "boundary first, or take a fresh snapshot."
            )
        marked = self._marked()
        have = clone._marked()
        foreign = sorted(
            (s, d) for s, d in have.items() if marked.get(s) != d
        )
        if foreign:
            raise RuntimeError(
                f"sync_to(): {dest} holds marked patches {foreign} "
                f"the source {self.base_path} does not — the clone "
                "diverged, a source compact() folded that history "
                "(fresh snapshot), or a source expire() retired it "
                "(expire the clone to the source's floor, then "
                "retry)."
            )
        missing = sorted(set(marked) - set(have))
        if missing:
            rows = self._excl_deleted(
                self._assign_marked().filter(
                    F.col("seq").isin([f"{s:08d}" for s in missing])
                )
            )
            (
                rows.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("seq")
                .parquet(clone.assign_path)
            )
            for s in missing:
                clone._mark(s, marked[s])
        # the retention floor travels (the foreign gate above already
        # proved the clone holds nothing below it)
        if src_exp is not None:
            clone._write_json(clone.expired_ledger_path, src_exp)
        fids = self._tombstone_fingerprints()
        for fid in sorted(fids):
            ids = self.spark.read.parquet(
                f"{self.deleted_path}/forget_id={fid}"
            ).select(self.TOMBSTONE_KEY)
            clone.forget(ids, fid)
        manifest = {
            "source": self.base_path,
            "history": [[s, d] for s, d in sorted(marked.items())],
            # same meaning as snapshot_to's "rows": raw staged
            # marked-patch rows on the clone — NOT the resolved
            # per-node serving view, which would give the one
            # attestation field two meanings depending on which
            # writer last touched it (round-12 ADVICE, low)
            "rows": clone._assign_marked().count(),
            "tombstones_applied": [],
            "tombstones_mirrored": sorted(fids),
            "high_water": self.high_water(),
        }
        clone._write_json(f"{dest}/_snapshot.json", manifest)
        return {
            **manifest,
            "dest": dest,
            "patches_shipped": [[s, marked[s]] for s in missing],
        }

    def compact(self, purge_forgotten: bool = False) -> dict:
        """Fold base + patches into ONE partition holding the resolved
        view, then delete the folded sources. No two-phase manifest:
        the gen partition lands under the highest seq with its marker
        written after the write, so last-writer-wins resolves
        identically whether a crash strikes before the gen marker (gen
        invisible, sources serve), between marker and source deletion
        (gen supersedes every duplicated row), or mid-deletion — retry
        compact() to finish.

        `purge_forgotten=True` additionally byte-erases tombstoned
        nodes (the resolved view already excludes them, so the gen
        write IS the erasure of every FOLDED partition) and clears the
        tombstone partitions that existed at plan time — guarded the
        same two ways as the MinHash index purge: a tombstone re-landed
        mid-compact keeps its (fingerprint-changed) partition, and if
        any UNMARKED partition exists (a crashed apply not yet
        retried), tombstones are retained entirely — those orphan bytes
        were not rewritten, so clearing would be a false erasure claim;
        the receipt surfaces the deferral."""
        from .lease import WriterLease

        self._require_bootstrapped()
        fs, HPath = self._fs()
        with WriterLease(self.spark, self.base_path):
            # re-list tombstones UNDER the lease (round-11 ADVICE,
            # high): labels() below must resolve through the CURRENT
            # tombstone set, not one this instance cached before a
            # cross-process forget() landed — the purge fingerprints
            # are taken from a fresh listing, so a stale cache would
            # write the forgotten rows into the gen partition and then
            # clear their tombstones: a false erasure.
            self._deleted_cache = _UNSET
            self._apply_expiry()  # sweep a crashed expire() first
            # recover a compact() that crashed between its gen write and
            # its gen marker: the orphan is invisible to reads but would
            # defer purges forever. Only gen-* intents are wiped here —
            # a crashed apply()'s intent belongs to ITS retry — and the
            # lease guarantees no live compactor owns these. A gen that
            # crashed AFTER its marker needs no recovery: it is simply
            # one more marked partition this fold consumes.
            if fs.exists(HPath(self.intent_path)):
                for st in fs.listStatus(HPath(self.intent_path)):
                    did = st.getPath().getName()
                    if did.startswith("gen-"):
                        obj = self._read_json(st.getPath().toString())
                        if isinstance(obj, dict) and "seq" in obj:
                            fs.delete(
                                HPath(
                                    f"{self.assign_path}/seq={int(obj['seq']):08d}"
                                ),
                                True,
                            )
                        fs.delete(st.getPath(), False)
            marked = self._marked()
            receipt: dict = {
                "folded": sorted(f"{s:08d}.{d}" for s, d in marked.items())
            }
            purge_clear: dict = {}
            if purge_forgotten:
                on_disk = set()
                if fs.exists(HPath(self.assign_path)):
                    for st in fs.listStatus(HPath(self.assign_path)):
                        name = st.getPath().getName()
                        if st.isDirectory() and name.startswith("seq="):
                            on_disk.add(name[len("seq="):])
                unmarked = on_disk - {f"{s:08d}" for s in marked}
                receipt["purge_deferred"] = sorted(unmarked)
                if not unmarked:
                    purge_clear = self._tombstone_fingerprints()
            if len(marked) >= (1 if purge_forgotten else 2):
                resolved = self.labels()
                gen = self._land_patch(resolved, f"gen-{uuid.uuid4().hex[:8]}")
                for s, d in marked.items():
                    fs.delete(HPath(f"{self.assign_path}/seq={s:08d}"), True)
                    self._unmark(s, d)
                receipt["generation"] = gen
            self._clear_tombstones_guarded(purge_clear)
        return receipt
