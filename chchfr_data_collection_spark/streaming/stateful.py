"""Custom stateful streaming operators via applyInPandasWithState.

Where the built-in windowed aggregations (streaming/events.py) cover the
declarative surface, this is the escape hatch for operators Spark lacks:
arbitrary per-key state updated with Arrow-batched pandas, the
distributed shape for streaming featurization / per-entity accumulators
at scale. State lives in the state store (checkpointed, partitioned by
key); each micro-batch touches only the keys present in the batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = "user_id bigint, n_events bigint, sum_value double, n_errors bigint"
USER_STATS_STATE = "n bigint, total_cents bigint, errs bigint"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime accumulator: event count, value sum, error count.

    Each micro-batch folds its rows into the user's state and emits the
    updated totals (output mode `update`). The same shape serves online
    feature aggregation: swap the accumulator for decayed counters or
    sketches.

    The value accumulator is INTEGER CENTS (values are 2-dp): integer
    addition is exact and associative, so the emitted sum is identical
    regardless of how rows split across micro-batches / partitions —
    a float accumulator would make the state order-dependent.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, cents, errs = state.get
        else:
            n, cents, errs = 0, 0, 0
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].dropna()
            cents += int((v * 100).round().astype("int64").sum())
            errs += int((pdf["event_type"] == "error").sum())
        state.update((n, cents, errs))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [cents / 100.0],
                "n_errors": [errs],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 state API v2). The runtime protocol needs
# `google.protobuf`, which this container lacks (and installs are not
# allowed), so execution is gated — plan construction and the processor
# itself are fully implemented and the operator runs unmodified wherever
# protobuf is present.
# ---------------------------------------------------------------------------

EXTREMES_OUTPUT = "user_id bigint, min_value double, max_value double, n_events bigint"


def transform_with_state_available() -> bool:
    """True when the transformWithState runtime protocol can run here
    (it speaks protobuf between the JVM and the Python state server)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_extremes_processor():
    """Build the StatefulProcessor class lazily (the import exists in
    pyspark regardless of protobuf; only query START needs protobuf)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserExtremesProcessor(StatefulProcessor):
        """Per-user running min/max/count in a ValueState.

        Same integer-cents exactness contract as `running_user_stats`:
        min/max over exact cents are order- and batch-split-independent,
        so the emitted extremes are identical for any replay chunking.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "extremes", "lo_cents bigint, hi_cents bigint, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                lo, hi, n = self._st.get()
            else:
                lo, hi, n = None, None, 0
            for pdf in rows:
                v = pdf["value"].dropna()
                if len(v):
                    cents = (v * 100).round().astype("int64")
                    clo, chi = int(cents.min()), int(cents.max())
                    lo = clo if lo is None else min(lo, clo)
                    hi = chi if hi is None else max(hi, chi)
                n += len(pdf)
            self._st.update((lo, hi, n))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "min_value": [None if lo is None else lo / 100.0],
                    "max_value": [None if hi is None else hi / 100.0],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return UserExtremesProcessor()


def running_user_extremes_tws(events: DataFrame) -> DataFrame:
    """Per-user running value extremes via `transformWithStateInPandas` —
    the Spark 4 state API v2 twin of `running_user_stats` (API v1).

    v2 buys: named state variables (value/list/map) instead of one state
    tuple, timers, TTL, and initial-state bootstrap — the shape for
    multi-variable per-entity state at scale. Requires the
    RocksDB state store provider and a protobuf-capable Python runtime
    (see `transform_with_state_available`).
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        _make_extremes_processor(),
        outputStructType=EXTREMES_OUTPUT,
        outputMode="update",
        timeMode="none",
    )


TRANSITIONS_OUTPUT = "prev_type string, next_type string"
TRANSITIONS_STATE = "last_ts bigint, last_eid bigint, last_type string"


def user_transition_pairs(events: DataFrame) -> DataFrame:
    """Streaming per-user event-type TRANSITION PAIR emission — the
    stateful continuation of the batch Markov matrix
    (queries/events_q.events_markov_transitions).

    Why this needs CUSTOM state: per-batch lag() would silently DROP
    every transition that straddles a micro-batch boundary (the first
    event of a batch has no within-batch predecessor), so transition
    counts are NOT mergeable partials. The state store carries each
    user's last event (ts, event_id, type); each batch MERGES the
    carried event into its (ts, event_id) sort (not a blind prepend),
    emits the pair rows (append mode), and stores the max-(ts,
    event_id) row as the new tail.

    Exactness contract: the emitted pair multiset equals the batch
    computation's for any TIME-ORDERED chunking of the feed (each
    batch's rows ≥ the carried tail — what an availableNow file replay
    or a watermarked, ordered source delivers). A row arriving LATE
    across a batch boundary cannot be exact in append mode without
    retraction (its global predecessor pair was already emitted);
    merging it into the sort at least handles it deterministically:
    it pairs within the batch by true time order and the stored tail
    stays the true maximum, so state never moves backwards."""

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = pd.DataFrame(
            {
                "tsu": [
                    int(pd.Timestamp(t).value // 1000) for t in rows["ts"]
                ],
                "event_id": rows["event_id"].astype("int64"),
                "event_type": rows["event_type"].astype("object"),
            }
        )
        if state.exists:
            carried = pd.DataFrame(
                {
                    "tsu": [int(state.get[0])],
                    "event_id": [int(state.get[1])],
                    "event_type": [str(state.get[2])],
                }
            )
            rows = pd.concat([carried, rows], ignore_index=True)
        rows = rows.sort_values(["tsu", "event_id"], kind="mergesort")
        types = rows["event_type"].tolist()
        last = rows.iloc[-1]
        state.update(
            (int(last["tsu"]), int(last["event_id"]), str(last["event_type"]))
        )
        yield pd.DataFrame(
            {"prev_type": types[:-1], "next_type": types[1:]},
            dtype="object",
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=TRANSITIONS_OUTPUT,
        stateStructType=TRANSITIONS_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
