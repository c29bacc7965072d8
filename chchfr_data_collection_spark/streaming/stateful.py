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
