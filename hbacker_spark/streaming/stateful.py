"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running spend tracker: for each user, maintain (n_events,
total_value) across micro-batches and emit an updated row whenever the
user's state changes; idle users time out and emit a final "closed"
row. This is the arbitrary-state class that window()/session_window()
can't express (cross-window running totals with timeout finalization).

State is keyed by user_id → bounded by active-user cardinality; the
timeout bound releases idle state, which is what keeps it viable on an
unbounded 100 TB stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("status", StringType()),  # active | closed
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_tracker(idle_timeout_ms: int | None):
    def track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total, "status": "closed"}]
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": round(total, 2), "status": "active"}]
        )

    return track


def running_spend(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """Apply the stateful tracker; works on a streaming DataFrame.

    ``idle_timeout_ms`` enables processing-time state expiry ("closed"
    rows) for long-running deployments. Leave None for bounded
    availableNow runs — a pending processing-time timer keeps the query
    alive past its data, so finite drains would hang waiting for it.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if idle_timeout_ms is not None else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_tracker(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
