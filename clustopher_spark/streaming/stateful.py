"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the Spark-native replacement for hand-rolled stateful stream processors
(the reference's closest analog is its LRU/TTL bookkeeping,
runner/runner.go:113-140, which is serving-side, not data-plane).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user (count, sum) across micro-batches."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame -> per-user cumulative totals, updated each
    micro-batch. State is one (long, double) pair per user — O(users)
    state regardless of event volume."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 typed-state API) -------------------
# The successor to applyInPandasWithState: named, typed state variables
# (Value/List/Map) with per-state TTL and timers, backed by the RocksDB
# state store. running_user_totals above keeps the older API exercised;
# this operator is the same data-plane pattern on the new one.

TOPK_OUTPUT_SCHEMA = "user_id long, rank int, value double"


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class TopKValuesProcessor(StatefulProcessor):
    """Per-user running top-k event values across micro-batches.

    State is one ListState of at most k doubles per user — O(users * k)
    regardless of event volume, the bound that matters when the stream is
    the 100 TB ingest feed. Runtime requirements (environment-gated, not
    import-gated): the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — transformWithState does not
    run on the default HDFS-backed store — and the ``protobuf`` package
    (the state-server wire protocol; absent in this test container, so the
    parity test self-skips there and the older applyInPandasWithState
    operator above remains the exercised path)."""

    def __init__(self, k: int = 3):
        self._k = k

    def init(self, handle) -> None:
        self._topk = handle.getListState("topk", "value double")

    def handleInputRows(self, key, rows, timer_values):
        (user_id,) = key
        vals = [v for (v,) in self._topk.get()] if self._topk.exists() else []
        for pdf in rows:
            vals.extend(float(x) for x in pdf["value"])
        vals = sorted(vals, reverse=True)[: self._k]
        self._topk.put([(v,) for v in vals])
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(vals),
                "rank": list(range(1, len(vals) + 1)),
                "value": [round(v, 2) for v in vals],
            }
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def close(self) -> None:
        pass


def streaming_topk_values(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming per-user top-k values via ``transformWithStateInPandas``.

    Emits each user's current top-k (rank-ordered) every micro-batch the
    user appears in; with an availableNow drain of one file the final
    table equals the batch ``row_number() <= k`` answer (pinned by test)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        TopKValuesProcessor(k),
        outputStructType=TOPK_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
