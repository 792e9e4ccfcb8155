"""transformWithStateInPandas (Spark 4's stateful processing API).

The successor to applyInPandasWithState (streaming/stateful.py keeps the
classic form): explicit named state variables managed through a
StatefulProcessorHandle, per-key Arrow-batched processing, timers for
timeout logic. This module maintains per-user running (count, cents)
totals in a ValueState — the same semantics as
stateful.running_user_totals, so the two APIs are directly comparable,
and a test pins that the final state equals a batch aggregation.

Scale: state lives in the state store keyed by user (RocksDB-backed on a
cluster), one shuffle on the grouping key per micro-batch; integer cents
keep the totals exact across any batch chopping (the rollup.py
argument). Value state is O(1) per key — the store's working set is the
live-key count, not the event volume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_cents", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running event count and exact cents total."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, cents = 0, 0
        if self._state.exists():
            n, cents = self._state.get()
        for pdf in rows:
            n += len(pdf)
            # floor(value*100) matches the engine-portable quantization
            # used across the repo (ts03): exact int math thereafter.
            cents += int(pdf["value"].mul(100).pipe(lambda s: s.apply(int)).sum())
        self._state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    def close(self) -> None:
        pass


def running_totals_tws(events_stream):
    """Wire the processor onto a streaming DataFrame with user_id/value.

    Requires the RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass` =
    `...state.RocksDBStateStoreProvider`) and the `protobuf` Python
    package (the TWS runtime's JVM↔Python state protocol) — the test
    importorskips on the latter; environments without it keep the classic
    applyInPandasWithState path (streaming/stateful.py)."""
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
