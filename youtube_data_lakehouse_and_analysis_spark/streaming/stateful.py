"""Custom stateful streaming operator via applyInPandasWithState: per-user
running totals that survive across micro-batches — the pattern for any
bespoke state machine Structured Streaming's built-ins can't express
(sessionization variants, CDC reconciliation, per-key model state).

Scale: state lives in the state store keyed by user_id (RocksDB-backed on
a real cluster); each micro-batch touches only the keys present in it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events_total long, value_total double"
STATE_SCHEMA = "n long, v double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, v))
    yield pd.DataFrame({"user_id": [key[0]], "n_events_total": [n], "value_total": [v]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Emit the cumulative (count, value-sum) per user after every
    micro-batch. Batch-mode equivalent: groupBy(user_id).agg(count, sum)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
