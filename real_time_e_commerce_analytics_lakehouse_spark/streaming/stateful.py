"""Custom stateful streaming operator via applyInPandasWithState.

The engine's example of arbitrary keyed state that the built-in windowed
aggregations cannot express: a per-user running profile (event count,
value sum, last-seen timestamp) maintained across micro-batches and
emitted incrementally. This is the Structured Streaming shape for custom
state machines (fraud scoring, session enrichment, rate limiting) —
Arrow-batched per group, state bounded by a processing-time timeout.

Scale notes: state lives in the executor state store keyed by user_id
(hash-partitioned shuffle); with the RocksDB state store provider this
holds billions of keys. The timeout (`GroupStateTimeout`) is what keeps
abandoned keys from accumulating forever.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double"


def _update_profile(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    last_ts = None
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        m = pdf["ts"].max()
        last_ts = m if last_ts is None else max(last_ts, m)
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [round(total, 2)],
            "last_ts": [last_ts],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Incrementally-maintained per-user profile over a stream of
    (user_id, ts, value) events. Each micro-batch emits the UPDATED
    profiles of users present in the batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
