"""Custom stateful streaming via transformWithStateInPandas (Spark 4).

The successor API to applyInPandasWithState (streaming/stateful.py keeps
the classic variant): instead of one opaque state tuple per key, the
processor declares MULTIPLE TYPED state variables (ValueState /
ListState / MapState), each independently updatable and TTL-able, plus
timers. This module's example maintains, per user:

- a ValueState (event count, value sum) — the running aggregate
- a bounded ListState of the most recent values — the kind of
  "last-N observations" feature window a fraud/anomaly scorer reads,
  awkward to express in the single-tuple API

Scale notes: state is keyed by user_id in the executor state store
(hash-partitioned shuffle; transformWithState REQUIRES the RocksDB
provider — set spark.sql.streaming.stateStore.providerClass to
...state.RocksDBStateStoreProvider); ListState is trimmed to RECENT_N
inside the processor so per-key state is O(1). Output mode Update emits
only keys touched by the batch.

Runtime requirement: the transformWithState Python worker speaks a
protobuf protocol to the JVM state server, so the `protobuf` package
must be importable on executors. This container ships pyspark without
protobuf (and installs are disallowed), so the end-to-end test is
skipped here — the applyInPandasWithState twin (streaming/stateful.py)
is the environment-covered stateful path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, recent array<double>"
)
RECENT_N = 3  # bounded feature window per key


class ProfileProcessor(StatefulProcessor):
    """Per-user running profile + last-N value window."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", "n long, total double")
        # (ts, value) PAIRS, not bare values (r5 review): the recent
        # window is event-time ordered, and with only values in state a
        # late event arriving in a LATER micro-batch appended after
        # newer observations — the window's contents depended on batch
        # boundaries. Keeping each value's ts makes the cross-batch
        # merge-sort exact.
        self._recent = handle.getListState("recent", "ts timestamp, v double")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = self._agg.get() if self._agg.exists() else (0, 0.0)
        # collect the WHOLE batch before ordering: a key's rows can span
        # several Arrow chunks, and sorting each chunk independently
        # would let a late row in a later chunk masquerade as the newest
        # observation in the recent-values window (r4 review)
        pairs: list[tuple] = []
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            pairs.extend(zip(pdf["ts"], (float(v) for v in pdf["value"])))
        old = (
            [(r[0], r[1]) for r in self._recent.get()]
            if self._recent.exists()
            else []
        )
        # merge old state with the batch IN EVENT-TIME ORDER (stable
        # sort: within equal ts, stored-then-batch order is preserved)
        merged = sorted(old + pairs, key=lambda pr: pr[0])[-RECENT_N:]
        recent = [v for _ts, v in merged]
        # put() replaces the list — the trim keeps per-key state O(1)
        self._recent.put(merged)
        self._agg.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [round(total, 2)],
                "recent": [recent],
            }
        )

    def close(self) -> None:
        pass


def user_profiles_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of stateful.user_profiles: same
    running aggregate, plus the bounded recent-values window that needs
    a second (list-typed) state variable. Each micro-batch emits the
    updated profile of every user present in the batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
