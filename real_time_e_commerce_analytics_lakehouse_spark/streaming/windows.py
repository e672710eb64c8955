"""Event-time windowed aggregations with watermarks (streaming twins of
plans/events.py batch declarations).

The reference's "real-time" is incremental micro-batch with NO event-time
semantics (SURVEY §2.8: no watermarks, no windows). These operators add
the real streaming capability:

- tumbling/sliding window aggregation with a watermark bounding state
  (late rows beyond the watermark are DROPPED — documented policy;
  SURVEY §7 risk 5);
- session windows via the built-in session_window (gap-merged state);
- checkpointed availableNow execution so the same query runs as an
  incremental batch job (the reference's operating mode).

State-scale note: watermark delay bounds the state store size —
state ~ O(active windows x keys), independent of total stream length;
with RocksDB state store on a real cluster this holds at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Watermarked tumbling-window count (+ sum of `value_col` when the
    frame has one — pass None for count-only over schemas without a
    value column; the previous hardcoded sum("value") crashed any
    reuse beyond the events schema, r5 review). Works on both batch and
    streaming DataFrames (same logical plan; streaming adds state)."""
    aggs = [F.count("*").alias("n_events")]
    extra = []
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
        extra = [f"sum_{value_col}"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            *extra,
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Sliding windows: each event lands in window/slide overlapping
    windows; watermark still bounds state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Session windows (gap-based) — the streaming twin of the batch
    sessionize_events query (lag+cumsum formulation). session_window
    merges windows whose events are within `gap`; a session closes when
    the watermark passes its end. `value_col=None` for frames without a
    summable column (same contract as tumbling_counts)."""
    aggs = [F.count("*").alias("n_events")]
    extra = []
    if value_col is not None:
        aggs.append(F.sum(value_col).alias(f"sum_{value_col}"))
        extra = [f"sum_{value_col}"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *extra,
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming deduplication with BOUNDED state
    (dropDuplicatesWithinWatermark): the first row per key is emitted,
    later duplicates arriving within the watermark delay are dropped,
    and each key's state is evicted once the watermark passes its
    event time — so state is O(keys seen per watermark window), not
    O(keys ever seen), which is what makes at-least-once ingest dedup
    viable on an unbounded 100 TB/day stream. The trade-off is honest:
    a duplicate arriving LATER than the watermark delay is re-emitted
    (its state is gone) — downstream idempotent merge_insert_only
    (tables.py) turns that back into exactly-once, the same two-layer
    pattern the reference relies on (01_bronze_csv_to_delta.py:58-68).
    Plain dropDuplicates on a stream would keep state forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
