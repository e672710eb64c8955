"""Streaming joins (beyond the reference — its streams never join
before foreachBatch; SURVEY §2.8 extension).

Two shapes Structured Streaming supports natively, packaged with the
state-bounding discipline that makes them survivable at 100 TB/day:

- stream-STATIC enrich: dimension lookup against a batch frame. The
  static side is broadcast per micro-batch; no streaming state at all.
- stream-STREAM interval join: both sides watermarked, and the join
  condition carries an explicit event-time interval — the watermark +
  interval bound tells Spark exactly when buffered rows can be evicted,
  so state stays proportional to (rate x interval), not to history.
  Without the time bound Spark must keep ALL past rows of both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_disjoint(left: DataFrame, right: DataFrame, key: str) -> None:
    """The interval joins emit left columns + right non-key columns
    verbatim; a shared non-key name would produce duplicate output
    columns (AMBIGUOUS_REFERENCE downstream) — refuse up front."""
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"column names {sorted(overlap)} exist on both streams; "
            "rename one side before the interval join (output keeps "
            "both sides' columns verbatim)"
        )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension (per-micro-batch
    broadcast hash join; stateless)."""
    return stream.join(F.broadcast(dim), on, how)


def _interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str,
    watermark: str,
    how: str,
) -> DataFrame:
    """Shared body of the interval joins (one copy, r5 review: the
    inner/outer variants had drifted-prone duplicate bodies)."""
    _check_disjoint(left, right, key)
    l = left.withWatermark(left_ts, watermark).alias("l")  # noqa: E741
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND "
        f"r.{right_ts} BETWEEN l.{left_ts} - INTERVAL {lookback} AND l.{left_ts}"
    )
    joined = l.join(r, cond, how)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}") for c in right.columns if c != key
    ]
    return joined.select(*keep)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on `key` where the right event happened in
    [left_ts - lookback, left_ts]. Both sides watermarked; the interval
    predicate bounds the buffered state on each side.

    Column contract: `left_ts` and `right_ts` must be distinct names,
    `key` the shared join column, and the two sides' OTHER column names
    disjoint (the output carries left columns + the right side's
    non-key columns verbatim; a shared non-key name would emit two
    identically-named columns and break every downstream reference, so
    it is refused here instead)."""
    return _interval_join(
        left, right, key, left_ts, right_ts, lookback, watermark, "inner"
    )


def stream_stream_interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER flavor of the interval join: every left event is
    emitted; those with no right match within the interval carry NULLs
    on the right side. Streaming semantics differ from batch in WHEN
    the NULL-extended row appears: the engine can only declare "no
    match will ever come" once the watermark passes the end of the
    match interval, so unmatched rows are emitted with that delay —
    which is exactly why both the watermark AND the interval condition
    are mandatory for outer stream-stream joins (without them Spark
    rejects the query: state could never be evicted and no row could
    ever be finalized). Same disjoint-column contract as the inner
    variant."""
    return _interval_join(
        left, right, key, left_ts, right_ts, lookback, watermark,
        "left_outer",
    )
