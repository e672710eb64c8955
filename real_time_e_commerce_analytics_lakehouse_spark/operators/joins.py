"""Join operators beyond plain equi-joins.

Spark has no native as-of or interval/range join (as of Spark 4.x); these
are the standard scalable formulations:

- ``asof_join``: union-the-sides + running last_value window. ONE shuffle
  on the key, linear work — survives 100 TB where a correlated subquery /
  nested-loop join (the naive spelling) is quadratic.
- ``range_join``: bucketize the range dimension so the join becomes an
  equi-join on (bucket) [+ optional keys], then re-filter exactly. Avoids
  the BroadcastNestedLoopJoin Spark would otherwise pick for a pure
  inequality condition.
- ``preagg_join``: aggregate-then-join (reference
  db_notebooks/04_gold_fact_orders.py:42-59, 05_gold_fact_payments.py:31-46).
  Spark does NOT push aggregations through joins, so pre-aggregating the
  fact side before a join is a semantic pattern the engine preserves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    alias: str = "asof_value",
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_col`` from the nearest right row
    at-or-before (``direction='backward'``, default: ``right_ts <=
    left_ts``) or at-or-after (``direction='forward'``: ``right_ts >=
    left_ts``) the left timestamp, same key. Left rows with no such right
    row get NULL (left-join semantics).

    Implementation: tag both sides, union on a common shape, and take a
    running ``last(value, ignorenulls=True)`` over (key, ts, side) —
    scanning ascending for backward, descending for forward. At equal
    timestamps the right row sorts first, so it is visible to the left
    row (``<=`` / ``>=``); pass ``strict=True`` for ``<`` / ``>``. Value
    ties at identical timestamps resolve deterministically (max value
    for backward, min for forward).

    Scale: a single hash-partition on the key; no quadratic pair-up, no
    range explosion. Skewed keys are handled by AQE skew-join because this
    is a plain window over a shuffle.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _as_list(on)
    left_cols = left.columns
    # NULL timestamps have no position on the as-of axis: a NULL right
    # ts can never satisfy <=/>= (SQL three-valued logic) yet would
    # sort nulls-first in the ascending scan and leak its value into
    # every following left row (r4 review) — drop such right rows, and
    # null the result for NULL-ts left rows below.
    right = right.filter(F.col(right_ts).isNotNull())
    # SQL equality-join semantics: NULL keys never match — a NULL-key
    # right row must not donate its value to NULL-key left rows (the
    # window partition would group them together; r5 review). NULL-key
    # left rows stay and get NULL, like any unmatched left row.
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    # right side collapsed to: keys + ts + value. The value rides in a
    # STRUCT: last(..., ignorenulls) must distinguish "left placeholder"
    # (null struct) from "right row whose VALUE is null" (non-null
    # struct, null field) — carrying the bare value substituted an
    # OLDER right row's value whenever the nearest one was NULL (r5
    # review). The box is ALSO the window tie-breaker (ordering on the
    # struct field) — carrying a second bare copy of the value through
    # the union shuffle doubled the shuffled value width for nothing
    # (r5 verdict).
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.struct(F.col(value_col).alias("v")).alias("__rbox"),
        F.lit(0 if not strict else 1).alias("__side"),
    )
    # left side keeps payload; __rbox empty
    l = left.select(  # noqa: E741
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__rbox"].dataType).alias("__rbox"),
        F.lit(1 if not strict else 0).alias("__side"),
    )
    for c in left_cols:
        if c not in keys:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))
    # Tie-break on the boxed value field: at identical (ts, side) the
    # running last() must pick a deterministic right row — max value for
    # backward (ascending, last wins), min for forward (descending).
    # NULL-valued right rows sort first so a non-null peer at the same
    # instant wins; if ALL peers are null-valued, the box itself is
    # non-null, so the left row still correctly resolves to NULL value
    # rather than falling back past the tie group.
    if direction == "backward":
        order = [
            F.col("__ts").asc(),
            F.col("__side").asc(),
            F.col("__rbox.v").asc_nulls_first(),
        ]
    else:  # forward: scan from the future toward each left row
        order = [
            F.col("__ts").desc(),
            F.col("__side").asc(),
            F.col("__rbox.v").desc_nulls_first(),
        ]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    is_left = F.col("__side") == (1 if not strict else 0)
    out = (
        unioned.withColumn("__asof", F.last("__rbox", ignorenulls=True).over(w))
        .filter(is_left)
        .select(
            *left_cols,
            F.when(F.col("__ts").isNotNull(), F.col("__asof.v")).alias(alias),
        )
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int | float,
    on: str | Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where ``start <= point < end``.

    The range dimension must be numeric (cast timestamps with
    ``F.unix_micros`` first). Each interval is exploded to the buckets it
    overlaps; points join on their single bucket — an equi-join Catalyst
    can hash-partition — then the exact predicate re-filters.

    Pick ``bucket_width`` ~ the typical interval length: wider buckets mean
    fewer replicated interval rows, narrower buckets mean less post-filter
    waste.

    ``how``: 'inner' or 'left' (points side preserved — a point matching
    no interval keeps one NULL-extended row, because the exact range
    predicate lives IN the join condition, not a post-filter that would
    discard NULL-extended rows; ADVICE r1 #5). Right/full outer cannot be
    offered: the interval side is replicated per overlapped bucket, so
    its unmatched rows would surface once per bucket.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports how='inner'|'left', got {how!r}")
    keys = _as_list(on) if on else []
    bw = F.lit(bucket_width)
    start_b = F.floor(F.col(start_col) / bw).cast("long")
    # end is EXCLUSIVE, but subtracting an epsilon to express that is
    # wrong twice over: it DROPS the final bucket when end lies within
    # epsilon above a boundary (losing in-range points), and at large
    # magnitudes (unix micros ~1e15) the epsilon vanishes in double
    # rounding anyway (r4 review). Using floor(end/bw) instead costs at
    # most one empty extra bucket when end is exactly aligned — the
    # exact predicate discards it. greatest() clamps inverted intervals
    # (end < start, e.g. corrupt rows) to ONE bucket instead of letting
    # F.sequence generate a huge descending explosion.
    end_b = F.greatest(F.floor(F.col(end_col) / bw).cast("long"), start_b)
    i = intervals.withColumn("__bucket", F.explode(F.sequence(start_b, end_b)))
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / bw).cast("long"))
    cond = [p["__bucket"] == i["__bucket"]] + [p[k] == i[k] for k in keys]
    exact = (p[point_col] >= i[start_col]) & (p[point_col] < i[end_col])
    joined = p.join(i, cond + [exact], how)
    drop = ["__bucket"] + [i[k] for k in keys]
    out = joined.drop(p["__bucket"]).drop(*drop) if keys else joined.drop("__bucket")
    return out


def preagg_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str | Sequence[str],
    dim_key: str | Sequence[str],
    aggs: list[Column],
    how: str = "left",
) -> DataFrame:
    """Aggregate ``fact`` per key, then join to ``dim`` (dim-driven, so
    key-less dim rows survive a left join). Reference pattern A10
    (04_gold_fact_orders.py:42-59): shrink the fact side BEFORE the join —
    Catalyst will not push an aggregation through a join on its own."""
    fkeys, dkeys = _as_list(fact_key), _as_list(dim_key)
    if len(fkeys) != len(dkeys):
        # zip would silently truncate to the shorter list and run a
        # broader join (aggregates fanned out across dim rows, r5
        # review) — fail fast instead
        raise ValueError(
            f"fact_key {fkeys} and dim_key {dkeys} differ in length"
        )
    agged = fact.groupBy(*fkeys).agg(*aggs)
    cond = None
    for fk, dk in zip(fkeys, dkeys):
        c = dim[dk] == agged[fk]
        cond = c if cond is None else (cond & c)
    return dim.join(agged, cond, how).drop(*[agged[fk] for fk in fkeys])
