"""operators/bounded_frames: carry-replicated partitioned frames must be
value-identical to the global single-reducer windows they replace
(VERDICT r4 wrong #3). Each helper is checked against the plain
`Window.orderBy(...)` spelling over sparse synthetic series chosen to
exercise the hard cases: bucket boundaries, gaps wider than the frame,
empty buckets (for the prefix/gap-fill paths), and negative day numbers
(dates before the epoch literal)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.bounded_frames import (
    BUCKET,
    CARRIED,
    bucketed_gap_fill,
    bucketed_prefix_cumsum,
    carried_range_buckets,
    carried_rows_buckets,
)

# sparse days straddling several 10-day buckets, incl. negatives and a
# gap (31..58) wider than any frame used below
DAYS = [-7, -3, -1, 0, 1, 5, 9, 10, 11, 19, 20, 22, 30, 59, 60, 61, 75]
B = 10  # tiny bucket width so every edge case appears at n=17


def _series(spark):
    return spark.createDataFrame(
        [(d, Decimal(d * d % 97)) for d in DAYS], "day int, v decimal(18,2)"
    )


def test_carried_range_equals_global_range(spark):
    df = _series(spark)
    lookback = 6
    aug = carried_range_buckets(df, "day", lookback, bucket_days=B)
    wp = W.partitionBy(BUCKET).orderBy("day").rangeBetween(-lookback, 0)
    got = (
        aug.withColumn("s", F.sum("v").over(wp))
        .where(~F.col(CARRIED))
        .select("day", "s")
    )
    wg = W.orderBy("day").rangeBetween(-lookback, 0)
    want = df.select("day", F.sum("v").over(wg).alias("s"))
    assert sorted(got.collect()) == sorted(want.collect())


def test_carried_range_rejects_oversized_lookback(spark):
    with pytest.raises(ValueError):
        carried_range_buckets(_series(spark), "day", B, bucket_days=B)


def test_carried_rows_equals_global_rows_and_lag_lead(spark):
    df = _series(spark)
    aug = carried_rows_buckets(df, "day", k_back=3, k_fwd=1, bucket_rows=5)
    wp = W.partitionBy(BUCKET).orderBy("day")
    got = (
        aug.select(
            "day",
            CARRIED,
            F.sum("v").over(wp.rowsBetween(-3, 0)).alias("s"),
            F.lag("v").over(wp).alias("prev"),
            F.lead("v").over(wp).alias("nxt"),
        )
        .where(~F.col(CARRIED))
        .drop(CARRIED)
    )
    for dep in getattr(aug, "_cached_deps", []):
        dep.unpersist()
    wg = W.orderBy("day")
    want = df.select(
        "day",
        F.sum("v").over(wg.rowsBetween(-3, 0)).alias("s"),
        F.lag("v").over(wg).alias("prev"),
        F.lead("v").over(wg).alias("nxt"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_bucketed_prefix_cumsum_equals_global_running_sum(spark):
    df = _series(spark)
    got = bucketed_prefix_cumsum(df, "day", "v", "run", bucket_days=B)
    wg = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.select("day", F.sum("v").over(wg).alias("run"))
    assert sorted((r["day"], r["run"]) for r in got.collect()) == sorted(
        (r["day"], r["run"]) for r in want.collect()
    )
    for dep in getattr(got, "_cached_deps", []):
        dep.unpersist()


def test_bucketed_gap_fill_equals_global_ffill_bfill(spark):
    # dense spine with nulls => gaps, incl. leading/trailing nulls and a
    # run of nulls spanning a whole bucket (days 20..39 all null)
    rows = []
    for d in range(-5, 66):
        known = d in (1, 5, 9, 12, 19, 40, 59, 64)
        rows.append((d, Decimal(d + 100) if known else None))
    df = spark.createDataFrame(rows, "day int, v decimal(18,2)")
    got = bucketed_gap_fill(df, "day", "v", bucket_days=B).select(
        "day", "__prev_day", "__prev_val", "__next_day", "__next_val"
    )
    back = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    fwd = W.orderBy("day").rowsBetween(0, W.unboundedFollowing)
    kd = F.when(F.col("v").isNotNull(), F.col("day"))
    want = df.select(
        "day",
        F.last(kd, ignorenulls=True).over(back).alias("__prev_day"),
        F.last("v", ignorenulls=True).over(back).alias("__prev_val"),
        F.first(kd, ignorenulls=True).over(fwd).alias("__next_day"),
        F.first("v", ignorenulls=True).over(fwd).alias("__next_val"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    for dep in getattr(got, "_cached_deps", []):
        dep.unpersist()


def test_prefix_cumsum_handles_null_days_and_empty_input(spark):
    """NULL day rows sort first in the global window (ASC NULLS FIRST),
    so their sum must feed every later running total; and an empty
    input must keep the decimal output type (r5 review findings)."""
    rows = [(None, Decimal(5)), (1, Decimal(10)), (12, Decimal(20))]
    df = spark.createDataFrame(rows, "day int, v decimal(18,2)")
    got = bucketed_prefix_cumsum(df, "day", "v", "run", bucket_days=10)
    vals = {r["day"]: r["run"] for r in got.collect()}
    assert vals[1] == Decimal("15.00") and vals[12] == Decimal("35.00")
    for dep in getattr(got, "_cached_deps", []):
        dep.unpersist()

    empty = spark.createDataFrame([], "day int, v decimal(18,2)")
    out = bucketed_prefix_cumsum(empty, "day", "v", "run", bucket_days=10)
    assert dict(out.dtypes)["run"].startswith("decimal")
    assert out.count() == 0
    for dep in getattr(out, "_cached_deps", []):
        dep.unpersist()


def test_range_carry_keeps_null_day_rows(spark):
    """A NULL day must survive the ~CARRIED filter (plain != would make
    CARRIED null and silently drop the row, r5 review finding) and see
    only its null group — matching the global RANGE window."""
    df = spark.createDataFrame(
        [(None, Decimal(5)), (None, Decimal(7)), (3, Decimal(10))],
        "day int, v decimal(18,2)",
    )
    aug = carried_range_buckets(df, "day", 2, bucket_days=10)
    wp = W.partitionBy(BUCKET).orderBy("day").rangeBetween(-2, 0)
    got = (
        aug.withColumn("s", F.sum("v").over(wp))
        .where(~F.col(CARRIED))
        .select("day", "s")
    )
    wg = W.orderBy("day").rangeBetween(-2, 0)
    want = df.select("day", F.sum("v").over(wg).alias("s"))
    assert sorted(
        ((r["day"] is None, r["day"]), r["s"]) for r in got.collect()
    ) == sorted(((r["day"] is None, r["day"]), r["s"]) for r in want.collect())
