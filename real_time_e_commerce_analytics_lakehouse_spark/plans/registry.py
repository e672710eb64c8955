"""Query registry.

Each capability of the engine is declared as a :class:`Query`: a Spark
DataFrame builder plus (where SQL-expressible) an equivalent ANSI-SQL
oracle that DuckDB can execute over the same parquet tables. The driver
compares the two at sf=0.01 (row count + schema + order-insensitive value
hash), which makes this registry the machine-checkable statement of what
the engine computes.

Conventions that make the hash comparison robust:

- Every computed column is aliased identically on both sides.
- Float aggregates are ``round()``-ed on both sides (sum order is not
  deterministic across engines; rounding makes the value stable).
- Computed integers are cast to BIGINT on both sides (DuckDB's
  ``sum(int)`` is HUGEINT, Spark's is LONG; ``datediff`` is INT in Spark
  and BIGINT in DuckDB).
- Window orderings carry full tie-breakers so row_number/top-k picks are
  deterministic.
- Session timezone is UTC (set in session.py) so timestamps agree with
  DuckDB's UTC-naive timestamps.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    """Decorator: register a (spark builder, oracle sql) pair under `name`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = Query(
            name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "",
            tags=tags, bench=bench,
        )
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (columnar parquet scan; Catalyst
    prunes columns and pushes filters into the scan).

    The engine's declared timestamp semantics are UTC (matching DuckDB's
    UTC-naive timestamps); we pin the session timezone here because the
    session may be caller-provided with a host-local zone, which would
    shift every collected timestamp."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return events_table(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def fan_out(df: DataFrame, by: str | None = None) -> DataFrame:
    """Rebalance a scan whose input has fewer splits than the session has
    cores, so scan-rooted CPU-heavy stages can use the whole machine.

    ``by`` (r11, guide §2.4 "two operations keyed the same way share
    one exchange"): when the consumer is a HIGH-CARDINALITY keyed
    aggregation/join, fan out by HASH on that key instead of round-
    robin — the one exchange then simultaneously rebalances the scan
    AND satisfies the downstream partitioning requirement, so the
    aggregation's own ENSURE_REQUIREMENTS exchange disappears; a
    round-robin fan-out additionally pays a local sort of its input
    (spark.sql.execution.sortBeforeRepartition, on by default so task
    retries stay deterministic) that a hash repartition skips. Only
    pass ``by`` for keys with many more distinct values than cores
    (fan_out's whole point is spreading; 6 groups -> 6 busy cores).

    Parquet's split unit is the ROW GROUP; the driver testdata ships one
    row group per file, so shingle hashing / vector folds / decimal
    aggregation rooted directly on such a scan runs single-threaded
    regardless of core count (Spark cannot subdivide a row group). One
    round-robin exchange costs a pass over the bytes and unlocks every
    core — measured 2.5x on minhash_signatures at sf0.1. The condition
    (splits*2 <= cores) makes this a NO-OP at real scale, where files
    carry a row group per ~128 MB and scans already parallelize: the
    exchange only ever appears when the scan would otherwise serialize.

    Safe under the exactness contract: every downstream aggregate is
    order-independent (decimal sums, min/max folds) and every ranking
    carries full tie-breakers, so a round-robin redistribution cannot
    change any result value.

    The split estimate is `len(df.inputFiles())` — a driver-side
    catalog listing. The old probe (`df.rdd.getNumPartitions()`) forced
    a DataFrame->RDD conversion on every benched query (VERDICT r3/r4);
    for the scans this helper wraps, one file carries one row group, so
    file count IS the split count, and at real scale (row group per
    ~128 MB file) the estimate stays conservative in the right
    direction: more files than cores -> no-op.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        splits = len(df.inputFiles())
    except Exception:  # non-file-rooted plan: nothing to rebalance
        return df
    if 0 < splits * 2 <= cores:
        if by is not None:
            # REPARTITION_BY_COL at the session's shuffle-partition
            # count: reusable by the downstream keyed operator, and
            # AQE may still coalesce it
            return df.repartition(F.col(by))
        return df.repartition(cores)
    return df


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to a µs TIMESTAMP regardless of the physical
    parquet layout, which has varied across driver testdata generations:

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it — read nanos
      as long (runtime SQL conf) and truncate to µs, Spark's native
      precision.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): read natively as
      TIMESTAMP_NTZ; cast to TIMESTAMP (identity under the pinned UTC
      session zone).

    The DuckDB oracle side applies CAST(ts AS TIMESTAMP) (truncating
    TIMESTAMP_NS → µs; no-op on µs), so both engines see identical µs
    timestamps; use EVENTS_CTE in oracle SQL."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # nanos-as-long layout
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


# Prefix for every oracle query touching `events`: normalizes ts to µs.
EVENTS_CTE = """
    WITH ev AS (
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
               event_type, value, props
        FROM events
    )
"""


def dec_sum(term_sql: str, scale: int = 2, inner_scale: int = 6) -> str:
    """SQL snippet for an order-independent float sum, valid in BOTH Spark
    SQL and DuckDB: cast each term to decimal (exact, deterministic per
    row), sum decimals (exact, order-independent), cast back to double and
    round. Plain double sums differ between engines in the last bits, which
    flips round() at .005 boundaries — decimals cannot.

    Precision 18 on purpose: Spark backs decimals with precision <= 18 by
    a plain Long (fast codegen'd arithmetic); 19+ switches to BigDecimal
    objects — measured ~2x slower on a 600k-row 8-agg query. Terms are
    < 1e12 in magnitude so 12 integer digits + 6 fraction fit; Spark
    widens the SUM result itself to decimal(28,6), so overflow headroom
    is ~1e22."""
    # round the DECIMAL (exact half-up in both engines), THEN cast to
    # double: round(double) differs between engines when the exact sum
    # lands on a .5 boundary that double cannot represent.
    return (
        f"cast(round(sum(cast(({term_sql}) as decimal(18,{inner_scale}))), "
        f"{scale}) as double)"
    )


def dec_avg(term_sql: str, scale: int = 6, inner_scale: int = 6) -> str:
    """Order-independent float avg (see dec_sum); NULL-safe via count(x)."""
    return (
        f"round(cast(sum(cast(({term_sql}) as decimal(18,{inner_scale}))) "
        f"as double) / count({term_sql}), {scale})"
    )
