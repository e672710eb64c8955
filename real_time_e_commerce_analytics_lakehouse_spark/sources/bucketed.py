"""Bucketed tables: shuffle-free co-located joins and aggregations.

The single biggest cost of a 100 TB fact-to-fact join is the shuffle of
both sides on the join key. Spark's native bucketing pre-shuffles at
WRITE time: `bucketBy(n, keys)` hash-partitions rows into n buckets per
key and records the spec in the catalog, so a later join (or groupBy) on
those keys reads both sides already co-located — the planner emits a
SortMergeJoin with NO Exchange on either side (and with `sortBy` the
per-bucket Sort disappears too). One shuffle paid once at ingest,
amortized over every downstream join.

This is the catalog-backed complement to the LakeTable layer (which
covers transactional semantics; Spark's bucket spec requires the
catalog, so the two are separate by design — the reference's Delta
tables are likewise metastore-registered, 01_bronze_csv_to_delta.py).

Rules enforced here (violating them silently re-introduces the shuffle):
- both sides bucketed by the SAME number of buckets on the join keys,
- bucket columns are exactly the join keys (a superset disables reuse),
- `spark.sql.sources.bucketing.enabled` stays true (default).

tests/test_formats.py asserts the join plan is Exchange-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    keys: str | Sequence[str],
    sort: bool = True,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write `df` as a catalog table bucketed on `keys`.

    `sort=True` additionally sorts rows within each bucket file by the
    keys, letting the downstream SortMergeJoin skip its per-bucket Sort
    (plan shows neither Exchange nor Sort)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format(format).mode(mode).bucketBy(buckets, *ks)
    if sort:
        w = w.sortBy(*ks)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed catalog table; the bucket spec travels with the
    catalog entry, so joins/aggs on the bucket keys skip their shuffle."""
    return spark.table(name)


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys. Purely a
    readability wrapper — the shuffle elimination comes from the bucket
    specs, which `write_bucketed` guarantees match when both tables were
    written with the same `buckets`/`keys`."""
    on_cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_name).join(spark.table(right_name), on_cols, how)
