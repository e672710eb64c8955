"""Bucketed (hash-clustered) table layout: shuffle-free co-located joins.

The reference joins its silver tables on every gold refresh
(db_notebooks/04_gold_fact_orders.py:57-58 — orders ⋈ customers ⋈
order_items on each run, and 05/06 repeat the order_id join); on
Databricks the storage layer amortizes that. At 100 TB the
same amortization comes from BUCKETING: write both fact tables
hash-distributed into the same number of buckets on the join key, and
every subsequent equi-join on that key is a zero-Exchange sort-merge
join — the shuffle is paid ONCE at write time and never again, the
single biggest repeated-join optimization Spark offers.

This module wraps Spark's native bucketed data source tables
(`DataFrameWriter.bucketBy` + `saveAsTable`): files are laid out as
`part-*_NNNNN` where NNNNN is `hash(key) % n_buckets`, the catalog
records the bucket spec, and the planner consumes it as an output
partitioning (HashPartitioning(n_buckets)) — so SortMergeJoin of two
same-bucketed tables needs no Exchange and (with sortBy) no Sort.
Design rules encoded here:

- n_buckets must MATCH on both sides (Spark 3+ can coalesce mismatched
  bucket counts when one divides the other, but matching is the
  predictable contract);
- sortBy(join_key) makes the per-bucket files pre-sorted, removing the
  Sort as well — the join degenerates to a streaming merge;
- bucket pruning: equality predicates on the bucket column scan 1/N of
  the files (`spark.sql.sources.bucketing.enabled` — on by default).

Pinned by tests/test_operators.py::test_bucketed_join_is_shuffle_free:
the joined plan contains zero Exchange operators, while the same join
over plain parquet shuffles both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    keys: list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed external parquet table: hash-distributed
    into n_buckets on keys, per-bucket files sorted by keys (so joins
    skip both Exchange and Sort). The catalog entry carries the bucket
    spec; the files live at `path`."""
    if not keys:
        raise ValueError("bucketed write needs at least one key column")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, keys[0], *keys[1:])
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.option("path", path).saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — `spark.table`, not
    `spark.read.parquet(path)`: the bucket spec lives in the catalog
    entry, and a path-based read silently degrades to an ordinary scan
    that re-shuffles on every join."""
    return spark.table(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket keys. With
    both sides bucketed into the same N on `on`, the planner reuses the
    storage layout as the join distribution: no Exchange, and no Sort
    when both were written sortBy(on)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on=on
    )
