"""Shuffle-heavy silver->gold mart build through the TABLE layer.

VERDICT r1 #9: the bench suite timed queries over raw parquet, so the
LakeTable machinery (partitioned write -> partition-scoped merge ->
snapshot read -> mart overwrite) was never on the clock. This module is
the benchmarkable round-trip, sized by whatever sf_dir it is pointed at:

1. silver write: lineitem partitioned by ship month (~84 partitions at
   any SF — one multi-path unit set per overwrite),
2. incremental merge: a one-month correction batch upserted by the
   unique line key — rewrites ONLY that month's units,
3. gold mart: snapshot read (single multi-path scan + partition-restore
   join) ⋈ orders, grouped to a (month, status) revenue mart, written
   through overwrite.

Every stage is the 100 TB shape: the merge cost is proportional to the
batch's partitions, not the table; the snapshot read stays one scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

MERGE_MONTH = "1995-06"  # the month the correction batch touches


def mart_build_roundtrip(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    """Run the silver->gold round-trip; returns row/partition counts so
    callers (bench + tests) can sanity-check the work actually happened."""
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    li = lineitem.withColumn(
        "l_month", F.date_format("l_shipdate", "yyyy-MM")
    )

    silver = LakeTable(
        spark, os.path.join(workdir, "silver", "lineitem"), partition_by=["l_month"]
    )
    silver.overwrite(li)
    n_units = len(silver._read_manifest(silver.latest_version()))

    # one-month correction batch: unconditional upsert, partition-scoped
    batch = li.filter(F.col("l_month") == MERGE_MONTH).withColumn(
        "l_returnflag", F.lower(F.col("l_returnflag"))
    )
    merge_rows = batch.count()
    # the driver testdata is NOT unique on (orderkey, linenumber) —
    # the in-plan dup guard caught that; the 4-column key IS unique
    silver.merge_upsert(
        batch, keys=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    )

    mart_df = (
        silver.read()
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_month", "o_orderstatus")
        .agg(
            F.expr(
                "cast(round(sum(cast(l_extendedprice * (1 - l_discount)"
                " as decimal(18,6))), 2) as double)"
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    gold = LakeTable(spark, os.path.join(workdir, "gold", "revenue_by_month_status"))
    gold.overwrite(mart_df)
    mart_rows = gold.read().count()
    return {
        "silver_units": n_units,
        "merge_batch_rows": merge_rows,
        "mart_rows": mart_rows,
    }
