"""Scale-path variants as gate queries: each computes the SAME answer as
a plain-Spark spelling (hash-checked against the DuckDB oracle) through
a plan that survives hot keys / avoids single-reducer stages at 100 TB.

- salted two-phase aggregation (VERDICT r1 next #10 — skew story for
  aggs, complementing operators/skew.salted_join)
- explicit two-stage exact COUNT(DISTINCT) (value joins the shuffle key)
- distributed dense surrogate ids (no global-window row_number)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.ids import dense_row_ids
from real_time_e_commerce_analytics_lakehouse_spark.operators.skew import (
    salted_agg,
    two_stage_count_distinct,
)
from real_time_e_commerce_analytics_lakehouse_spark.plans.registry import (
    dec_avg,
    dec_sum,
    register,
    table,
)


@register(
    "salted_revenue_by_status",
    oracle=f"""
    SELECT o_orderstatus,
           {dec_sum("o_totalprice")} AS revenue,
           CAST(count(o_totalprice) AS BIGINT) AS n_orders,
           {dec_avg("o_totalprice")} AS avg_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc=(
        "Hot-key-safe aggregation: two-phase salted groupBy (partial on "
        "(status, salt), exact recombine on status) — o_orderstatus has "
        "~3 values, the worst-case skew shape where every row funnels "
        "into 3 reduce tasks. Decimal partials keep the recombined sum "
        "bit-identical to the one-shot aggregation (hash-checked)."
    ),
    tags=("agg", "skew"),
)
def salted_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    proj = orders.select(
        "o_orderstatus",
        F.expr("cast(o_totalprice as decimal(18,6))").alias("__term"),
        "o_totalprice",
    )
    agged = salted_agg(
        proj,
        "o_orderstatus",
        {"__dec": ("sum", "__term"), "n_orders": ("count", "o_totalprice")},
        salt=8,
    )
    return agged.select(
        "o_orderstatus",
        F.expr("cast(round(__dec, 2) as double)").alias("revenue"),
        F.col("n_orders"),
        F.expr("round(cast(__dec as double) / n_orders, 6)").alias("avg_price"),
    )


@register(
    "skewsafe_distinct_customers_by_status",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc=(
        "Exact COUNT(DISTINCT) via the explicit two-stage spelling: "
        "stage 1 shuffles on (status, custkey) — the hot status group's "
        "distinct-set build spreads across every task — stage 2 counts "
        "per status. Same answer as countDistinct (hash-checked)."
    ),
    tags=("agg", "skew"),
)
def skewsafe_distinct_customers_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return two_stage_count_distinct(
        orders, "o_orderstatus", "o_custkey", out="distinct_customers"
    )


@register(
    "surrogate_dim_customer_scalable",
    oracle="""
    SELECT row_number() OVER (ORDER BY c_custkey) AS customer_sk,
           c_custkey, c_name, c_mktsegment
    FROM customer
    """,
    doc=(
        "Dense surrogate keys WITHOUT the global-window single reducer "
        "(VERDICT r1 wrong #3): deterministic range buckets + per-bucket "
        "row_number + cumulative offsets. Bit-identical to row_number() "
        "OVER (ORDER BY c_custkey) because the key is unique."
    ),
    tags=("ids", "scale"),
)
def surrogate_dim_customer_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    ranked = dense_row_ids(customer, "c_custkey", out="customer_sk")
    out = ranked.select("customer_sk", "c_custkey", "c_name", "c_mktsegment")
    # the select sheds the persist lease; re-attach (r5 review)
    out._cached_deps = getattr(ranked, "_cached_deps", [])
    return out


def _staging_dir(prefix: str, sf_dir: str) -> str:
    """Per-process staging dir under the system temp root, registered
    for atexit removal: the pid-keyed tag that keeps concurrent
    harnesses from racing also guarantees no LATER process reuses the
    path, so without the atexit hook every run leaked a full staged
    table copy into /tmp (r4 review)."""
    import atexit
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{os.getpid()}".encode()
    ).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


@register(
    "laketable_format_roundtrip",
    oracle=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum("o_totalprice")} AS revenue
    FROM orders
    WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')
    GROUP BY o_custkey
    """,
    doc=(
        "End-to-end roundtrip through the `laketable` Spark format "
        "(sources/pyds.py, Spark 4 Python DataSource API): HIGH-priority "
        "orders land via df.write.format('laketable') (Arrow task "
        "files + exclusive-create manifest commit), MEDIUM-priority "
        "orders via a second APPEND commit, and the aggregate reads the "
        "two-version table back through spark.read.format('laketable'). "
        "A wrong byte anywhere in the format path — manifest layout, "
        "Arrow write, schema inference, snapshot assembly — changes the "
        "oracle-checked result. The staging dir lives under the system "
        "temp dir, rebuilt per run (the write IS the operator under "
        "test)."
    ),
    tags=("table", "formats", "agg"),
)
def laketable_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import pyds

    pyds.register(spark)
    path = _staging_dir("laketable_fmt", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    orders.where(F.col("o_orderpriority") == "2-HIGH").write.format(
        "laketable"
    ).mode("overwrite").save(path)
    orders.where(F.col("o_orderpriority") == "3-MEDIUM").write.format(
        "laketable"
    ).mode("append").save(path)
    back = spark.read.format("laketable").load(path)
    return back.groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "delta_format_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum("o_totalprice")} AS revenue
    FROM orders
    WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM')
    GROUP BY o_orderpriority
    """,
    doc=(
        "End-to-end roundtrip through the `delta` Spark format "
        "(sources/delta_table.py — the reference's NATIVE table API, "
        "db_notebooks/01_bronze_csv_to_delta.py:49-55, served without "
        "delta-spark): HIGH-priority orders land via df.write.format("
        "'delta') partitioned by priority (Hive dirs + one atomic JSON "
        "commit), MEDIUM-priority orders via a second APPEND commit, "
        "optimize_delta bin-packs each partition's files with "
        "dataChange=false swaps, and the aggregate reads the table back "
        "through spark.read.format('delta'). A wrong byte anywhere — "
        "add-action shaping, partitionValues canonicalization, commit "
        "atomicity, compaction rewrite, typed partition restore — "
        "changes the oracle-checked result. 100 TB: tasks write files, "
        "the driver appends O(files) JSON lines; reads plan one "
        "InputPartition per live file."
    ),
    tags=("table", "formats", "agg", "delta"),
)
def delta_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        optimize_delta,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_fmt", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    orders.where(F.col("o_orderpriority") == "2-HIGH").write.format(
        "delta"
    ).option("partition_by", "o_orderpriority").mode("overwrite").save(path)
    orders.where(F.col("o_orderpriority") == "3-MEDIUM").write.format(
        "delta"
    ).mode("append").save(path)
    optimize_delta(spark, path)
    back = spark.read.format("delta").load(path)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "convert_merge_by_source_roundtrip",
    oracle=f"""
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           {dec_sum("p_retailprice * 2")} AS retail
    FROM part
    WHERE p_partkey % 3 = 0
    GROUP BY p_brand
    """,
    doc=(
        "CONVERT TO DELTA + the MERGE third branch family, end to end "
        "(both new r8): the part table lands as a PLAIN Hive-"
        "partitioned parquet dir (p_brand values carry '#', exercising "
        "dir-value unescaping), DeltaTable.convertToDelta adopts it in "
        "place (zero copy, footer stats on every add), then one MERGE "
        "with whenMatchedUpdateAll + whenNotMatchedBySourceDelete "
        "doubles the price of every key divisible by 3 and deletes the "
        "rest (WHEN NOT MATCHED BY SOURCE — key-range file pruning "
        "auto-disabled, its rows live OUTSIDE the source's range), and "
        "the aggregate reads the table back through format('delta'). "
        "A wrong byte in conversion, partition unescaping, either "
        "merge branch, or the pruning gate changes the oracle-checked "
        "result. 100 TB: conversion is O(files) driver JSON; the merge "
        "rewrites only files containing touched rows."
    ),
    tags=("table", "formats", "delta", "dml", "agg"),
)
def convert_merge_by_source_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )

    delta_table.register(spark)
    path = _staging_dir("convert_nmbs", sf_dir)
    part = table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_brand"
    )
    part.write.partitionBy("p_brand").parquet(path)
    dt = DeltaTable.convertToDelta(
        spark, f"parquet.`{path}`", "p_brand string"
    )
    src = part.where(F.col("p_partkey") % 3 == 0).withColumn(
        "p_retailprice", F.col("p_retailprice") * 2
    )
    (
        dt.alias("t")
        .merge(src.alias("s"), "t.p_partkey = s.p_partkey")
        .whenMatchedUpdateAll()
        .whenNotMatchedBySourceDelete()
        .execute()
    )
    back = spark.read.format("delta").load(path)
    return back.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n_parts"),
        F.expr(dec_sum("p_retailprice")).alias("retail"),
    )


@register(
    "cloudfiles_bronze_roundtrip",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum("o_totalprice")} AS revenue,
           CAST(count(DISTINCT source_file) AS BIGINT) AS n_source_files
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               CAST(1 AS BIGINT) AS source_file
        FROM orders WHERE o_orderkey % 4 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice, 2
        FROM orders WHERE o_orderkey % 4 = 1
    )
    GROUP BY o_orderstatus
    """,
    doc=(
        "The reference's bronze ingestion END TO END — Auto Loader "
        "shape (db_notebooks/01_bronze_csv_to_delta.py:33-55) with the "
        "exact API strings: two CSV batches staged to a landing dir, "
        "spark.readStream.format('cloudFiles') with schemaLocation "
        "tracking + _metadata.file_path lineage, writeStream.format("
        "'delta') availableNow with checkpoint — drained TWICE (the "
        "second file arrives after the first drain, proving the ledger "
        "offsets deliver exactly-once increments) — then the aggregate "
        "reads the bronze Delta table back, counting distinct "
        "source_file lineage values per group. A wrong byte in "
        "discovery order, schema inference, offset resume, the "
        "exactly-once sink txn, or lineage stamping changes the "
        "oracle-checked result. 100 TB: discovery is one incremental "
        "listing per trigger; each file is one executor InputPartition."
    ),
    tags=("table", "formats", "streaming", "cloudfiles", "agg"),
)
def cloudfiles_bronze_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import time as _time

    from pyspark.sql.functions import col

    from real_time_e_commerce_analytics_lakehouse_spark.sources import (
        cloudfiles,
        delta_table,
    )

    cloudfiles.register(spark)
    delta_table.register(spark)
    root = _staging_dir("cloudfiles_bronze", sf_dir)
    src = os.path.join(root, "landing")
    ckpt = os.path.join(root, "ck")
    tgt = os.path.join(root, "bronze")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def land(batch_no: int, df) -> None:
        # one CSV file per batch: coalesce(1) keeps the lineage count
        # deterministic (n_source_files in the oracle)
        staged = os.path.join(root, f"stage{batch_no}")
        df.coalesce(1).write.option("header", "true").csv(staged)
        part = next(
            f for f in os.listdir(staged) if f.endswith(".csv")
        )
        os.makedirs(src, exist_ok=True)
        os.replace(
            os.path.join(staged, part),
            os.path.join(src, f"batch_{batch_no}.csv"),
        )

    def drain() -> None:
        stream_df = (
            spark.readStream.format("cloudFiles")
            .option("cloudFiles.format", "csv")
            .option("cloudFiles.schemaLocation", os.path.join(ckpt, "schema"))
            .option("header", "true")
            .option("inferSchema", "true")
            .load(src)
            .withColumn("source_file", col("_metadata.file_path"))
            .drop("_metadata")
        )
        q = (
            stream_df.writeStream.format("delta")
            .option("checkpointLocation", os.path.join(ckpt, "checkpoint"))
            .trigger(availableNow=True)
            .start(tgt)
        )
        q.awaitTermination(120)
        _time.sleep(0.2)

    land(1, orders.where(F.col("o_orderkey") % 4 == 0))
    drain()
    land(2, orders.where(F.col("o_orderkey") % 4 == 1))
    drain()

    bronze = spark.read.format("delta").load(tgt)
    return bronze.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
        F.countDistinct("source_file").cast("long").alias("n_source_files"),
    )


@register(
    "delta_merge_dml_roundtrip",
    oracle=f"""
    WITH final AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 2 = 0
                    THEN o_totalprice + 1000.0 ELSE o_totalprice
               END AS price
        FROM orders
        WHERE (o_orderkey % 3 = 0 OR o_orderkey % 2 = 0)
          AND o_orderkey % 5 <> 0
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum("price")} AS revenue
    FROM final
    GROUP BY o_orderstatus
    """,
    doc=(
        "Row-level DML on a FOREIGN Delta table end-to-end "
        "(sources/delta_dml — the reference's silver MERGE shape, "
        "db_notebooks/02_bronze_to_silver.py whenMatchedUpdateAll/"
        "whenNotMatchedInsertAll, without delta-spark and without "
        "converting the table): seed orders (key%3=0) through "
        "format('delta'), MERGE a source of every even key (updates "
        "reprice +1000, the rest insert), then a MERGE-ON-READ DELETE "
        "of key%5=0 that writes real roaring deletion vectors instead "
        "of rewriting files; the aggregate reads the final state back "
        "through the format reader, DVs applied in-scan. A wrong byte "
        "in file-pruned rewrite, CDC staging, DV framing, or the "
        "remove+add replace spelling changes the oracle-checked "
        "result. 100 TB: only files containing matched keys rewrite; "
        "the MoR delete is O(deleted rows) bitmap bytes."
    ),
    tags=("table", "formats", "delta", "dml", "agg"),
)
def delta_merge_dml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        delete_delta,
        merge_delta,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_dml", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.where(F.col("o_orderkey") % 3 == 0).write.format("delta").mode(
        "overwrite"
    ).save(path)
    src = orders.where(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(1000.0)
    )
    merge_delta(spark, path, src, ["o_orderkey"])
    delete_delta(spark, path, F.col("o_orderkey") % 5 == 0, mode="mor")
    back = spark.read.format("delta").load(path)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "row_tracking_roundtrip",
    oracle="""
    WITH seed AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(row_number() OVER (ORDER BY o_orderkey) - 1
                    AS BIGINT) AS rid
        FROM orders WHERE o_orderkey % 3 = 0
    ), added AS (
        SELECT o_orderkey, o_orderstatus,
               (SELECT count(*) FROM seed)
               + row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 = 0
    ), unioned AS (
        SELECT * FROM seed UNION ALL SELECT * FROM added
    )
    SELECT o_orderkey, CAST(rid AS BIGINT) AS row_id, o_orderstatus
    FROM unioned
    WHERE o_orderkey % 5 <> 0
    """,
    doc=(
        "Row tracking end-to-end on a foreign Delta table (PROTOCOL.md "
        "'Row Tracking', sources/delta_log stamp_row_tracking): seed a "
        "single sorted file through format('delta'), enable "
        "delta.enableRowTracking (protocol -> writer 7 + rowTracking/"
        "domainMetadata, backfill baseRowId 0), append a second sorted "
        "file (fresh ids above the high-water mark), MoR-DELETE %5 "
        "rows (DV re-add preserves the file's baseRowId — survivors "
        "keep their ids by POSITION), then OPTIMIZE, which must "
        "MATERIALIZE every surviving row's id into the config-named "
        "physical column before compaction moves it. The read "
        "(format('delta').option('withRowIds')) returns "
        "coalesce(materialized, baseRowId + position): since both "
        "writes were single sorted files, every id is the row's rank "
        "at write time and the whole mapping is oracle-exact. A wrong "
        "byte in the domain water mark, the backfill, DV-keyed "
        "re-adds, or the materialization column changes a row id. "
        "100 TB: ids are per-file base + position — assignment is "
        "driver-side arithmetic over file metadata, never a data scan."
    ),
    tags=("table", "formats", "delta", "dml"),
)
def row_tracking_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        delete_delta,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        alter_delta_properties,
        optimize_delta,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_rowtrack", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    seed = (
        orders.where(F.col("o_orderkey") % 3 == 0)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    seed.write.format("delta").mode("overwrite").save(path)
    alter_delta_properties(path, {"delta.enableRowTracking": "true"})
    added = (
        orders.where(
            (F.col("o_orderkey") % 3 != 0) & (F.col("o_orderkey") % 7 == 0)
        )
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    added.write.format("delta").mode("append").save(path)
    delete_delta(spark, path, F.col("o_orderkey") % 5 == 0, mode="mor")
    optimize_delta(spark, path, target_file_bytes=1 << 30)
    back = (
        spark.read.format("delta").option("withRowIds", "true").load(path)
    )
    return back.select(
        "o_orderkey",
        F.col("_row_id").alias("row_id"),
        "o_orderstatus",
    )


@register(
    "identity_merge_roundtrip",
    oracle="""
    WITH seed AS (
        SELECT o_orderkey, o_totalprice,
               CAST(90 + 10 * row_number() OVER (ORDER BY o_orderkey)
                    AS BIGINT) AS sk
        FROM orders WHERE o_orderkey % 4 = 1
    )
    SELECT sk, o_orderkey,
           CASE WHEN o_orderkey % 3 = 0
                THEN o_totalprice + 500.0 ELSE o_totalprice
           END AS price
    FROM seed
    """,
    doc=(
        "Identity columns end-to-end (PROTOCOL.md 'Identity Columns', "
        "sources/delta_dml): CREATE TABLE with sk GENERATED ALWAYS AS "
        "IDENTITY (START 100 STEP 10), insert_delta a single sorted "
        "partition — generation assigns 100, 110, ... in row order and "
        "re-emits metaData with the bumped high-water mark — then a "
        "matched-only MERGE repricing %3 keys, which must KEEP every "
        "target row's identity value (an update never re-issues "
        "identity). The surrogate-key mapping is rank-determined, so "
        "the oracle reproduces it exactly. 100 TB: generation is "
        "per-partition offsets (one count row per partition to the "
        "driver) + a per-partition window — no global reducer."
    ),
    tags=("table", "formats", "delta", "dml", "functions"),
)
def identity_merge_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        create_delta_table,
        insert_delta,
        merge_delta,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        read_delta_log,
    )

    path = _staging_dir("delta_identity", sf_dir)
    create_delta_table(
        path,
        "sk bigint, o_orderkey bigint, o_totalprice double",
        identity={"sk": {"start": 100, "step": 10}},
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    seed = (
        orders.where(F.col("o_orderkey") % 4 == 1)
        .repartition(1)
        .sortWithinPartitions("o_orderkey")
    )
    insert_delta(spark, path, seed)
    src = seed.where(F.col("o_orderkey") % 3 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(500.0)
    )
    merge_delta(
        spark, path, src, ["o_orderkey"], insert_when_not_matched=False
    )
    back = read_delta_log(spark, path)
    return back.select(
        "sk", "o_orderkey", F.col("o_totalprice").alias("price")
    )


@register(
    "clustered_optimize_roundtrip",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {dec_sum("o_totalprice")} AS revenue
    FROM orders
    WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus, o_orderpriority
    """,
    doc=(
        "Liquid clustering end-to-end on a foreign Delta table "
        "(delta_log.cluster_by_delta): seed fragmented files, CLUSTER "
        "BY (status, priority) — the delta.clustering domain + writer "
        "feature — then OPTIMIZE with no explicit key, which must pick "
        "the domain's columns up and rewrite range-clustered on their "
        "Morton key; the aggregate reads the clustered table back "
        "through the format reader. Data must be byte-identical under "
        "re-clustering; a wrong physical->logical column resolution or "
        "a dropped row in the rewrite diverges from the oracle. "
        "100 TB: OPTIMIZE groups are independent per partition combo "
        "and the rewrite is a plain Spark scan+write."
    ),
    tags=("table", "formats", "delta"),
)
def clustered_optimize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        cluster_by_delta,
        optimize_delta,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_cluster", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    orders.where(F.col("o_orderkey") % 3 == 0).repartition(4).write.format(
        "delta"
    ).mode("overwrite").save(path)
    cluster_by_delta(path, ["o_orderstatus", "o_orderpriority"])
    optimize_delta(spark, path, target_file_bytes=1 << 20)
    back = spark.read.format("delta").load(path)
    return back.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "alter_evolution_roundtrip",
    oracle=f"""
    SELECT o_orderkey, status,
           CASE WHEN o_orderkey % 2 = 0
                THEN o_totalprice ELSE NULL
           END AS amount
    FROM (
        SELECT o_orderkey, o_orderstatus AS status, o_totalprice
        FROM orders WHERE o_orderkey % 5 = 0
    ) t
    """,
    doc=(
        "Metadata-only schema evolution end-to-end "
        "(delta_log.alter_delta_schema): seed, upgrade to name-mode "
        "column mapping, ALTER ADD an 'amount' column (old files must "
        "null-fill), ALTER RENAME o_orderstatus -> status (the "
        "physical name stays; files written BEFORE the rename must "
        "keep resolving), then UPDATE fills 'amount' for even keys "
        "through the DML tier (which writes the new column under its "
        "allocated physical name). Read back through the format "
        "reader: any broken physical->logical resolution, dropped "
        "null-fill, or mis-keyed rewrite diverges from the oracle. "
        "100 TB: every ALTER is one metaData re-emission — zero file "
        "rewrites; only the UPDATE's matched files rewrite."
    ),
    tags=("table", "formats", "delta", "functions"),
)
def alter_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        update_delta,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        alter_delta_properties,
        alter_delta_schema,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_alter", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    seed = orders.where(F.col("o_orderkey") % 5 == 0)
    seed.write.format("delta").mode("overwrite").save(path)
    alter_delta_properties(path, {"delta.columnMapping.mode": "name"})
    alter_delta_schema(path, add="amount double")
    alter_delta_schema(path, rename={"o_orderstatus": "status"})
    update_delta(
        spark,
        path,
        "o_orderkey % 2 = 0",
        {"amount": "o_totalprice"},
    )
    back = spark.read.format("delta").load(path)
    return back.select("o_orderkey", "status", "amount")


@register(
    "incremental_mart_maintenance",
    oracle="""
    SELECT o_orderstatus,
           CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderstatus
    """,
    doc=(
        "Incremental view maintenance end-to-end (operators/"
        "incremental.incremental_agg_refresh — Delta-CDF-fed exact IVM, "
        "the engine's materialized-view tier): a LakeTable source takes "
        "an initial load, an append batch deliberately written with "
        "WRONG amounts, a corrective MERGE upsert (update_preimage/"
        "postimage churn), and a copy-on-write DELETE; after each "
        "commit the aggregate table folds ONLY the signed change rows "
        "(cost ∝ churn, never table size). The returned mart must equal "
        "the oracle's full recompute over the FINAL source state — any "
        "double-count, missed retraction, or sign error diverges. "
        "Staging tables live under the system temp dir, keyed by "
        "(sf_dir, pid) like laketable_format_roundtrip."
    ),
    tags=("table", "incremental", "agg"),
)
def incremental_mart_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
        incremental_agg_refresh,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    base = _staging_dir("ivm_mart", sf_dir)
    src = LakeTable(spark, os.path.join(base, "src"))
    agg = LakeTable(spark, os.path.join(base, "agg"))

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    evens = orders.where(F.col("o_orderkey") % 2 == 0)
    odds = orders.where(F.col("o_orderkey") % 2 == 1)

    def refresh(since: int | None) -> int:
        v = incremental_agg_refresh(
            agg,
            src,
            since,
            group_cols=["o_orderstatus"],
            sum_cols=["o_totalprice"],
            keys="o_orderkey",
        )
        return v if v is not None else (since or 0)

    src.overwrite(evens)
    v = refresh(None)
    # append the odd half with corrupted amounts, then correct it via
    # MERGE: the refresh folds insert + update_preimage/postimage rows
    src.append(odds.withColumn("o_totalprice", F.col("o_totalprice") + 1000.0))
    src.merge_upsert(odds, keys="o_orderkey")
    v = refresh(v)
    # copy-on-write delete: retractions must subtract out exactly
    src.delete(F.col("o_orderkey") % 7 == 0)
    refresh(v)

    return agg.read().select(
        "o_orderstatus",
        F.round(F.col("sum_o_totalprice").cast("double"), 2).alias("revenue"),
        F.col("n_rows"),
    )


@register(
    "delta_change_feed",
    oracle=f"""
    SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS _commit_version,
               'insert' AS _change_type,
               o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               {dec_sum("o_totalprice")} AS revenue
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_orderstatus
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'delete', o_orderstatus,
               CAST(count(*) AS BIGINT),
               {dec_sum("o_totalprice")}
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0
        GROUP BY o_orderstatus
    ) t
    """,
    doc=(
        "Batch change feed derived from a Delta transaction log "
        "(sources/delta_log.delta_changes — CDF parity without "
        "_change_data files): URGENT orders land in a laketable and "
        "export to a Delta log (commit 0 → inserts), a merge-on-read "
        "DELETE exports as a deletion-vector re-add (commit 1 → ONLY "
        "the newly-tombstoned rows as deletes, derived from the roaring "
        "bitmap DIFF, not a file-level delete+reinsert). The per-"
        "(version, change type, status) aggregate must equal the "
        "oracle's direct reconstruction from the source rows — a wrong "
        "bitmap bit, a missed dataChange flag, or a file-level fallback "
        "changes counts or sums. Staging under the system temp dir, "
        "rebuilt per run (the log round-trip IS the operator under "
        "test)."
    ),
    tags=("table", "formats", "cdf", "agg"),
)
def delta_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        delta_changes,
        export_delta_log,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    path = _staging_dir("delta_cdf", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    t = LakeTable(spark, path)
    t.overwrite(orders.where(F.col("o_orderpriority") == "1-URGENT"))
    export_delta_log(t)  # delta v0: inserts
    t.delete(F.col("o_orderkey") % 5 == 0, mode="mor")
    export_delta_log(t)  # delta v1: DV diff -> row-level deletes
    ch = delta_changes(spark, path, 0)
    return ch.groupBy("_commit_version", "_change_type", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.expr(dec_sum("o_totalprice")).alias("revenue"),
    )


@register(
    "constrained_write_roundtrip",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000.0
                THEN 'high' ELSE 'low' END AS price_band,
           TRUE AS sk_ok,
           TRUE AS violation_refused
    FROM orders WHERE o_orderkey % 7 = 0
    """,
    doc=(
        "Arrow-tier constraint enforcement end-to-end (VERDICT r8 "
        "missing #3, sources/arrow_enforce.py): create a foreign Delta "
        "table carrying a CHECK constraint, a GENERATED column, and a "
        "GENERATED ALWAYS identity column, then write through plain "
        "df.write.format('delta') — the most natural spelling, refused "
        "outright before r9. The writer must COMPUTE the generated "
        "column per arrow batch, GENERATE unique step-aligned identity "
        "values (per-task disjoint id-blocks; the commit advances the "
        "water mark), and ABORT a violating batch before any file is "
        "adopted. Deterministic outputs only reach the oracle: the "
        "generated band, per-row identity validity booleans (non-null, "
        "aligned, unique — id VALUES are engine-specific by design, "
        "like upstream's), and the refusal outcome. 100 TB: "
        "enforcement is per arrow batch (DuckDB over the batch, "
        "zero-copy), identity blocks need zero coordination."
    ),
    tags=("table", "formats", "delta", "functions"),
)
def constrained_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        create_delta_table,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        read_delta_log,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_enforce", sf_dir)
    create_delta_table(
        path,
        "o_orderkey bigint, o_totalprice double, "
        "price_band string, sk bigint",
        identity={"sk": {"start": 10, "step": 5}},
        generated={
            "price_band": (
                "CASE WHEN o_totalprice >= 100000.0 "
                "THEN 'high' ELSE 'low' END"
            )
        },
        configuration={"delta.constraints.pos_price": "o_totalprice > 0"},
    )
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    good = orders.where(F.col("o_orderkey") % 7 == 0)
    good.write.format("delta").mode("append").save(path)
    # a violating batch must abort and leave the table untouched
    bad = good.limit(3).withColumn("o_totalprice", F.lit(-1.0))
    refused = False
    try:
        bad.write.format("delta").mode("append").save(path)
    except Exception as exc:
        # the oracle's TRUE must prove CONSTRAINT refusal, not any
        # write failure (r9 advice): accept only an error that names
        # the violated constraint
        refused = "pos_price" in str(exc)
    back = read_delta_log(spark, path)
    sk_dupes = F.count(F.lit(1)).over(W.partitionBy("sk"))
    return back.select(
        "o_orderkey",
        "price_band",
        (
            F.col("sk").isNotNull()
            & (F.col("sk") >= 10)
            & ((F.col("sk") - 10) % 5 == 0)
            & (sk_dupes == 1)
        ).alias("sk_ok"),
        F.lit(refused).alias("violation_refused"),
    )


@register(
    "nested_cluster_optimize_roundtrip",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DOUBLE), 2) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderkey % 4 = 0
    GROUP BY o_orderstatus
    """,
    doc=(
        "NESTED liquid-clustering key end-to-end (VERDICT r8 missing "
        "#4): seed a foreign Delta table whose clustering key lives "
        "INSIDE a struct column, upgrade to name-mode column mapping "
        "(the nested physical names differ from the logical path), "
        "CLUSTER BY s.price — recorded as the spec's multi-part "
        "physical path — then OPTIMIZE with no explicit key: the "
        "domain's nested key resolves through the colmap walk and the "
        "rewrite range-clusters on the flattened key (a projected "
        "temp column that never reaches the files). The aggregate "
        "reads the table back logically; any dropped row, broken "
        "nested resolution, or leaked temp column diverges from the "
        "oracle. 100 TB: identical OPTIMIZE cost shape to the flat "
        "key — one extra narrow projection."
    ),
    tags=("table", "formats", "delta"),
)
def nested_cluster_optimize_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        alter_delta_properties,
        cluster_by_delta,
        optimize_delta,
    )

    delta_table.register(spark)
    path = _staging_dir("delta_nested_cluster", sf_dir)
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("s"),
    )
    orders.where(F.col("o_orderkey") % 4 == 0).repartition(4).write.format(
        "delta"
    ).mode("overwrite").save(path)
    alter_delta_properties(path, {"delta.columnMapping.mode": "name"})
    cluster_by_delta(path, ["s.price"])
    optimize_delta(spark, path, target_file_bytes=1 << 20)
    back = spark.read.format("delta").load(path)
    return back.groupBy(F.col("s.status").alias("status")).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.expr(dec_sum("s.price")).alias("revenue"),
    )
