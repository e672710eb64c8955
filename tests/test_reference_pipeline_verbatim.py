"""CAPSTONE: the reference's bronze->silver medallion runs against
this engine in its VERBATIM API shapes — the switch-over proof.

Bronze (db_notebooks/01_bronze_csv_to_delta.py:33-77): cloudFiles CSV
stream with schemaLocation + `_metadata.file_path` lineage, foreachBatch
into a Delta target — first batch plain format('delta') write, later
batches file-idempotent insert-only MERGE on source_file through the
fluent DeltaTable facade.

Silver (db_notebooks/02_bronze_to_silver.py:14-101): readStream
.format('delta') over the bronze table, per-batch window dedup +
cleaning, foreachBatch conditional MERGE (whenMatchedUpdate with the
strict 'source.ingestion_ts > target.ingestion_ts' guard and explicit
set, whenNotMatchedInsertAll).

The ONLY deviations from the notebooks: import lines (delta.tables ->
sources.delta_fluent; formats registered once per session). The
`_metadata` struct — hidden in real Spark, a visible column through the
Python DataSource API — is auto-excluded by the delta writers
(delta_table.strip_hidden_metadata) and projected away by MERGE, so the
notebook blocks run without a .drop."""

from __future__ import annotations

import csv
import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.sources import (
    cloudfiles,
    delta_table,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
    DeltaTable,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    cloudfiles.register(spark)
    delta_table.register(spark)


HEADER = (
    "customer_id", "customer_unique_id", "customer_zip_code_prefix",
    "customer_city", "customer_state",
)


def _land(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(rows)


def _bronze_drain(spark, src, ckpt, target_path):
    """01_bronze_csv_to_delta.py:33-77, verbatim shapes."""
    stream_df = (
        spark.readStream.format("cloudFiles")
        .option("cloudFiles.format", "csv")
        .option("cloudFiles.schemaLocation", ckpt + "/schema")
        .option("header", "true")
        .option("inferSchema", "true")
        .option("cloudFiles.schemaEvolutionMode", "addNewColumns")
        .load(src)
        .withColumn("ingestion_ts", F.current_timestamp())
        .withColumn("source_file", F.col("_metadata.file_path"))
    )

    def merge_to_bronze(microbatch_df, batch_id):
        if not DeltaTable.isDeltaTable(spark, target_path):
            (
                microbatch_df.write.format("delta")
                .mode("append")
                .save(target_path)
            )
            return
        target = DeltaTable.forPath(spark, target_path)
        (
            target.alias("t")
            .merge(microbatch_df.alias("s"), "t.source_file = s.source_file")
            .whenNotMatchedInsertAll()
            .execute()
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_to_bronze)
        .option("checkpointLocation", ckpt + "/checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)


def _silver_drain(spark, bronze_path, ckpt, silver_path):
    """02_bronze_to_silver.py:14-101, verbatim shapes."""
    bronze_stream = spark.readStream.format("delta").load(bronze_path)

    def process_customers_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        window_spec = Window.partitionBy("customer_id").orderBy(
            F.col("ingestion_ts").desc()
        )
        customers_dedup = (
            batch_df.withColumn(
                "row_num", F.row_number().over(window_spec)
            )
            .filter(F.col("row_num") == 1)
            .drop("row_num")
        )
        customers_clean = (
            customers_dedup.filter(F.col("customer_id").isNotNull())
            .filter(F.col("customer_unique_id").isNotNull())
            .withColumn(
                "customer_city", F.upper(F.trim(F.col("customer_city")))
            )
            .withColumn(
                "customer_state", F.upper(F.trim(F.col("customer_state")))
            )
            .withColumn(
                "customer_zip_code_prefix",
                F.col("customer_zip_code_prefix").cast("string"),
            )
            .withColumn("silver_processed_ts", F.current_timestamp())
        )
        if not DeltaTable.isDeltaTable(spark, silver_path):
            (
                customers_clean.write.format("delta")
                .mode("overwrite")
                .save(silver_path)
            )
            return
        silver_table = DeltaTable.forPath(spark, silver_path)
        (
            silver_table.alias("target")
            .merge(
                customers_clean.alias("source"),
                "target.customer_id = source.customer_id",
            )
            .whenMatchedUpdate(
                condition="source.ingestion_ts > target.ingestion_ts",
                set={
                    "customer_unique_id": "source.customer_unique_id",
                    "customer_zip_code_prefix": "source.customer_zip_code_prefix",
                    "customer_city": "source.customer_city",
                    "customer_state": "source.customer_state",
                    "ingestion_ts": "source.ingestion_ts",
                    "source_file": "source.source_file",
                    "silver_processed_ts": "source.silver_processed_ts",
                },
            )
            .whenNotMatchedInsertAll()
            .execute()
        )

    q = (
        bronze_stream.writeStream.foreachBatch(process_customers_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)


def test_bronze_to_silver_medallion_verbatim(spark, tmp_path):
    src = str(tmp_path / "landing")
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ck_b = str(tmp_path / "ck_bronze")
    ck_s = str(tmp_path / "ck_silver")

    _land(src, "batch1.csv", [
        ("c1", "u1", 11111, "rio", "rj"),
        ("c2", "u2", 22222, "sao paulo", "sp"),
        ("c2", "u2", 22222, "sao paulo", "sp"),  # in-file duplicate
        (None, "ux", 0, "ghost", "xx"),          # null key: filtered
    ])
    _bronze_drain(spark, src, ck_b, bronze)
    _silver_drain(spark, bronze, ck_s, silver)

    rows = {
        r.customer_id: r
        for r in spark.read.format("delta").load(silver).collect()
    }
    assert set(rows) == {"c1", "c2"}  # dedup + null-key filter applied
    assert rows["c1"].customer_city == "RIO"
    assert rows["c2"].customer_state == "SP"
    assert rows["c1"].customer_zip_code_prefix == "11111"  # cast string
    assert rows["c1"].source_file.endswith("batch1.csv")

    # second landing: an update for c1 and a new customer c3
    time.sleep(0.05)  # ingestion_ts strictly advances
    _land(src, "batch2.csv", [
        ("c1", "u1", 11111, "niteroi", "rj"),
        ("c3", "u3", 33333, "belo horizonte", "mg"),
    ])
    _bronze_drain(spark, src, ck_b, bronze)
    _silver_drain(spark, bronze, ck_s, silver)

    rows = {
        r.customer_id: r
        for r in spark.read.format("delta").load(silver).collect()
    }
    assert set(rows) == {"c1", "c2", "c3"}
    assert rows["c1"].customer_city == "NITEROI"  # fresher update won
    assert rows["c3"].customer_city == "BELO HORIZONTE"
    assert rows["c1"].source_file.endswith("batch2.csv")
    assert rows["c2"].source_file.endswith("batch1.csv")

    # bronze is file-idempotent: replaying both landed files through
    # the insert-only merge adds nothing
    n_bronze = spark.read.format("delta").load(bronze).count()
    assert n_bronze == 6  # 4 + 2 raw rows
    _bronze_drain(spark, src, ck_b, bronze)  # checkpoint: nothing new
    assert spark.read.format("delta").load(bronze).count() == 6

    # and a full checkpoint-replayed silver drain changes nothing
    _silver_drain(spark, bronze, ck_s, silver)
    again = {
        r.customer_id: r.customer_city
        for r in spark.read.format("delta").load(silver).collect()
    }
    assert again == {
        "c1": "NITEROI", "c2": "SAO PAULO", "c3": "BELO HORIZONTE",
    }


def test_gold_dimensions_and_metrics_revenue_verbatim(spark, tmp_path):
    """CAPSTONE gold tier (VERDICT r7 next #6): the reference's
    03_gold_dimensions.py:64-81 (dim_customers first-write + fluent
    MERGE with explicit whenMatchedUpdate set) and
    07_gold_metrics_revenue.py:26-78 (revenue base joins + groupBy agg
    + full-refresh overwrite) run VERBATIM via the fluent facade +
    format('delta') over the engine pipeline's exported silver/gold
    tables — and the notebook-built metrics_revenue equals the engine
    pipeline's own mart row-for-row."""
    from datetime import datetime

    from real_time_e_commerce_analytics_lakehouse_spark.pipelines.olist import (
        OlistPipeline,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        export_delta_log,
    )
    from tools.make_olist_fixtures import make_fixtures

    landing, lake = str(tmp_path / "landing"), str(tmp_path / "lake")
    make_fixtures(landing, seed=42)
    p = OlistPipeline(
        spark, lake, landing, clock=datetime(2024, 6, 1, 12, 0, 0)
    )
    p.run()
    for layer, name in [
        ("silver", "customers"),
        ("gold", "fact_orders"),
        ("gold", "fact_payments"),
    ]:
        export_delta_log(p.table(layer, name))

    # ---- 03_gold_dimensions.py:24-81, verbatim shapes --------------
    silver_customers_path = p.table("silver", "customers").path
    gold_customers_path = str(tmp_path / "gold_dim_customers")

    customers_silver = (
        spark.read.format("delta").load(silver_customers_path)
    )
    w = Window.partitionBy("customer_id").orderBy(
        F.col("ingestion_ts").desc()
    )
    customers_dedup = (
        customers_silver.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    dim_customers_df = customers_dedup.select(
        F.col("customer_id"),
        F.col("customer_unique_id"),
        F.col("customer_zip_code_prefix").cast("int"),
        F.lower(F.trim(F.col("customer_city"))).alias("customer_city"),
        F.upper(F.trim(F.col("customer_state"))).alias("customer_state"),
        F.current_timestamp().alias("gold_created_ts"),
    )
    if not DeltaTable.isDeltaTable(spark, gold_customers_path):
        (
            dim_customers_df.write.format("delta")
            .mode("overwrite")
            .save(gold_customers_path)
        )
    gold_table = DeltaTable.forPath(spark, gold_customers_path)
    (
        gold_table.alias("target")
        .merge(
            dim_customers_df.alias("source"),
            "target.customer_id = source.customer_id",
        )
        .whenMatchedUpdate(
            set={
                "customer_unique_id": "source.customer_unique_id",
                "customer_zip_code_prefix": "source.customer_zip_code_prefix",
                "customer_city": "source.customer_city",
                "customer_state": "source.customer_state",
                "gold_created_ts": "source.gold_created_ts",
            }
        )
        .whenNotMatchedInsertAll()
        .execute()
    )
    dim_rows = spark.read.format("delta").load(gold_customers_path)
    eng_dim = p.table("gold", "dim_customers").read()
    assert sorted(
        (r.customer_id, r.customer_city, r.customer_state)
        for r in dim_rows.collect()
    ) == sorted(
        (r.customer_id, r.customer_city, r.customer_state)
        for r in eng_dim.collect()
    )

    # ---- 07_gold_metrics_revenue.py:26-78, verbatim shapes ---------
    fact_orders = spark.read.format("delta").load(
        p.table("gold", "fact_orders").path
    )
    fact_payments = spark.read.format("delta").load(
        p.table("gold", "fact_payments").path
    )
    dim_customers = spark.read.format("delta").load(gold_customers_path)
    metrics_revenue_path = str(tmp_path / "metrics_revenue")

    revenue_base = (
        fact_orders.alias("o")
        .join(fact_payments.alias("p"), on="order_id", how="inner")
        .join(dim_customers.alias("c"), on="customer_id", how="left")
        .select(
            F.to_date(F.col("o.order_purchase_timestamp")).alias(
                "order_date"
            ),
            F.col("c.customer_state"),
            F.col("o.order_status"),
            F.col("o.order_id"),
            F.col("p.total_payment_value"),
        )
    )
    metrics_revenue = revenue_base.groupBy(
        "order_date", "customer_state", "order_status"
    ).agg(
        F.sum("total_payment_value").alias("total_revenue"),
        F.countDistinct("order_id").alias("total_orders"),
    )
    (
        metrics_revenue.write.format("delta")
        .mode("overwrite")
        .save(metrics_revenue_path)
    )

    got = {
        (
            r.order_date.isoformat() if r.order_date else None,
            r.customer_state,
            r.order_status,
        ): (round(r.total_revenue, 2), r.total_orders)
        for r in spark.read.format("delta")
        .load(metrics_revenue_path)
        .collect()
    }
    want = {
        (
            r.order_date.isoformat() if r.order_date else None,
            r.customer_state,
            r.order_status,
        ): (round(r.total_revenue, 2), r.order_count)
        for r in p.table("metrics", "metrics_revenue").read().collect()
    }
    assert set(got) == set(want)
    for k, (rev, n) in got.items():
        wrev, wn = want[k]
        assert n == wn, k
        assert abs(rev - wrev) < 0.011, k
