"""Events streaming pipeline: streaming dedup state, date partitioning,
partition-scoped rollup refresh."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.pipelines.events_stream import (
    EventsStreamPipeline,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).select(
        "event_id", F.to_timestamp("ts").alias("ts"), "user_id", "event_type", "value"
    )


def test_streaming_dedup_and_partitioned_ingest(spark, tmp_path):
    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    rows1 = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),
        (1, "2024-01-01 10:00:00", 1, "click", 1.0),  # in-stream duplicate
        (2, "2024-01-02 11:00:00", 2, "view", 2.0),
    ]
    _mk(spark, rows1).write.mode("append").parquet(src)
    p = EventsStreamPipeline(spark, lake)
    schema = _mk(spark, rows1).schema

    def drain():
        p.ingest(spark.readStream.schema(schema).parquet(src))

    drain()
    got = p.table.read()
    assert got.count() == 2  # duplicate event_id collapsed by streaming dedup
    # date partitioning materialized
    parts = {r.event_date.isoformat() for r in got.select("event_date").collect()}
    assert parts == {"2024-01-01", "2024-01-02"}

    # second file re-delivers event 2 (cross-batch replay) + adds event 3
    _mk(spark, [
        (2, "2024-01-02 11:00:00", 2, "view", 2.0),
        (3, "2024-01-02 12:00:00", 1, "view", 3.0),
    ]).write.mode("append").parquet(src)
    drain()
    assert p.table.read().count() == 3  # keyed merge blocked the replay

    # partition-scoped rollup for one date only
    p.daily_rollup(for_dates=["2024-01-02"])
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    mart = LakeTable(
        spark, os.path.join(lake, "metrics", "events_daily"), partition_by=["event_date"]
    ).read()
    assert {r.event_date.isoformat() for r in mart.collect()} == {"2024-01-02"}
    row = {r.event_type: r.n_events for r in mart.collect()}
    assert row == {"view": 2}

    # refresh the other date; both present, idempotent on re-run
    p.daily_rollup(for_dates=["2024-01-01"])
    p.daily_rollup(for_dates=["2024-01-01"])
    mart2 = LakeTable(
        spark, os.path.join(lake, "metrics", "events_daily"), partition_by=["event_date"]
    ).read()
    assert mart2.count() == 2


def test_maintain_compacts_and_vacuums(spark, tmp_path):
    """Stream-ingested fact tables stay bounded: compact + vacuum after
    ingest, content unchanged."""
    import os

    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    lake = str(tmp_path / "lake")
    p = EventsStreamPipeline(spark, lake, watermark="1 hour")
    t = p.table
    for day in ("2024-01-01", "2024-01-02"):
        batch = spark.createDataFrame(
            [(f"{day}-e{i}", day, float(i)) for i in range(5)],
            "event_id string, event_date string, value double",
        )
        t.merge_insert_only(batch, keys="event_id")
    dirs_before = len(os.listdir(os.path.join(t.path, "data")))

    stats = p.maintain(keep_versions=1)
    assert stats["removed_commit_dirs"] >= 1
    assert len(os.listdir(os.path.join(t.path, "data"))) < dirs_before
    assert t.read().count() == 10
