"""Round-5 review batch: deletion-vector lifecycle on rewrites, restore
snapshot fidelity, clone ledgers, hidden-partition merges, pyds
committed_at + non-append stream detection. Each test pins one finding
from the r5 self-review (see the corresponding commit)."""

from __future__ import annotations

import os
import pickle

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.sources import pyds
from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register(spark)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def test_rewrite_after_mor_delete_clears_stale_tombstones(spark, tmp_path):
    """merge_upsert on a table with active DVs materializes the
    deletions; carrying the tombstones made count_rows undercount and
    blocked read_stream forever (r5 review)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_mk(spark, [(i, "v") for i in range(100)]))
    t.delete(F.col("id") < 10, mode="mor")
    assert t.count_rows() == 90
    t.merge_upsert(_mk(spark, [(50, "updated")]), keys="id")
    assert t.count_rows() == 90  # not 80
    assert t.read().count() == 90
    # unpartitioned merge rewrote everything: no tombstones remain, so
    # the append-only stream surface is usable again
    assert t._read_dv(t.latest_version()) == []
    t.read_stream()  # must not raise "active tombstones"


def test_cow_delete_keeps_tombstones_of_untouched_units(spark, tmp_path):
    """Partition-scoped rewrites drop only the tombstones whose units
    they materialized; DVs into untouched partitions stay active."""
    t = LakeTable(spark, str(tmp_path / "t"), partition_by=["p"])
    t.overwrite(
        spark.createDataFrame(
            [(i, "x" if i % 2 else "y") for i in range(40)], "id long, p string"
        )
    )
    t.delete((F.col("id") < 4), mode="mor")  # tombstones in BOTH partitions
    assert t.count_rows() == 36
    # merge touching only partition x
    t.merge_upsert(
        spark.createDataFrame([(5, "x")], "id long, p string"), keys="id"
    )
    # x's tombstones materialized by the rewrite; y's still active
    assert t.count_rows() == 36
    assert sorted(r.id for r in t.read().where("p = 'y'").collect()) == sorted(
        i for i in range(40) if i % 2 == 0 and i >= 4
    )


def test_restore_restores_the_versions_own_deletion_vectors(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_mk(spark, [(i, "v") for i in range(10)]))  # v1
    v2 = t.delete(F.col("id") < 3, mode="mor")["version"]  # v2: 7 live
    t.compact()  # v3: materialized, dv=[]

    t.restore(1)  # full 10 rows, no tombstones
    assert t.count_rows() == 10
    assert sorted(r.id for r in t.read().collect()) == list(range(10))

    t.restore(v2)  # v2's snapshot INCLUDES its tombstones
    assert t.count_rows() == 7
    assert sorted(r.id for r in t.read().collect()) == list(range(3, 10))


def test_clone_carries_identity_and_txn_ledgers(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"), identity="id")
    src.append(spark.createDataFrame([("a",), ("b",)], "v string"))
    src.append_once(
        spark.createDataFrame([("c",)], "v string"), txn_app="app", txn_version=7
    )
    high = src._identity_high(src.latest_version())
    assert high == 3

    dest = src.clone(str(tmp_path / "dest"))
    d = LakeTable(spark, dest.path, identity="id")
    assert d._identity_high(d.latest_version()) == high
    assert d.last_txn_version("app") == 7
    d.append(spark.createDataFrame([("d",)], "v string"))
    ids = sorted(r.id for r in d.read().collect())
    assert ids == [1, 2, 3, 4]  # no duplicate identity values
    # replay of the already-applied txn inserts nothing
    assert (
        d.append_once(
            spark.createDataFrame([("dup",)], "v string"),
            txn_app="app",
            txn_version=7,
        )
        is None
    )


def test_merge_into_generated_hidden_partition_table(spark, tmp_path):
    """The partition_transform recipe: writers never supply the
    generated partition column — merges must compute it, not crash on
    an unresolved column (r5 review)."""
    t = LakeTable(
        spark,
        str(tmp_path / "t"),
        partition_by=["__p"],
        generated={"__p": "CAST(ts AS DATE)"},
    )
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 11:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.overwrite(df)
    batch = spark.createDataFrame(
        [(2, "2024-01-02 12:00:00"), (3, "2024-01-03 09:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.merge_upsert(batch, keys="id")  # no __p supplied
    got = {r["id"]: str(r["__p"]) for r in t.read().collect()}
    assert got == {1: "2024-01-01", 2: "2024-01-02", 3: "2024-01-03"}
    t.merge_insert_only(batch, keys="id")  # replay inserts nothing
    assert t.count_rows() == 3


def test_pyds_commits_carry_committed_at_for_time_travel(spark, tmp_path):
    """pyds-written manifests must carry committed_at: TIMESTAMP AS OF
    and vacuum(retain_hours) index it on every manifest (r5 review:
    KeyError on mixed-writer tables)."""
    from datetime import datetime, timedelta, timezone

    p = str(tmp_path / "t")
    _mk(spark, [(1, "a")]).write.format("laketable").mode("overwrite").save(p)
    t = LakeTable(spark, p)
    t.append(_mk(spark, [(2, "b")]))  # engine commit on top
    future = datetime.now(timezone.utc) + timedelta(hours=1)
    assert t.version_at_timestamp(future) == t.latest_version()
    t.vacuum(retain_hours=24)  # must not KeyError
    assert t.read().count() == 2

    # streaming sink commits too
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        f.write(_json.dumps({"id": 3, "v": "c"}) + "\n")
    q = (
        spark.readStream.schema("id long, v string")
        .json(str(src))
        .writeStream.format("laketable")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start(p)
    )
    q.awaitTermination()
    assert t.version_at_timestamp(future) == t.latest_version()


def test_stream_reader_raises_on_rewrite_unless_ignore_changes(
    spark, tmp_path
):
    """A non-append commit between stream offsets re-delivers the whole
    rewrite; default is to fail like Delta's streaming source, with
    ignore_changes opting into at-least-once (r5 review)."""
    import time

    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(_mk(spark, [(1, "a"), (2, "b")]))
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain(extra_opts=None):
        r = spark.readStream.format("laketable")
        for k, v in (extra_opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load(t.path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        time.sleep(0.2)

    drain()
    assert spark.read.parquet(out).count() == 2

    t.merge_upsert(_mk(spark, [(1, "rewritten")]), keys="id")  # non-append
    with pytest.raises(Exception, match="rewritten|ignore_changes"):
        drain()
    # opting in accepts at-least-once redelivery of the rewritten units
    drain({"ignore_changes": "true"})
    assert spark.read.parquet(out).count() >= 4


def test_batch_reader_pickles_without_the_unit_list(spark, tmp_path):
    """Scan tasks need only decode metadata; pickling the parsed
    manifest (all units + per-file stats) into every task is the 100 TB
    anti-pattern (r5 review)."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.pyds import (
        LakeTableReader,
    )

    t = LakeTable(spark, str(tmp_path / "t"), stats_cols=["id"])
    t.overwrite(_mk(spark, [(i, "v") for i in range(100)]))
    schema = spark.read.format("laketable").load(t.path).schema
    r = LakeTableReader(t.path, None, schema)
    parts = r.partitions()
    assert parts
    clone = pickle.loads(pickle.dumps(r))
    assert not hasattr(clone.snap, "units")  # manifest stripped
    # and the stripped reader still decodes a slice correctly
    batches = list(clone.read(parts[0]))
    assert sum(b.num_rows for b in batches) > 0


def test_stream_sink_validation_failure_drops_staged_files(spark, tmp_path):
    """A partition-layout mismatch must not leak a staged data dir per
    failed trigger (r5 review)."""
    import pyarrow as pa

    from real_time_e_commerce_analytics_lakehouse_spark.sources.pyds import (
        LakeTableStreamWriter,
    )

    t = LakeTable(spark, str(tmp_path / "t"), partition_by=["p"])
    t.overwrite(
        spark.createDataFrame([(1, "x")], "id long, p string")
    )
    schema = spark.createDataFrame([], "id long, p string").schema
    w = LakeTableStreamWriter(t.path, schema, {})  # missing partition_by
    batch = pa.record_batch(
        {"id": pa.array([9], type=pa.int64()), "p": pa.array(["z"])}
    )
    m = w.write(iter([batch]))
    staged = os.path.join(t.path, m.filename)
    assert os.path.isdir(staged)
    with pytest.raises(ValueError, match="partition_by"):
        w.commit([m], batchId=0)
    assert not os.path.isdir(staged)
