"""Row tracking (Delta PROTOCOL.md "Row Tracking") on foreign Delta
tables: enabling ``delta.enableRowTracking`` backfills a fresh
``baseRowId`` per live file and keeps the ``rowIdHighWaterMark`` in the
``delta.rowTracking`` domainMetadata; every commit site stamps adds;
MoR deletes and RESTORE preserve ids by construction (same physical
file, same positions); OPTIMIZE preserves them by MATERIALIZING each
row's id/commit-version into the config-named physical columns; reads
surface ``_row_id`` / ``_row_commit_version`` as
coalesce(materialized, baseRowId + position).

Reference scope note: the reference notebooks
(db_notebooks/01..09) never use row tracking — this is beyond-reference
Delta-protocol parity for the engine's foreign-table interop layer."""

from __future__ import annotations

import json
import os

import pytest

from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    DeltaSnapshot,
    alter_delta_properties,
    expire_delta_commits,
    optimize_delta,
    read_delta_log,
    restore_delta,
    row_id_high_water_mark,
    upgrade_delta_protocol,
    write_delta_checkpoint,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_table import (
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _make(spark, path, n=12, files=3):
    (
        spark.range(0, n)
        .selectExpr("id", "id * 2 as v")
        .coalesce(files)
        .write.format("delta")
        .mode("append")
        .save(path)
    )
    alter_delta_properties(path, {"delta.enableRowTracking": "true"})


def _ids(spark, path):
    return {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta_log(spark, path, with_row_ids=True).collect()
    }


def test_enable_backfills_and_gates_protocol(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p)
    snap = DeltaSnapshot(p)
    wf = snap.protocol["writerFeatures"]
    assert "rowTracking" in wf and "domainMetadata" in wf
    assert int(snap.protocol["minWriterVersion"]) == 7
    # one baseRowId per live file; water mark = rows - 1
    assert len(snap.row_ids) == len(snap.files)
    assert row_id_high_water_mark(snap) == 11
    # ids are a permutation of 0..n-1 (fresh tier, contiguous)
    ids = _ids(spark, p)
    assert sorted(rid for rid, _ in ids.values()) == list(range(12))
    assert all(rcv is not None for _, rcv in ids.values())
    # materialized column names recorded up front
    assert snap.configuration[
        "delta.rowTracking.materializedRowIdColumnName"
    ].startswith("_row-id-col-")


def test_append_advances_water_mark(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=10, files=2)
    (
        spark.range(10, 16)
        .selectExpr("id", "id * 2 as v")
        .coalesce(2)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    snap = DeltaSnapshot(p)
    assert row_id_high_water_mark(snap) == 15
    ids = _ids(spark, p)
    assert sorted(rid for rid, _ in ids.values()) == list(range(16))
    # the appended files carry the append's commit version
    new_rcv = {rcv for i, (_, rcv) in ids.items() if i >= 10}
    assert new_rcv == {snap.version}


def test_mor_delete_preserves_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p)
    before = _ids(spark, p)
    delete_delta(spark, p, "id % 3 = 0", mode="mor")
    after = _ids(spark, p)
    assert set(after) == {i for i in range(12) if i % 3 != 0}
    assert all(before[k] == v for k, v in after.items())
    # the DV re-add kept the file's original baseRowId
    snap = DeltaSnapshot(p)
    assert len(snap.row_ids) == len(snap.files)


def test_cow_update_preserves_ids(spark, tmp_path):
    """Copy-on-write UPDATE materializes row ids into the rewritten
    files (delta-spark's preserved tier): every row — updated or merely
    co-located in a rewritten file — keeps its id; the updated row's
    commit version moves to the update commit."""
    p = str(tmp_path / "t")
    _make(spark, p)
    before = _ids(spark, p)
    update_delta(spark, p, "id = 1", {"v": "999"})
    after = _ids(spark, p)
    assert {k: v[0] for k, v in after.items()} == {
        k: v[0] for k, v in before.items()
    }
    v_now = DeltaSnapshot(p).version
    assert after[1][1] == v_now  # updated row: this commit's version
    snap = DeltaSnapshot(p)
    assert row_id_high_water_mark(snap) >= max(
        rid for rid, _ in after.values()
    )


def test_cow_delete_preserves_survivor_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p)
    before = _ids(spark, p)
    delete_delta(spark, p, "id % 4 = 0", mode="cow")
    after = _ids(spark, p)
    assert set(after) == {i for i in range(12) if i % 4 != 0}
    assert all(before[k] == v for k, v in after.items())


def test_merge_preserves_kept_and_set_updated_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=8, files=2)
    before = _ids(spark, p)
    merge_delta(
        spark,
        p,
        spark.createDataFrame([(3,)], "id long"),
        ["id"],
        set_exprs={"v": "t.v + 1000"},
        insert_when_not_matched=False,
    )
    after = _ids(spark, p)
    assert set(after) == set(range(8))
    # kept rows AND the set-exprs-updated row keep their ids
    assert {k: v[0] for k, v in after.items()} == {
        k: v[0] for k, v in before.items()
    }
    r = read_delta_log(spark, p).where("id = 3").first()
    assert r["v"] == 3 * 2 + 1000


def test_merge_stamps_inserted_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=6, files=1)
    src = spark.createDataFrame(
        [(4, 400), (7, 700)], "id long, v long"
    )
    merge_delta(spark, p, src, ["id"])
    ids = _ids(spark, p)
    assert set(ids) == {0, 1, 2, 3, 4, 5, 7}
    assert len({rid for rid, _ in ids.values()}) == 7
    snap = DeltaSnapshot(p)
    assert len(snap.row_ids) == len(snap.files)


def test_optimize_materializes_and_preserves(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=12, files=4)
    delete_delta(spark, p, "id = 2", mode="mor")
    before = _ids(spark, p)
    res = optimize_delta(spark, p, target_file_bytes=1 << 30)
    assert res["written"] >= 1
    assert _ids(spark, p) == before
    # a SECOND optimize must also preserve (reads back the
    # materialized column it wrote)
    (
        spark.range(20, 24)
        .selectExpr("id", "id * 2 as v")
        .coalesce(2)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    mid = _ids(spark, p)
    optimize_delta(spark, p, target_file_bytes=1 << 30)
    assert _ids(spark, p) == mid
    # the materialized columns never leak into the logical schema
    df = read_delta_log(spark, p)
    assert df.columns == ["id", "v"]


def test_restore_preserves_ids(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=8, files=2)
    before = _ids(spark, p)
    v_before = DeltaSnapshot(p).version
    delete_delta(spark, p, "id < 4", mode="cow")
    restore_delta(p, v_before)
    assert _ids(spark, p) == before


def test_checkpoint_bootstrap_keeps_row_tracking(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=9, files=3)
    delete_delta(spark, p, "id = 4", mode="mor")
    before = _ids(spark, p)
    snap0 = DeltaSnapshot(p)
    write_delta_checkpoint(p)
    expire_delta_commits(p, honor_retention=False)
    snap = DeltaSnapshot(p)
    assert snap.row_ids == snap0.row_ids
    assert "delta.rowTracking" in snap.domain_metadata
    assert row_id_high_water_mark(snap) == row_id_high_water_mark(snap0)
    assert _ids(spark, p) == before


def test_v2_checkpoint_carries_domain_metadata(spark, tmp_path):
    p = str(tmp_path / "t")
    _make(spark, p, n=6, files=2)
    upgrade_delta_protocol(p, 3, 7, add_reader_features=["v2Checkpoint"])
    before = _ids(spark, p)
    write_delta_checkpoint(p, format="v2")
    expire_delta_commits(p, honor_retention=False)
    snap = DeltaSnapshot(p)
    assert "delta.rowTracking" in snap.domain_metadata
    assert len(snap.row_ids) == len(snap.files)
    assert _ids(spark, p) == before


def test_format_reader_with_row_ids_option(spark, tmp_path):
    p = str(tmp_path / "t")
    (
        spark.range(0, 12)
        .selectExpr("id", "cast(id % 3 as string) as g")
        .coalesce(3)
        .write.format("delta")
        .option("partition_by", "g")
        .mode("append")
        .save(p)
    )
    alter_delta_properties(p, {"delta.enableRowTracking": "true"})
    delete_delta(spark, p, "id in (2, 5)", mode="mor")
    expected = _ids(spark, p)
    got = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in spark.read.format("delta")
        .option("withRowIds", "true")
        .load(p)
        .collect()
    }
    assert got == expected
    # plain reads never see the columns
    assert "_row_id" not in spark.read.format("delta").load(p).columns
    # partition pruning still works alongside row ids
    one = (
        spark.read.format("delta")
        .option("withRowIds", "true")
        .load(p)
        .filter("g = '1'")
    )
    assert {r["id"] for r in one.collect()} == {1, 4, 7, 10}


def test_foreign_domain_metadata_round_trips(spark, tmp_path):
    """Arbitrary (non-row-tracking) domains replay and survive
    checkpoints; removed=true tombstones delete."""
    p = str(tmp_path / "t")
    _make(spark, p, n=4, files=1)
    log = os.path.join(p, "_delta_log")
    v = DeltaSnapshot(p).version + 1
    with open(os.path.join(log, f"{v:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "domainMetadata": {
                        "domain": "custom.app",
                        "configuration": json.dumps({"k": 1}),
                        "removed": False,
                    }
                }
            )
            + "\n"
        )
    snap = DeltaSnapshot(p)
    assert "custom.app" in snap.domain_metadata
    write_delta_checkpoint(p)
    expire_delta_commits(p, honor_retention=False)
    assert "custom.app" in DeltaSnapshot(p).domain_metadata
    with open(os.path.join(log, f"{v + 1:020d}.json"), "w") as f:
        f.write(
            json.dumps(
                {
                    "domainMetadata": {
                        "domain": "custom.app",
                        "configuration": None,
                        "removed": True,
                    }
                }
            )
            + "\n"
        )
    assert "custom.app" not in DeltaSnapshot(p).domain_metadata


def test_stream_read_with_row_ids(spark, tmp_path):
    """readStream.format('delta').option('withRowIds'): streamed rows
    carry the same _row_id/_row_commit_version the batch read serves.
    Rows from commits BEFORE enablement stream with NULL ids (their
    adds carry no baseRowId; the backfill is dataChange=false and is
    correctly invisible to the append stream)."""
    import time

    p = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (
        spark.range(0, 8)
        .selectExpr("id", "id as v")
        .coalesce(1)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    alter_delta_properties(p, {"delta.enableRowTracking": "true"})
    (
        spark.range(8, 12)
        .selectExpr("id", "id as v")
        .coalesce(1)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    q = (
        spark.readStream.format("delta")
        .option("withRowIds", "true")
        .option("startingVersion", "0")
        .load(p)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)
    got = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["id"]: (r["_row_id"], r["_row_commit_version"])
        for r in read_delta_log(spark, p, with_row_ids=True).collect()
    }
    assert {k for k, v in got.items() if v[0] is not None} == {8, 9, 10, 11}
    assert all(got[k] == want[k] for k in (8, 9, 10, 11))


def test_export_delta_log_stamps_after_enable(spark, tmp_path):
    """Enabling row tracking on an EXPORTED log keeps working through
    later exports: unchanged files keep their ids (same path -> the
    stamp copies the prior base), new files get fresh ids, and the
    water mark advances."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        export_delta_log,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    t = LakeTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame(
            [(i, "a") for i in range(6)], "id long, v string"
        )
    )
    export_delta_log(t)
    alter_delta_properties(t.path, {"delta.enableRowTracking": "true"})
    before = {
        r["id"]: r["_row_id"]
        for r in read_delta_log(spark, t.path, with_row_ids=True).collect()
    }
    t.append(
        spark.createDataFrame([(10, "z"), (11, "z")], "id long, v string")
    )
    export_delta_log(t)
    snap = DeltaSnapshot(t.path)
    assert len(snap.row_ids) == len(snap.files)
    after = {
        r["id"]: r["_row_id"]
        for r in read_delta_log(spark, t.path, with_row_ids=True).collect()
    }
    assert set(after) == set(range(6)) | {10, 11}
    assert all(after[k] == v for k, v in before.items())
    assert len(set(after.values())) == 8


def test_table_born_with_row_tracking(spark, tmp_path):
    """A table CREATEd with delta.enableRowTracking carries the writer-7
    feature gate, the materialized column names, and the rowTracking
    domain from version 0 (the property never outruns the protocol);
    the first insert stamps real ids, composing with identity."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        insert_delta,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
        IdentityGenerator,
    )

    p = str(tmp_path / "t")
    (
        DeltaTable.create(spark)
        .location(p)
        .addColumn("sk", "bigint", generatedAlwaysAs=IdentityGenerator(1, 1))
        .addColumn("k", "string")
        .property("delta.enableRowTracking", "true")
        .execute()
    )
    snap = DeltaSnapshot(p)
    wf = set(snap.protocol["writerFeatures"])
    assert {"rowTracking", "domainMetadata", "identityColumns"} <= wf
    assert "delta.rowTracking" in snap.domain_metadata
    assert snap.configuration.get(
        "delta.rowTracking.materializedRowIdColumnName"
    )
    insert_delta(
        spark, p, spark.createDataFrame([("a",), ("b",)], "k string")
    )
    rows = {
        r["k"]: (r["sk"], r["_row_id"])
        for r in read_delta_log(spark, p, with_row_ids=True).collect()
    }
    assert rows == {"a": (1, 0), "b": (2, 1)}
    assert row_id_high_water_mark(DeltaSnapshot(p)) == 1
