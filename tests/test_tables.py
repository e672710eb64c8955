"""LakeTable transaction-semantics tests: the reference's Delta contract
(SURVEY §2.1 S5-S13) plus replay/out-of-order properties (SURVEY §5.4)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


def _df(spark, rows, schema="id long, v string, ver long"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def tmp_table(tmp_path):
    return str(tmp_path / "tbl")


def test_overwrite_read_roundtrip(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    assert not t.exists()
    t.overwrite(_df(spark, [(1, "a", 1), (2, "b", 1)]))
    assert t.exists()
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_append_adds_without_rewrite(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    v1 = t.overwrite(_df(spark, [(1, "a", 1)]))
    v2 = t.append(_df(spark, [(2, "b", 1)]))
    assert v2 == v1 + 1
    assert t.read().count() == 2
    # time travel: v1 still readable, one row
    assert t.read(version=v1).count() == 1


def test_merge_insert_only_is_replay_idempotent(spark, tmp_table):
    """S9 file-level idempotency: replaying the same batch is a no-op."""
    t = LakeTable(spark, tmp_table)
    batch = _df(spark, [(1, "a", 1), (2, "b", 1)])
    t.merge_insert_only(batch, keys="id")
    before = t.latest_version()
    t.merge_insert_only(batch, keys="id")  # replay
    assert t.latest_version() == before  # no new commit at all
    assert t.read().count() == 2
    t.merge_insert_only(_df(spark, [(2, "b", 1), (3, "c", 1)]), keys="id")
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3]


def test_merge_upsert_last_writer_wins_with_guard(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    t.overwrite(_df(spark, [(1, "old", 10), (2, "keep", 10)]))
    # newer version for id=1, STALE version for id=2, new id=3
    src = _df(spark, [(1, "new", 11), (2, "stale", 5), (3, "ins", 1)])
    t.merge_upsert(src, keys="id", guard_col="ver")
    got = {r.id: (r.v, r.ver) for r in t.read().collect()}
    assert got == {1: ("new", 11), 2: ("keep", 10), 3: ("ins", 1)}


def test_merge_upsert_out_of_order_replay(spark, tmp_table):
    """Out-of-order delivery: an older update arriving late must not
    clobber a newer row (reference guard 02_bronze_to_silver.py:74)."""
    t = LakeTable(spark, tmp_table)
    t.overwrite(_df(spark, [(1, "v2", 2)]))
    t.merge_upsert(_df(spark, [(1, "v1", 1)]), keys="id", guard_col="ver")
    assert t.read().collect()[0].v == "v2"
    # replaying the same winning batch twice changes nothing (idempotent)
    t.merge_upsert(_df(spark, [(1, "v3", 3)]), keys="id", guard_col="ver")
    t.merge_upsert(_df(spark, [(1, "v3", 3)]), keys="id", guard_col="ver")
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0].v == "v3"


def test_merge_upsert_rejects_duplicate_source_keys(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    t.overwrite(_df(spark, [(1, "a", 1)]))
    dup = _df(spark, [(1, "x", 2), (1, "y", 3)])
    with pytest.raises(ValueError, match="multiple rows per key"):
        t.merge_upsert(dup, keys="id", guard_col="ver")


def test_merge_upsert_composite_keys(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    t.overwrite(_df(spark, [(1, "a", 1), (1, "b", 1)], "k1 long, k2 string, ver long"))
    t.merge_upsert(
        _df(spark, [(1, "a", 2)], "k1 long, k2 string, ver long"),
        keys=["k1", "k2"],
        guard_col="ver",
    )
    got = {(r.k1, r.k2): r.ver for r in t.read().collect()}
    assert got == {(1, "a"): 2, (1, "b"): 1}


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_table):
    t = LakeTable(spark, tmp_table, partition_by=["dt"])
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01", 1), (2, "b", "2024-01-02", 1), (3, "c", "2024-01-03", 1)],
        "id long, v string, dt string, ver long",
    )
    t.overwrite(base)
    units_before = {u.path: u for u in t._read_manifest(t.latest_version())}

    src = spark.createDataFrame(
        [(2, "B", "2024-01-02", 2)], "id long, v string, dt string, ver long"
    )
    t.merge_upsert(src, keys="id", guard_col="ver")
    units_after = {u.path: u for u in t._read_manifest(t.latest_version())}

    # untouched partitions keep their exact data units (no rewrite)
    for path, u in units_after.items():
        if u.partition.get("dt") in ("2024-01-01", "2024-01-03"):
            assert path in units_before, "untouched partition was rewritten"
    got = {r.id: r.v for r in t.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # partition column type survives the dir-name roundtrip
    assert dict(t.read().dtypes)["dt"] == "string"


def test_partition_column_type_preserved(spark, tmp_table):
    t = LakeTable(spark, tmp_table, partition_by=["d"])
    df = spark.createDataFrame([(1, "2024-01-01")], "id long, d string").select(
        "id", F.to_date("d").alias("d")
    )
    t.overwrite(df)
    assert dict(t.read().dtypes)["d"] == "date"


def test_compact_preserves_content(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    t.overwrite(_df(spark, [(1, "a", 1)]))
    for i in range(2, 6):
        t.append(_df(spark, [(i, "x", 1)]))
    n_units = len(t._read_manifest(t.latest_version()))
    assert n_units >= 5
    t.compact()
    assert len(t._read_manifest(t.latest_version())) < n_units
    assert t.read().count() == 5


def test_read_changes_is_exact_cdc_for_appends(spark, tmp_table):
    t = LakeTable(spark, tmp_table)
    v1 = t.overwrite(_df(spark, [(1, "a", 1)]))
    v2 = t.append(_df(spark, [(2, "b", 1)]))
    t.append(_df(spark, [(3, "c", 1)]))
    # changes since v1 = rows of v2+v3 only
    changes = t.read_changes(v1)
    assert sorted(r.id for r in changes.collect()) == [2, 3]
    # fully caught up -> None
    assert t.read_changes(t.latest_version()) is None
    # from scratch -> full snapshot
    assert t.read_changes(None).count() == 3


def test_concurrent_commit_detected(spark, tmp_table):
    """Two writers racing to the same version: the second atomic rename
    must fail loudly, not corrupt the log."""
    import os

    from real_time_e_commerce_analytics_lakehouse_spark.tables import (
        ConcurrentWriteError,
    )

    t1 = LakeTable(spark, tmp_table)
    t1.overwrite(_df(spark, [(1, "a", 1)]))
    # freeze the loser's view of the log at version 1, then let a racer
    # commit version 2 — the loser targets the same version number
    t1.latest_version = lambda: 1  # type: ignore[method-assign]
    racer = LakeTable(spark, tmp_table)
    racer._commit([], op="append")  # wins version 2
    racer_doc = open(racer._manifest_file(2)).read()
    import pytest as _pytest

    with _pytest.raises(ConcurrentWriteError):
        t1._commit([], op="append")
    # winner's manifest intact, loser clobbered nothing
    assert open(racer._manifest_file(2)).read() == racer_doc
    assert racer.latest_version() == 2
