"""Row-level DML on foreign Delta tables (sources/delta_dml): MERGE /
DELETE / UPDATE committed straight to a plain `_delta_log` — the
reference's central silver operation (db_notebooks/02_bronze_to_silver
.py: DeltaTable.merge whenMatchedUpdateAll/whenNotMatchedInsertAll,
insert-only file idempotency, the event-time late-data guard) without
delta-spark and without converting the table. Every statement is
re-read through BOTH the format reader and the independent
read_delta_log replay, and its change feed is pinned — including real
cdc update pre/post images when the table enables CDF."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
    delete_delta,
    merge_delta,
    update_delta,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    DeltaSnapshot,
    delta_changes,
    read_delta_log,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_table import (
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _make_cdf_table(spark, path):
    spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, "c", 8)], "id long, v string, p long"
    ).write.format("delta").option("partition_by", "p").mode(
        "overwrite"
    ).save(path)
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log) if x.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.enableChangeDataFeed": "true"
            }
    with open(log, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")


def test_merge_upsert_with_cdc_images(spark, tmp_path):
    """whenMatchedUpdateAll + whenNotMatchedInsertAll: only files with
    matched keys rewrite; CDF carries the exact insert + update
    pre/post image rows; the format reader and the independent log
    replay agree."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)
    src = spark.createDataFrame(
        [(2, "B", 7), (9, "z", 8)], "id long, v string, p long"
    )
    res = merge_delta(spark, p, src, ["id"])
    assert res == {
        "version": 1,
        "files_rewritten": 1,
        "rows_inserted": 1,
        "rows_updated": 1,
        "rows_deleted": 0,
    }
    want = [(1, "a", 7), (2, "B", 7), (3, "c", 8), (9, "z", 8)]
    assert _rows(spark.read.format("delta").load(p)) == want
    assert _rows(read_delta_log(spark, p).select("id", "v", "p")) == want
    ch = sorted(
        (r._change_type, r.id, r.v)
        for r in delta_changes(spark, p, 1, 1).collect()
    )
    assert ch == [
        ("insert", 9, "z"),
        ("update_postimage", 2, "B"),
        ("update_preimage", 2, "b"),
    ]
    # duplicate-key sources refuse loudly
    with pytest.raises(ValueError, match="not unique"):
        merge_delta(
            spark,
            p,
            spark.createDataFrame(
                [(5, "x", 7), (5, "y", 7)], "id long, v string, p long"
            ),
            ["id"],
        )


def test_merge_late_data_guard_zero_churn(spark, tmp_path):
    """guard_col: a purely-stale batch rewrites NOTHING (late data must
    not churn files); a mixed batch updates only the fresh key and
    keeps the stale key's target row byte-identical."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)
    v0 = DeltaSnapshot(p).version
    stale = spark.createDataFrame(
        [(1, "stale", 0)], "id long, v string, p long"
    )
    res = merge_delta(spark, p, stale, ["id"], guard_col="p")
    assert res["files_rewritten"] == 0 and res["rows_updated"] == 0
    assert DeltaSnapshot(p).version == v0 + 1  # versioned no-op commit
    assert (1, "a", 7) in _rows(spark.read.format("delta").load(p))

    mixed = spark.createDataFrame(
        [(1, "x", 0), (2, "NEW", 9)], "id long, v string, p long"
    )
    res = merge_delta(spark, p, mixed, ["id"], guard_col="p")
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 0
    got = _rows(spark.read.format("delta").load(p))
    assert (1, "a", 7) in got and (2, "NEW", 9) in got and len(got) == 3


def test_merge_insert_only_idempotent_replay(spark, tmp_path):
    """insert_only: matched keys are untouched (no rewrite at all) —
    replaying a batch inserts only its genuinely-new keys, the
    reference's bronze file-idempotency shape."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)
    batch = spark.createDataFrame(
        [(1, "dup", 7), (50, "n", 7)], "id long, v string, p long"
    )
    res = merge_delta(spark, p, batch, ["id"], insert_only=True)
    assert res["files_rewritten"] == 0 and res["rows_inserted"] == 1
    got = _rows(spark.read.format("delta").load(p))
    assert (1, "a", 7) in got and (50, "n", 7) in got and len(got) == 4
    res2 = merge_delta(spark, p, batch, ["id"], insert_only=True)
    assert res2["rows_inserted"] == 0
    assert len(_rows(spark.read.format("delta").load(p))) == 4


def test_update_and_delete_cow(spark, tmp_path):
    """UPDATE SET + copy-on-write DELETE: affected files only; cdc
    rows pinned for both."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)
    res = update_delta(spark, p, "id = 1", {"v": "upper(v)"})
    assert res["rows_updated"] == 1
    ch = sorted(
        (r._change_type, r.id, r.v)
        for r in delta_changes(
            spark, p, res["version"], res["version"]
        ).collect()
    )
    assert ch == [
        ("update_postimage", 1, "A"),
        ("update_preimage", 1, "a"),
    ]
    res = delete_delta(spark, p, F.col("id") == 3, mode="cow")
    assert res["rows_deleted"] == 1 and res["files"] == 1
    assert _rows(spark.read.format("delta").load(p)) == [
        (1, "A", 7), (2, "b", 7),
    ]
    ch = sorted(
        (r._change_type, r.id)
        for r in delta_changes(
            spark, p, res["version"], res["version"]
        ).collect()
    )
    assert ch == [("delete", 3)]
    # no-match statements are versionless no-ops
    assert delete_delta(spark, p, "id = 999")["version"] is None
    assert update_delta(spark, p, "id = 999", {"v": "'x'"})["version"] is None


def test_delete_mor_writes_deletion_vectors(spark, tmp_path):
    """mode='mor': the file is NOT rewritten — a roaring DV is written
    and the file re-added with its descriptor; a second MoR delete on
    the same file UNIONS the bitmaps; reads through every path skip
    exactly the tombstoned rows; optimize_delta later purges."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        optimize_delta,
    )

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).coalesce(1).write.format("delta").mode("overwrite").save(p)
    files_before = set(DeltaSnapshot(p).files)

    res = delete_delta(spark, p, "id IN (2, 5)", mode="mor")
    assert res["rows_deleted"] == 2 and res["files"] == 1
    snap = DeltaSnapshot(p)
    assert set(snap.files) == files_before  # same physical files
    assert len(snap.dvs) == 1
    assert next(iter(snap.dvs.values()))["cardinality"] == 2
    want = [(i, f"v{i}") for i in range(10) if i not in (2, 5)]
    assert _rows(spark.read.format("delta").load(p)) == want
    assert _rows(read_delta_log(spark, p)) == want

    res2 = delete_delta(spark, p, "id = 7", mode="mor")
    snap2 = DeltaSnapshot(p)
    assert next(iter(snap2.dvs.values()))["cardinality"] == 3  # unioned
    want = [(i, f"v{i}") for i in range(10) if i not in (2, 5, 7)]
    assert _rows(spark.read.format("delta").load(p)) == want
    # change feed: ONLY the newly-deleted row, not the earlier two
    ch = sorted(
        (r._change_type, r.id)
        for r in delta_changes(
            spark, p, res2["version"], res2["version"]
        ).collect()
    )
    assert ch == [("delete", 7)]

    optimize_delta(spark, p)
    assert not DeltaSnapshot(p).dvs
    assert _rows(spark.read.format("delta").load(p)) == want


def test_dml_guards(spark, tmp_path):
    """Protocol-tier refusals: source missing table columns. DML on a
    column-mapped table is SUPPORTED since r8 (identity physicalNames
    here; tests/test_colmap.py covers real col-<uuid> renames + the
    rewritten-file footprint) — the old refusal is now a working
    delete."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)
    with pytest.raises(ValueError, match="lacks table columns"):
        merge_delta(
            spark,
            p,
            spark.createDataFrame([(1,)], "id long"),
            ["id"],
        )
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log) if x.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"][
                "delta.columnMapping.mode"
            ] = "name"
            sch = json.loads(a["metaData"]["schemaString"])
            for i, f_ in enumerate(sch["fields"], start=1):
                f_["metadata"] = {
                    "delta.columnMapping.id": i,
                    "delta.columnMapping.physicalName": f_["name"],
                }
            a["metaData"]["schemaString"] = json.dumps(sch)
        if "protocol" in a:
            a["protocol"].update(
                minReaderVersion=2,
                minWriterVersion=5,
            )
    with open(log, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")
    before = {r.id for r in read_delta_log(spark, p).collect()}
    assert 1 in before
    res = delete_delta(spark, str(p), "id = 1")
    assert res["rows_deleted"] >= 1
    after = {r.id for r in read_delta_log(spark, p).collect()}
    assert after == before - {1}


def test_fluent_delta_table_reference_merge_block(spark, tmp_path):
    """The delta.tables-shaped facade (sources/delta_fluent): the
    reference's silver merge block (02_bronze_to_silver.py:65-87 —
    alias target/source, whenMatchedUpdate with a strict-greater
    ingestion_ts condition and explicit set, whenNotMatchedInsertAll)
    runs with only the import changed. Conditional semantics pinned:
    fresher source row updates, stale source row leaves the target
    row byte-identical, new key inserts."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )

    p = str(tmp_path / "silver")
    spark.createDataFrame(
        [(1, "rio", 100), (2, "sp", 100)],
        "customer_id long, customer_city string, ingestion_ts long",
    ).write.format("delta").mode("overwrite").save(p)
    assert DeltaTable.isDeltaTable(spark, p)
    assert not DeltaTable.isDeltaTable(spark, str(tmp_path))

    src = spark.createDataFrame(
        [(1, "rio-updated", 200), (2, "sp-stale", 50), (3, "bh", 150)],
        "customer_id long, customer_city string, ingestion_ts long",
    )
    silver_table = DeltaTable.forPath(spark, p)
    res = (
        silver_table.alias("target")
        .merge(
            src.alias("source"),
            "target.customer_id = source.customer_id",
        )
        .whenMatchedUpdate(
            condition="source.ingestion_ts > target.ingestion_ts",
            set={
                "customer_city": "source.customer_city",
                "ingestion_ts": "source.ingestion_ts",
            },
        )
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1
    assert _rows(spark.read.format("delta").load(p)) == [
        (1, "rio-updated", 200),
        (2, "sp", 100),  # stale source row: target untouched
        (3, "bh", 150),
    ]

    # whenMatchedUpdateAll with a guard condition
    res2 = (
        DeltaTable.forPath(spark, p)
        .alias("t")
        .merge(
            spark.createDataFrame(
                [(2, "sp-new", 300)],
                "customer_id long, customer_city string, ingestion_ts long",
            ).alias("s"),
            "t.customer_id = s.customer_id",
        )
        .whenMatchedUpdateAll(condition="s.ingestion_ts > t.ingestion_ts")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert res2["rows_updated"] == 1
    assert (2, "sp-new", 300) in _rows(spark.read.format("delta").load(p))

    # verbs: delete / update / toDF / history
    DeltaTable.forPath(spark, p).delete("customer_id = 3")
    DeltaTable.forPath(spark, p).update(
        "customer_id = 1", {"customer_city": "upper(customer_city)"}
    )
    assert _rows(DeltaTable.forPath(spark, p).toDF()) == [
        (1, "RIO-UPDATED", 200),
        (2, "sp-new", 300),
    ]
    ops = [r.operation for r in DeltaTable.forPath(spark, p).history().collect()]
    assert ops == ["OVERWRITE", "MERGE", "MERGE", "DELETE", "UPDATE"]

    # refusals: richer conditions, a second whenMatched clause
    # (whenMatchedDelete is implemented since r8 — test_when_matched_delete)
    b = (
        DeltaTable.forPath(spark, p)
        .merge(src.alias("source"), "target.customer_id = source.customer_id")
        .whenMatchedUpdateAll()
    )
    with pytest.raises(NotImplementedError, match="one whenMatched"):
        b.whenMatchedDelete()
    b2 = (
        DeltaTable.forPath(spark, p)
        .alias("target")
        .merge(src.alias("source"), "target.customer_id < source.customer_id")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
    )
    with pytest.raises(NotImplementedError, match="equi"):
        b2.execute()


def test_merge_insert_only_via_facade_and_matched_only(spark, tmp_path):
    """whenNotMatchedInsertAll alone = insert-only (bronze
    file-idempotency, 01_bronze_csv_to_delta.py:60-69); a matched-only
    merge (no insert clause) never inserts."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )

    p = str(tmp_path / "bronze")
    spark.createDataFrame(
        [(1, "a")], "id long, v string"
    ).write.format("delta").mode("overwrite").save(p)
    batch = spark.createDataFrame(
        [(1, "dup"), (2, "new")], "id long, v string"
    )
    res = (
        DeltaTable.forPath(spark, p)
        .alias("t")
        .merge(batch.alias("s"), "t.id = s.id")
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert res["rows_inserted"] == 1 and res["files_rewritten"] == 0
    assert _rows(spark.read.format("delta").load(p)) == [(1, "a"), (2, "new")]

    res2 = (
        DeltaTable.forPath(spark, p)
        .alias("t")
        .merge(
            spark.createDataFrame([(2, "NEW2"), (9, "x")], "id long, v string").alias("s"),
            "t.id = s.id",
        )
        .whenMatchedUpdateAll()
        .execute()  # no insert clause: matched-only
    )
    assert res2["rows_updated"] == 1 and res2["rows_inserted"] == 0
    assert _rows(spark.read.format("delta").load(p)) == [
        (1, "a"), (2, "NEW2"),
    ]


def _log_actions(path: str, version: int) -> list[dict]:
    log = os.path.join(path, "_delta_log", f"{version:020d}.json")
    return [json.loads(x) for x in open(log) if x.strip()]


def test_mor_delete_upgrades_protocol_and_keys_removes_by_dv(
    spark, tmp_path
):
    """ADVICE r8 #1/#2: the FIRST MoR delete on a plain (reader 1)
    table must gate the DV descriptors behind a reader-3/writer-7
    protocol action in the SAME commit — otherwise spec-conformant
    foreign readers see no feature gate and silently resurrect the
    deleted rows — and every remove of a DV-bearing logical file must
    carry the old descriptor, because strict replayers key file
    actions by (path, dv uniqueId)."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string"
    ).coalesce(1).write.format("delta").mode("append").save(p)
    snap0 = DeltaSnapshot(p)
    assert int((snap0.protocol or {}).get("minReaderVersion", 1)) == 1

    res1 = delete_delta(spark, p, "id = 2", mode="mor")
    acts1 = _log_actions(p, res1["version"])
    protos = [a["protocol"] for a in acts1 if a.get("protocol")]
    assert len(protos) == 1, "first DV commit must carry the upgrade"
    assert protos[0]["minReaderVersion"] == 3
    assert protos[0]["minWriterVersion"] == 7
    assert "deletionVectors" in protos[0]["readerFeatures"]
    assert "deletionVectors" in protos[0]["writerFeatures"]
    # legacy writer-2 implied features carried forward
    assert {"appendOnly", "invariants"} <= set(protos[0]["writerFeatures"])
    # the first delete's removes carry no DV (the file had none yet)
    rm1 = [a["remove"] for a in acts1 if a.get("remove")]
    assert rm1 and all("deletionVector" not in r for r in rm1)
    dv1 = dict(next(iter(DeltaSnapshot(p).dvs.values())))

    # second MoR delete: no second protocol action; the remove cancels
    # the prior (path, dv1) entry by carrying dv1 verbatim
    res2 = delete_delta(spark, p, "id = 7", mode="mor")
    acts2 = _log_actions(p, res2["version"])
    assert not any(a.get("protocol") for a in acts2)
    rm2 = [a["remove"] for a in acts2 if a.get("remove")]
    assert len(rm2) == 1 and rm2[0].get("deletionVector") == dv1
    # and the new add replaces it with the unioned descriptor
    adds2 = [a["add"] for a in acts2 if a.get("add")]
    assert len(adds2) == 1
    assert adds2[0]["deletionVector"]["cardinality"] == 2

    # CoW rewrite of the DV-bearing file: remove carries the current DV
    dv2 = dict(adds2[0]["deletionVector"])
    res3 = delete_delta(spark, p, "id = 4", mode="cow")
    acts3 = _log_actions(p, res3["version"])
    rm3 = [a["remove"] for a in acts3 if a.get("remove")]
    assert len(rm3) == 1 and rm3[0].get("deletionVector") == dv2

    want = [(i, f"v{i}") for i in range(10) if i not in (2, 4, 7)]
    assert _rows(spark.read.format("delta").load(p)) == want
    assert _rows(read_delta_log(spark, p)) == want

    # optimize after the upgrade: its removes also carry the live DV
    # ... no DVs remain after CoW (the rewrite cleared them), so add one
    delete_delta(spark, p, "id = 9", mode="mor")
    snap = DeltaSnapshot(p)
    (dv_rel,) = list(snap.dvs)
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        optimize_delta,
    )

    reso = optimize_delta(spark, p)
    actso = _log_actions(p, reso["version"])
    rmo = {
        r["remove"]["path"]: r["remove"]
        for r in [a for a in actso if a.get("remove")]
    }
    assert rmo[dv_rel].get("deletionVector") == snap.dvs[dv_rel]
    want = [(i, f"v{i}") for i in range(10) if i not in (2, 4, 7, 9)]
    assert _rows(spark.read.format("delta").load(p)) == want


def test_append_only_feature_listed_but_not_enabled_allows_overwrite(
    spark, tmp_path
):
    """PROTOCOL.md: a feature in writerFeatures is SUPPORTED, not
    enabled — appendOnly binds only via delta.appendOnly=true. A table
    whose protocol was upgraded by a MoR delete (which lists appendOnly
    as a carried-forward legacy feature) must still accept overwrite."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    ).write.format("delta").mode("append").save(p)
    delete_delta(spark, p, "id = 1", mode="mor")
    feats = set(
        (DeltaSnapshot(p).protocol or {}).get("writerFeatures") or []
    )
    assert "appendOnly" in feats  # supported/listed ...
    spark.createDataFrame([(9, "z")], "id long, v string").write.format(
        "delta"
    ).mode("overwrite").save(p)  # ... but not enabled: allowed
    assert _rows(spark.read.format("delta").load(p)) == [(9, "z")]


def test_merge_prunes_files_outside_source_key_range(spark, tmp_path):
    """Key-range file skipping (the 100 TB merge contract): files whose
    footer-stats key range cannot overlap the source never rewrite —
    and the insert anti-join stays exact (a key OUTSIDE every pruned
    file's range inserts; a key present in an unpruned file doesn't)."""
    p = str(tmp_path / "t")
    # 3 key-clustered files: [0..9], [100..109], [200..209]
    for base in (0, 100, 200):
        spark.createDataFrame(
            [(base + i, f"v{base + i}") for i in range(10)],
            "id long, v string",
        ).coalesce(1).write.format("delta").mode("append").save(p)
    files_before = dict(DeltaSnapshot(p).files)
    assert len(files_before) == 3

    # source touches only the middle range: update 105, insert 150
    src = spark.createDataFrame(
        [(105, "UPDATED"), (150, "NEW")], "id long, v string"
    )
    res = merge_delta(spark, p, src, keys=["id"])
    assert res["rows_updated"] == 1 and res["rows_inserted"] == 1

    snap = DeltaSnapshot(p)
    survivors = set(files_before) & set(snap.files)
    # the [0..9] and [200..209] files were never touched
    assert len(survivors) == 2
    got = {r.id: r.v for r in read_delta_log(spark, p).collect()}
    assert got[105] == "UPDATED" and got[150] == "NEW"
    assert got[0] == "v0" and got[205] == "v205"
    assert len(got) == 31

    # exactness under pruning: a key that EXISTS in an out-of-range
    # file must still be seen by the probe when its value overlaps the
    # source range... construct the inverse: source key inside an
    # unpruned file's range but absent -> insert, present -> update
    res2 = merge_delta(
        spark,
        p,
        spark.createDataFrame([(205, "U2"), (207, "U3")], "id long, v string"),
        keys=["id"],
    )
    assert res2["rows_updated"] == 2 and res2["rows_inserted"] == 0


def test_delete_update_partition_pruning(spark, tmp_path):
    """delete_delta/update_delta(partitions=...) bound the scan to the
    named partitions; rows outside survive even when the predicate
    would match them (the documented contract: the selection IS part
    of the statement)."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)],
        "id long, bucket int, v string",
    ).write.format("delta").option("partition_by", "bucket").mode(
        "append"
    ).save(p)

    res = delete_delta(
        spark, p, "id < 4", mode="cow", partitions={"bucket": [0]}
    )
    assert res["rows_deleted"] == 2  # ids 0, 2 (bucket 0 only)
    got = sorted(r.id for r in read_delta_log(spark, p).collect())
    assert got == [1, 3, 4, 5, 6, 7, 8, 9]

    res2 = update_delta(
        spark, p, "id >= 8", {"v": "'X'"}, partitions={"bucket": [1]}
    )
    assert res2["rows_updated"] == 1  # id 9 only (bucket 1)
    vals = {r.id: r.v for r in read_delta_log(spark, p).collect()}
    assert vals[9] == "X" and vals[8] == "v8"

    with pytest.raises(ValueError, match="not partition columns"):
        delete_delta(spark, p, "id < 4", partitions={"nope": [1]})


def test_dml_enforces_check_constraints_and_invariants(spark, tmp_path):
    """CHECK constraints (delta.constraints.*, checkConstraints writer
    feature) and column invariants (delta.invariants metadata) are
    ENFORCED by the DML tier: a violating row aborts the statement
    naming the constraint BEFORE any file is adopted; NULL passes (SQL
    CHECK semantics); valid rows write. The arrow writers keep
    refusing (they cannot evaluate SQL)."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id long, amount double"
    ).write.format("delta").mode("append").save(p)
    # retrofit: CHECK constraint + column invariant + feature listing
    log = os.path.join(p, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(x) for x in open(log) if x.strip()]
    for a in lines:
        if "metaData" in a:
            a["metaData"].setdefault("configuration", {})[
                "delta.constraints.amount_positive"
            ] = "amount > 0"
            sch = json.loads(a["metaData"]["schemaString"])
            for f_ in sch["fields"]:
                if f_["name"] == "id":
                    f_["metadata"] = {
                        "delta.invariants": json.dumps(
                            {"expression": {"expression": "id < 1000"}}
                        )
                    }
            a["metaData"]["schemaString"] = json.dumps(sch)
        if "protocol" in a:
            a["protocol"].update(
                minReaderVersion=1,
                minWriterVersion=7,
                writerFeatures=["checkConstraints", "invariants"],
            )
    with open(log, "w") as f:
        for a in lines:
            f.write(json.dumps(a) + "\n")

    # valid merge passes (and a NULL amount passes: CHECK semantics)
    res = merge_delta(
        spark,
        p,
        spark.createDataFrame(
            [(3, 30.0), (4, None)], "id long, amount double"
        ),
        keys=["id"],
    )
    assert res["rows_inserted"] == 2
    got = sorted(
        (r.id, r.amount) for r in read_delta_log(spark, p).collect()
    )
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)]

    # violating CHECK aborts naming the constraint; no row lands
    with pytest.raises(Exception, match="amount_positive"):
        merge_delta(
            spark,
            p,
            spark.createDataFrame([(5, -1.0)], "id long, amount double"),
            keys=["id"],
        )
    assert read_delta_log(spark, p).count() == 4

    # violating column invariant aborts too
    with pytest.raises(Exception, match="invariant"):
        merge_delta(
            spark,
            p,
            spark.createDataFrame([(5000, 1.0)], "id long, amount double"),
            keys=["id"],
        )
    assert read_delta_log(spark, p).count() == 4

    # UPDATE through the same gate
    with pytest.raises(Exception, match="amount_positive"):
        update_delta(spark, p, "id = 1", {"amount": "-5.0"})
    assert update_delta(spark, p, "id = 1", {"amount": "15.0"})[
        "rows_updated"
    ] == 1

    # the arrow writer tier ENFORCES since r9 (arrow_enforce.py):
    # valid rows write, a violating batch aborts naming the constraint
    spark.createDataFrame(
        [(9, 9.0)], "id long, amount double"
    ).write.format("delta").mode("append").save(p)
    assert read_delta_log(spark, p).count() == 5
    with pytest.raises(Exception, match="amount_positive"):
        spark.createDataFrame(
            [(10, -2.0)], "id long, amount double"
        ).write.format("delta").mode("append").save(p)
    assert read_delta_log(spark, p).count() == 5


def test_merge_not_matched_by_source_delete(spark, tmp_path):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE: target rows whose keys
    appear in no source row are deleted (optionally condition-gated);
    key-range file pruning is disabled for this shape (the touched
    rows live OUTSIDE the source's key range); CDF carries delete
    images; both read tiers agree."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)  # rows (1,a,7) (2,b,7) (3,c,8)
    src = spark.createDataFrame(
        [(2, "B", 7), (9, "z", 8)], "id long, v string, p long"
    )
    res = merge_delta(
        spark, p, src, keys=["id"],
        not_matched_by_source_delete=True,
    )
    assert res["rows_updated"] == 1  # id 2 updated
    assert res["rows_inserted"] == 1  # id 9 inserted
    assert res["rows_deleted"] == 2  # ids 1, 3 gone
    for df in (
        spark.read.format("delta").load(p),
        read_delta_log(spark, p),
    ):
        assert _rows(df.select("id", "v")) == [(2, "B"), (9, "z")]
    ch = delta_changes(spark, p, res["version"], res["version"])
    got = sorted((r._change_type, r.id) for r in ch.collect())
    assert got == [
        ("delete", 1), ("delete", 3),
        ("insert", 9),
        ("update_postimage", 2), ("update_preimage", 2),
    ]


def test_merge_not_matched_by_source_conditional_update(spark, tmp_path):
    """whenNotMatchedBySourceUpdate(condition, set): only unmatched
    rows passing the condition rewrite; a NULL condition keeps the row
    (SQL branch semantics); rows in files with no touched rows never
    churn."""
    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 7), (2, "b", 7), (3, None, 8), (4, "d", 9)],
        "id long, v string, p long",
    ).write.format("delta").option("partition_by", "p").mode(
        "overwrite"
    ).save(p)
    src = spark.createDataFrame([(4, "D", 9)], "id long, v string, p long")

    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )

    res = (
        DeltaTable.forPath(spark, p)
        .alias("t")
        .merge(src.alias("s"), "t.id = s.id")
        .whenMatchedUpdateAll()
        .whenNotMatchedBySourceUpdate(
            condition="t.v = 'a'", set={"v": "'stale'"}
        )
        .execute()
    )
    # id 1 (v='a') updated by the by-source branch; id 2 (v='b') and
    # id 3 (v NULL -> condition NULL -> kept) untouched; id 4 matched
    assert res["rows_updated"] == 2 and res["rows_deleted"] == 0
    got = _rows(spark.read.format("delta").load(p).select("id", "v"))
    assert got == [(1, "stale"), (2, "b"), (3, None), (4, "D")]
    # partition p=7's file rewrote (id 1 lives there); p=8's did not
    snap = DeltaSnapshot(p)
    assert any("p=8" in f for f in snap.files)  # untouched file kept


def test_merge_by_source_only_no_matched_clause(spark, tmp_path):
    """A merge with ONLY a by-source delete clause (no matched/insert
    branch) deletes the unmatched keys and nothing else."""
    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)  # (1,a,7) (2,b,7) (3,c,8)
    src = spark.createDataFrame([(1,), (2,)], "id long")
    res = merge_delta(
        spark, p, src, keys=["id"],
        insert_only=True,
        insert_when_not_matched=False,
        not_matched_by_source_delete=True,
    )
    assert res["rows_deleted"] == 1 and res["rows_inserted"] == 0
    assert _rows(
        spark.read.format("delta").load(p).select("id")
    ) == [(1,), (2,)]


def test_generated_columns_enforced(spark, tmp_path):
    """delta.generationExpression columns: the DML tier enforces
    value <=> expression on every staged row (upstream's rule); the
    arrow format writer refuses (it cannot evaluate SQL) with a
    pointer to the enforcing path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t")
    os.makedirs(os.path.join(p, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array([1], type=pa.int64()),
                  "id2": pa.array([2], type=pa.int64())}),
        os.path.join(p, "f.parquet"),
    )
    schema_str = json.dumps(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "id2", "type": "long", "nullable": True,
             "metadata": {"delta.generationExpression": "id * 2"}},
        ]}
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {"id": "m", "format": {"provider": "parquet"},
                      "schemaString": schema_str, "partitionColumns": [],
                      "configuration": {}}},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(p, "_delta_log", f"{0:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")

    # valid merge: id2 = id * 2 holds on every staged row
    src_ok = spark.createDataFrame([(5, 10)], "id long, id2 long")
    merge_delta(spark, p, src_ok, keys=["id"])
    assert _rows(read_delta_log(spark, p)) == [(1, 2), (5, 10)]

    # violating merge aborts before any file is adopted
    src_bad = spark.createDataFrame([(7, 99)], "id long, id2 long")
    with pytest.raises(Exception, match="generated column id2"):
        merge_delta(spark, p, src_bad, keys=["id"])
    assert _rows(read_delta_log(spark, p)) == [(1, 2), (5, 10)]

    # the arrow writer ENFORCES since r9 (arrow_enforce.py): a correct
    # stored value writes; a wrong one aborts naming the column
    spark.createDataFrame(
        [(8, 16)], "id long, id2 long"
    ).write.format("delta").mode("append").save(p)
    assert _rows(read_delta_log(spark, p)) == [(1, 2), (5, 10), (8, 16)]
    with pytest.raises(Exception, match="id2"):
        spark.createDataFrame(
            [(9, 99)], "id long, id2 long"
        ).write.format("delta").mode("append").save(p)
    assert read_delta_log(spark, p).count() == 3


def test_when_matched_delete(spark, tmp_path):
    """whenMatchedDelete: matched keys (condition-gated) delete, the
    rest keep; composable with whenNotMatchedInsertAll; CDF carries
    delete + insert images."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )

    p = str(tmp_path / "t")
    _make_cdf_table(spark, p)  # (1,a,7) (2,b,7) (3,c,8)
    src = spark.createDataFrame(
        [(1, "x", 7), (3, "y", 8), (9, "z", 8)], "id long, v string, p long"
    )
    res = (
        DeltaTable.forPath(spark, p)
        .alias("t")
        .merge(src.alias("s"), "t.id = s.id")
        .whenMatchedDelete(condition="t.v = 'a'")  # deletes id 1 only
        .whenNotMatchedInsertAll()                 # inserts id 9
        .execute()
    )
    assert res["rows_deleted"] == 1 and res["rows_inserted"] == 1
    got = _rows(spark.read.format("delta").load(p).select("id", "v"))
    assert got == [(2, "b"), (3, "c"), (9, "z")]
    ch = delta_changes(spark, p, res["version"], res["version"])
    assert sorted((r._change_type, r.id) for r in ch.collect()) == [
        ("delete", 1), ("insert", 9),
    ]

    # unconditional matched delete, keys-only source
    res2 = merge_delta(
        spark, p, spark.createDataFrame([(2,), (9,)], "id long"),
        keys=["id"], matched_delete=True, insert_when_not_matched=False,
    )
    assert res2["rows_deleted"] == 2
    assert _rows(
        spark.read.format("delta").load(p).select("id")
    ) == [(3,)]


def test_operation_metrics_in_history(spark, tmp_path):
    """commitInfo.operationMetrics (delta-spark's observability
    contract, string-valued): WRITE/MERGE/DELETE-MoR/OPTIMIZE each
    record their row/file counts, surfaced by history()."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import (
        DeltaTable,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
        optimize_delta,
    )

    p = str(tmp_path / "t")
    (
        spark.range(0, 10)
        .selectExpr("id", "id as v")
        .coalesce(2)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    merge_delta(
        spark,
        p,
        spark.createDataFrame([(3, 33), (20, 200)], "id long, v long"),
        ["id"],
    )
    delete_delta(spark, p, "id = 5", mode="mor")
    optimize_delta(spark, p, target_file_bytes=1 << 30)
    h = {
        r["version"]: (r["operation"], r["operationMetrics"])
        for r in DeltaTable.forPath(spark, p).history().collect()
    }
    assert h[0][1]["numOutputRows"] == "10"
    assert h[1][1]["numTargetRowsInserted"] == "1"
    assert h[1][1]["numTargetRowsUpdated"] == "1"
    assert h[2][1]["numDeletedRows"] == "1"
    assert h[2][1]["numDeletionVectorsAdded"] == "1"
    assert int(h[3][1]["numRemovedFiles"]) >= 1
