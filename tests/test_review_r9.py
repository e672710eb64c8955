"""Round-9 advisor fixes (ADVICE r8), each pinned by the failure it
names:

1. _generate_identity pinned the tagged frame (localCheckpoint) before
   the per-partition count job so the offsets map and the row_number
   pass read the SAME materialized partitions — AQE coalescing or a
   non-deterministic upstream (merge's anti-join inserts) could
   otherwise shift pids between the two jobs, minting NULL/duplicate
   ids in a GENERATED ALWAYS column; an unmapped pid now fails loudly
   in-plan instead of silently producing NULL.
2. _stage_data_files passes the materialized row-tracking columns
   through to_physical_df (passthrough=), so copy-on-write DML on a
   table with BOTH column mapping and row tracking preserves row ids
   (they were silently dropped: not in fields_json, no passthrough).
3. verify_delta_crc skips .crc files whose JSON commit was expired by
   expire_delta_commits (non-replayable != mismatch), and
   expire_delta_commits removes the stale .crc alongside the commit.
4. _parse_replace_where tokenizes IN lists quote-aware, so a quoted
   partition value containing a comma parses instead of erroring.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_table
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    DeltaSnapshot,
    alter_delta_properties,
    expire_delta_commits,
    read_delta_log,
    verify_delta_crc,
    write_delta_checkpoint,
    write_delta_crc,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    delta_table.register(spark)


# ---------------------------------------------------------------------------
# 1. identity generation is deterministic across the two-job assign
# ---------------------------------------------------------------------------


def test_identity_over_shuffled_upstream_unique_contiguous(
    spark, tmp_path
):
    """Generate identity values on a frame whose lineage ends in an
    AQE-coalesced shuffle (groupBy) — the class of plan where
    re-evaluating spark_partition_id() across two jobs is not
    guaranteed stable. Ids must be unique, contiguous, and aligned to
    start/step."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        _generate_identity,
    )

    df = (
        spark.range(0, 5_000)
        .withColumn("g", F.col("id") % 997)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out, hwm = _generate_identity(df, "rid", "long", base=90, step=10)
    vals = sorted(r["rid"] for r in out.collect())
    assert vals == list(range(100, 100 + 10 * 997, 10))
    assert hwm == 90 + 997 * 10
    assert all(v is not None for v in vals)


def test_identity_merge_inserts_unique_after_antijoin(spark, tmp_path):
    """End-to-end: MERGE inserts (the anti-join upstream the advisor
    called out) get unique, gap-free generated ids."""
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        create_delta_table,
        insert_delta,
        merge_delta,
    )

    p = str(tmp_path / "t")
    create_delta_table(
        p,
        "k long, v string, rid bigint",
        identity={"rid": {"start": 1, "step": 1}},
    )
    insert_delta(
        spark,
        p,
        spark.range(0, 50).selectExpr("id as k", "string(id) as v"),
    )
    src = spark.range(25, 200).selectExpr(
        "id as k", "concat('m', id) as v"
    ).repartition(16, "k")
    merge_delta(spark, p, src, keys=["k"])
    rows = read_delta_log(spark, p).collect()
    ids = sorted(r["rid"] for r in rows)
    assert len(ids) == 200
    assert len(set(ids)) == 200, "duplicate generated identity values"
    assert ids == list(range(1, 201))


# ---------------------------------------------------------------------------
# 2. column mapping + row tracking: CoW DML preserves ids
# ---------------------------------------------------------------------------


def test_mapped_row_tracked_update_preserves_ids(spark, tmp_path):
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_dml import (
        delete_delta,
        update_delta,
    )

    p = str(tmp_path / "t")
    (
        spark.range(0, 24)
        .selectExpr("id", "id * 2 as v")
        .coalesce(3)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    alter_delta_properties(p, {"delta.columnMapping.mode": "name"})
    alter_delta_properties(p, {"delta.enableRowTracking": "true"})
    snap = DeltaSnapshot(p)
    assert snap.column_mapping_mode == "name"

    def ids():
        return {
            r["id"]: r["_row_id"]
            for r in read_delta_log(
                spark, p, with_row_ids=True
            ).collect()
        }

    before = ids()
    res = update_delta(spark, p, "id % 4 = 1", {"v": "v + 1000"})
    assert res["rows_updated"] == 6
    after = ids()
    # updated rows KEEP their id (preserved tier), untouched rows too
    assert after == before, (
        "copy-on-write UPDATE on a mapped+row-tracked table must "
        "preserve every surviving row's id"
    )
    # and a CoW delete preserves the survivors' ids
    res_d = delete_delta(spark, p, "id % 4 = 2", mode="cow")
    assert res_d["rows_deleted"] == 6
    survivors = ids()
    assert survivors == {
        k: v for k, v in before.items() if k % 4 != 2
    }
    # values actually updated, logically readable
    got = {
        r["id"]: r["v"] for r in read_delta_log(spark, p).collect()
    }
    assert got[1] == 1002 and got[5] == 1010 and got[0] == 0


# ---------------------------------------------------------------------------
# 3. verify_delta_crc vs expired commits
# ---------------------------------------------------------------------------


def test_verify_crc_survives_log_expiry(spark, tmp_path):
    p = str(tmp_path / "t")
    for i in range(4):
        (
            spark.range(i * 10, i * 10 + 10)
            .selectExpr("id", "id as v")
            .coalesce(1)
            .write.format("delta")
            .mode("append")
            .save(p)
        )
    top = DeltaSnapshot(p).version
    for v in range(top + 1):
        write_delta_crc(p, v)
    assert verify_delta_crc(p) == []
    write_delta_checkpoint(p)
    removed = expire_delta_commits(p, honor_retention=False)
    assert removed > 0
    log = os.path.join(p, "_delta_log")
    # stale .crc files were removed alongside their commits
    crcs = {
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".crc")
    }
    jsons = {
        int(f.split(".")[0])
        for f in os.listdir(log)
        if f.endswith(".json") and f.split(".")[0].isdigit()
    }
    assert crcs <= jsons | {top}
    # and even a hand-restored stale .crc no longer raises
    stale = os.path.join(log, f"{0:020d}.crc")
    with open(stale, "w") as f:
        json.dump({"numFiles": 999}, f)
    assert verify_delta_crc(p) == []  # skipped, not a crash/mismatch


# ---------------------------------------------------------------------------
# VERDICT r8 wrong #1: _blocked_pairs per-block memory is O(k), not O(k^2)
# ---------------------------------------------------------------------------


@pytest.mark.soak  # r12: soak-style; default run deselects (pytest.ini)
def test_blocked_pairs_at_cap_streams_not_one_array(spark):
    """A block AT PAIR_BLOCK_CAP (10k members -> ~50M pairs) must fan
    out streaming — two pipelined Generate nodes, per-row memory O(k)
    — instead of flattening every C(k,2) struct into ONE array per
    block (the r8 spelling: multiple GB inside a single expression
    evaluation). Pinned two ways: the optimized plan carries two
    Generate nodes and no flatten-of-transform pair array, and the
    full at-cap fan-out actually executes (count + spot checks)."""
    from real_time_e_commerce_analytics_lakehouse_spark.plans.documents import (
        PAIR_BLOCK_CAP,
        _blocked_pairs,
    )

    k = PAIR_BLOCK_CAP  # exactly at the budget: must run, not assert
    df = spark.range(0, k).select(
        F.lit("b").alias("key"),
        F.format_string("d%07d", F.col("id")).alias("doc_id"),
    )
    pairs = _blocked_pairs(df, ["key"], "doc_id", "test")
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate") == 2, plan
    assert "flatten(transform" not in plan, (
        "pair fan-out regressed to the O(k^2)-per-block array spelling"
    )
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_a").alias("lo"),
        F.max("doc_b").alias("hi"),
        F.sum(F.when(F.col("doc_a") < F.col("doc_b"), 0).otherwise(1)).alias(
            "bad_order"
        ),
    ).first()
    assert agg["n"] == k * (k - 1) // 2
    assert agg["lo"] == "d0000000" and agg["hi"] == f"d{k - 1:07d}"
    assert agg["bad_order"] == 0


# ---------------------------------------------------------------------------
# 4. replaceWhere IN-list with commas inside quoted literals
# ---------------------------------------------------------------------------


def test_replace_where_in_list_quoted_comma():
    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_table import (
        _parse_replace_where,
    )

    out = _parse_replace_where("region IN ('a,b', 'c')")
    assert out == {"region": {"a,b", "c"}}
    out = _parse_replace_where(
        "region IN ('x', \"p,q\", 'z') AND year = 2024"
    )
    assert out == {"region": {"x", "p,q", "z"}, "year": {"2024"}}
    with pytest.raises(ValueError, match="empty"):
        _parse_replace_where("region IN ( )")


def test_replace_where_end_to_end_comma_value(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a,b"), (2, "c"), (3, "a,b")], "id int, region string"
    )
    (
        df.write.format("delta")
        .option("partition_by", "region")
        .mode("append")
        .save(p)
    )
    repl = spark.createDataFrame(
        [(9, "a,b")], "id int, region string"
    )
    (
        repl.write.format("delta")
        .mode("overwrite")
        .option("replaceWhere", "region IN ('a,b')")
        .save(p)
    )
    got = sorted(
        (r["id"], r["region"])
        for r in read_delta_log(spark, p).collect()
    )
    assert got == [(2, "c"), (9, "a,b")]
