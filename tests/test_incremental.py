"""Incremental aggregate maintenance == full recompute through
insert/update/delete churn (materialized-view delta maintenance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
    incremental_agg_refresh,
)
from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable


def _full(src):
    # the mart maintains SUM + per-column non-null count (AVG's true
    # denominator; and the NULL-when-all-null signal) + row count —
    # exactly what one full recompute produces
    return (
        src.read()
        .groupBy("status")
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("sum_amount"),
            F.count("amount").cast("long").alias("cnt_amount"),
            F.count("*").cast("long").alias("n_rows"),
        )
        .select("status", "sum_amount", "cnt_amount", "n_rows")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_agg_matches_full_recompute(spark, tmp_path):
    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))
    seen = None

    def refresh():
        nonlocal seen
        v = incremental_agg_refresh(
            agg, src, seen, group_cols=["status"], sum_cols=["amount"],
            keys="id",
        )
        seen = v if v is not None else seen
        assert _rows(agg.read()) == _rows(_full(src))

    # initial load
    src.overwrite(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 5.0)],
            "id long, status string, amount double",
        )
    )
    refresh()

    # append-only batch
    src.append(
        spark.createDataFrame(
            [(4, "B", 7.5), (5, "C", 1.0)], "id long, status string, amount double"
        )
    )
    refresh()

    # update (rewrite commit): row 2 changes amount AND group
    src.merge_upsert(
        spark.createDataFrame(
            [(2, "B", 25.0)], "id long, status string, amount double"
        ),
        keys="id",
    )
    refresh()

    # delete: group C empties and must disappear from the aggregate
    src.delete(F.col("status") == "C")
    refresh()
    assert "C" not in {r.status for r in agg.read().collect()}

    # no new commits: refresh is a no-op (returns None, table untouched)
    before = agg.latest_version()
    assert incremental_agg_refresh(
        agg, src, seen, group_cols=["status"], sum_cols=["amount"], keys="id"
    ) is None
    assert agg.latest_version() == before


def _full_minmax(src, version=None):
    return (
        src.read(version=version)
        .groupBy("status")
        .agg(F.min("amount").alias("min_v"), F.max("amount").alias("max_v"))
    )


def test_incremental_minmax_matches_full_recompute(spark, tmp_path):
    """MIN/MAX maintenance: inserts fold; a delete of the current
    extremum forces a group-scoped recompute; emptied groups vanish."""
    from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
        incremental_minmax_refresh,
    )

    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))
    seen = None

    def refresh():
        nonlocal seen
        v = incremental_minmax_refresh(
            agg, src, seen, group_cols=["status"], value_col="amount",
            keys="id",
        )
        seen = v if v is not None else seen
        assert _rows(agg.read()) == _rows(_full_minmax(src))

    src.overwrite(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "A", 90.0), (3, "B", 5.0)],
            "id long, status string, amount double",
        )
    )
    refresh()

    # pure inserts: fold path (new max for A, new group C)
    src.append(
        spark.createDataFrame(
            [(4, "A", 99.0), (5, "C", 1.0)], "id long, status string, amount double"
        )
    )
    refresh()

    # delete the CURRENT max of A: the fold cannot repair this — the
    # dirty-group recompute must restore max 90
    src.delete(F.col("id") == 4)
    refresh()
    got = {r.status: (r.min_v, r.max_v) for r in agg.read().collect()}
    assert got["A"] == (10.0, 90.0)

    # update moves a row OUT of B into A (preimage dirties B)
    src.merge_upsert(
        spark.createDataFrame(
            [(3, "A", 2.0)], "id long, status string, amount double"
        ),
        keys="id",
    )
    refresh()
    assert "B" not in {r.status for r in agg.read().collect()}
    assert {r.status: r.min_v for r in agg.read().collect()}["A"] == 2.0


def test_incremental_distinct_sketches_match_exact(spark, tmp_path):
    """HLL-sketch DISTINCT maintenance: merged estimates equal the exact
    distinct counts while cardinalities sit far below sketch capacity;
    a delete dirties its group and the rebuilt sketch forgets the
    removed value."""
    from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
        incremental_distinct_refresh,
    )

    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))
    seen = None

    def refresh():
        nonlocal seen
        v = incremental_distinct_refresh(
            agg, src, seen, group_cols=["status"], value_col="uid", keys="id"
        )
        seen = v if v is not None else seen
        exact = {
            r.status: r.n
            for r in src.read()
            .groupBy("status")
            .agg(F.countDistinct("uid").alias("n"))
            .collect()
        }
        got = {r.status: r.n_distinct_est for r in agg.read().collect()}
        assert got == exact  # exact while |distinct| << sketch capacity

    src.overwrite(
        spark.createDataFrame(
            [(1, "A", 10), (2, "A", 11), (3, "A", 10), (4, "B", 20)],
            "id long, status string, uid long",
        )
    )
    refresh()

    # insert fold: new uid in A, duplicate uid is a no-op for the sketch
    src.append(
        spark.createDataFrame(
            [(5, "A", 12), (6, "A", 11)], "id long, status string, uid long"
        )
    )
    refresh()

    # delete the only row holding uid 12: the rebuilt sketch must forget it
    src.delete(F.col("id") == 5)
    refresh()


def test_incremental_agg_null_group_key(spark, tmp_path):
    """ADVICE r3 #1: a NULL group key is ONE group (GROUP BY semantics).
    The merge joins must be null-safe or the NULL group duplicates on
    merge and survives deletion. Exercised across all three tiers."""
    from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
        incremental_distinct_refresh,
        incremental_minmax_refresh,
    )

    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))
    mm = LakeTable(spark, str(tmp_path / "mm"))
    dc = LakeTable(spark, str(tmp_path / "dc"))
    seen = {"agg": None, "mm": None, "dc": None}

    def _rows_ns(df):  # None-tolerant sort (NULL group key is expected)
        return sorted((tuple(r) for r in df.collect()), key=repr)

    def refresh():
        for name, tbl, fn, kw in (
            ("agg", agg, incremental_agg_refresh, {"sum_cols": ["amount"]}),
            ("mm", mm, incremental_minmax_refresh, {"value_col": "amount"}),
            ("dc", dc, incremental_distinct_refresh, {"value_col": "id"}),
        ):
            v = fn(tbl, src, seen[name], group_cols=["status"], keys="id", **kw)
            seen[name] = v if v is not None else seen[name]
        got = _rows_ns(agg.read())
        want = _rows_ns(_full(src))
        assert got == want, f"agg diverged: {got} != {want}"
        got_mm = _rows_ns(mm.read())
        want_mm = _rows_ns(_full_minmax(src))
        assert got_mm == want_mm, f"minmax diverged: {got_mm} != {want_mm}"
        # distinct tier: NULL group must appear exactly once
        groups = [r.status for r in dc.read().collect()]
        want_g = [r.status for r in src.read().select("status").distinct().collect()]
        assert sorted(groups, key=str) == sorted(want_g, key=str)

    src.overwrite(
        spark.createDataFrame(
            [(1, None, 10.0), (2, "A", 20.0), (3, None, 5.0)],
            "id long, status string, amount double",
        )
    )
    refresh()

    # second batch touches the NULL group again: a null-unsafe merge
    # would now leave TWO NULL-keyed rows in the aggregate
    src.append(
        spark.createDataFrame(
            [(4, None, 7.5)], "id long, status string, amount double"
        )
    )
    refresh()
    assert agg.read().where(F.col("status").isNull()).count() == 1

    # delete one NULL-group row: minmax/distinct mark the NULL group
    # dirty and must recompute (null-safe semi/anti joins)
    src.delete(F.col("id") == 1)
    refresh()

    # empty the NULL group entirely: it must disappear everywhere
    src.delete(F.col("status").isNull())
    refresh()
    assert agg.read().where(F.col("status").isNull()).count() == 0
    assert mm.read().where(F.col("status").isNull()).count() == 0


def test_agg_refresh_replay_and_compaction_advance(spark, tmp_path):
    """r4 review hardening: (1) REPLAY SAFETY — re-running the refresh
    with a stale since_version (caller crashed before persisting the
    returned version) folds nothing twice: the txn marker the overwrite
    recorded atomically guards it, so sums stay equal to a full
    recompute instead of doubling. (2) A range holding only
    data-neutral commits (compaction) returns the end version so the
    consumer advances past the rewrite instead of re-diffing the whole
    table forever."""
    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))

    src.overwrite(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "A", 20.0), (3, "B", 5.0)],
            "id long, status string, amount double",
        )
    )
    v1 = incremental_agg_refresh(
        agg, src, None, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    assert v1 == src.latest_version()
    expected = _rows(_full(src))
    assert _rows(agg.read()) == expected

    # crash-replay: same call again with the ORIGINAL since_version
    v2 = incremental_agg_refresh(
        agg, src, None, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    assert _rows(agg.read()) == expected  # NOT doubled
    assert v2 is None or v2 <= v1

    # data-neutral trailing commit: consumer advances past it
    src.compact()
    v3 = incremental_agg_refresh(
        agg, src, v1, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    assert v3 == src.latest_version()
    assert _rows(agg.read()) == expected
    # and the next refresh from the advanced version is a cheap no-op
    v4 = incremental_agg_refresh(
        agg, src, v3, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    assert v4 is None


def test_incremental_agg_sum_goes_null_when_nonnull_values_deleted(
    spark, tmp_path
):
    """SQL SUM over a group whose non-null values were all deleted is
    NULL; the decimal fold alone would report the exactly-cancelled 0
    (r5 review). The maintained per-column non-null count supplies the
    signal — and the true AVG denominator."""
    from real_time_e_commerce_analytics_lakehouse_spark.operators.incremental import (
        incremental_agg_refresh,
    )
    from real_time_e_commerce_analytics_lakehouse_spark.tables import LakeTable

    src = LakeTable(spark, str(tmp_path / "src"))
    agg = LakeTable(spark, str(tmp_path / "agg"))
    src.overwrite(
        spark.createDataFrame(
            [(1, "A", None), (2, "A", 5.0), (3, "A", 10.0)],
            "id long, status string, amount double",
        )
    )
    v = incremental_agg_refresh(
        agg, src, None, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    row = agg.read().collect()[0]
    assert (row["sum_amount"], row["cnt_amount"], row["n_rows"]) == (15, 2, 3)
    # AVG from the maintained state ignores the NULL row, like SQL AVG
    assert float(row["sum_amount"]) / row["cnt_amount"] == 7.5

    src.delete(F.col("id").isin(2, 3))
    incremental_agg_refresh(
        agg, src, v, group_cols=["status"], sum_cols=["amount"], keys="id"
    )
    row = agg.read().collect()[0]
    assert row["sum_amount"] is None  # not Decimal(0)
    assert (row["cnt_amount"], row["n_rows"]) == (0, 1)
