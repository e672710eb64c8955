"""Liquid clustering on foreign Delta tables (PROTOCOL.md "Clustered
Table"): ``cluster_by_delta`` records physical clustering-column paths
in the ``delta.clustering`` domain and adds the clustering (+
domainMetadata) writer features; appends remain legal (the feature's
writer obligation is metadata PRESERVATION, which replay + checkpoints
provide); OPTIMIZE re-clusters on the domain's columns by default.

Reference scope note: the reference notebooks partition; clustering is
the beyond-reference layout tier (the engine's own LakeTable has had
cluster_by since r4 — this brings the foreign-Delta layer to parity)."""

from __future__ import annotations

import pytest

from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    DeltaSnapshot,
    cluster_by_delta,
    clustering_columns,
    expire_delta_commits,
    optimize_delta,
    read_delta_log,
    write_delta_checkpoint,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_table import (
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _mk(spark, tmp_path, n=2000):
    p = str(tmp_path / "t")
    (
        spark.range(0, n)
        .selectExpr("id", "id % 37 as a", "id % 11 as b")
        .repartition(4)
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    return p


def test_cluster_by_records_domain_and_feature(spark, tmp_path):
    p = _mk(spark, tmp_path)
    cluster_by_delta(p, ["a", "b"])
    snap = DeltaSnapshot(p)
    wf = snap.protocol["writerFeatures"]
    assert "clustering" in wf and "domainMetadata" in wf
    assert clustering_columns(snap) == ["a", "b"]
    # appends stay legal on a clustered table
    (
        spark.range(5000, 5100)
        .selectExpr("id", "id % 37 as a", "id % 11 as b")
        .write.format("delta")
        .mode("append")
        .save(p)
    )
    assert read_delta_log(spark, p).count() == 2100


def test_optimize_uses_clustering_columns_by_default(spark, tmp_path):
    p = _mk(spark, tmp_path)
    cluster_by_delta(p, ["a"])
    res = optimize_delta(spark, p, target_file_bytes=6_000)
    assert res["written"] >= 2
    # each output file covers a narrow 'a' range (range-partitioned by
    # the Morton key of a single column = range-clustered by a)
    snap = DeltaSnapshot(p)
    widths = []
    for rel, st in snap.stats.items():
        mn = st.get("minValues", {}).get("a")
        mx = st.get("maxValues", {}).get("a")
        if mn is not None and mx is not None:
            widths.append(int(mx) - int(mn))
    assert widths and max(widths) < 36, widths


def test_clustering_survives_checkpoint_and_unclusters(spark, tmp_path):
    p = _mk(spark, tmp_path, n=200)
    cluster_by_delta(p, ["b"])
    write_delta_checkpoint(p)
    expire_delta_commits(p, honor_retention=False)
    assert clustering_columns(DeltaSnapshot(p)) == ["b"]
    cluster_by_delta(p, [])  # CLUSTER BY NONE
    assert clustering_columns(DeltaSnapshot(p)) == []


def test_cluster_by_refusals(spark, tmp_path):
    p = str(tmp_path / "t")
    (
        spark.range(0, 50)
        .selectExpr("id", "cast(id % 3 as string) as g")
        .write.format("delta")
        .option("partition_by", "g")
        .mode("append")
        .save(p)
    )
    with pytest.raises(ValueError, match="partition columns"):
        cluster_by_delta(p, ["g"])
    with pytest.raises(ValueError, match="non-table columns"):
        cluster_by_delta(p, ["nope"])
