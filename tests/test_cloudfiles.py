"""Auto-Loader-shaped streaming source (sources/cloudfiles):
``spark.readStream.format("cloudFiles")`` — the reference's bronze
reader block (db_notebooks/01_bronze_csv_to_delta.py:33-44) must run
verbatim against this engine: option names, schemaLocation tracking,
``col("_metadata.file_path")`` lineage, checkpoint resume, and the
addNewColumns widen-then-restart evolution contract."""

from __future__ import annotations

import csv
import json
import os
import time

import pytest
from pyspark.sql.functions import col, current_timestamp

from real_time_e_commerce_analytics_lakehouse_spark.sources import (
    cloudfiles,
    delta_table,
)
from real_time_e_commerce_analytics_lakehouse_spark.sources.cloudfiles import (
    CloudFilesStreamReader,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    cloudfiles.register(spark)
    delta_table.register(spark)


def _write_csv(src, name, rows, header=("id", "name")):
    with open(os.path.join(src, name), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _reference_reader(spark, src, ckpt):
    """The reference notebook's reader block, verbatim option names."""
    return (
        spark.readStream.format("cloudFiles")
        .option("cloudFiles.format", "csv")
        .option("cloudFiles.schemaLocation", ckpt + "/schema")
        .option("header", "true")
        .option("inferSchema", "true")
        .option("cloudFiles.schemaEvolutionMode", "addNewColumns")
        .load(src)
        .withColumn("ingestion_ts", current_timestamp())
        .withColumn("source_file", col("_metadata.file_path"))
    )


def _drain(df, ckpt, tgt):
    q = (
        df.drop("_metadata")
        .writeStream.format("delta")
        .option("checkpointLocation", ckpt + "/checkpoint")
        .trigger(availableNow=True)
        .start(tgt)
    )
    q.awaitTermination(120)
    time.sleep(0.2)


def test_reference_bronze_block_end_to_end(spark, tmp_path):
    """CSV dir -> cloudFiles -> format('delta'): incremental drains,
    source_file lineage from the _metadata struct, checkpoint restart
    reads nothing, inferred schema tracked in schemaLocation."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    tgt = str(tmp_path / "tgt")
    os.makedirs(src)
    _write_csv(src, "a.csv", [(1, "x"), (2, "y")])
    df = _reference_reader(spark, src, ckpt)

    _drain(df, ckpt, tgt)
    got = spark.read.format("delta").load(tgt)
    assert got.columns == ["id", "name", "ingestion_ts", "source_file"]
    assert sorted(
        (r.id, r.name, r.source_file.endswith("a.csv"))
        for r in got.collect()
    ) == [(1, "x", True), (2, "y", True)]
    # schema_0.json tracked
    assert any(
        f.startswith("schema_0") for f in os.listdir(ckpt + "/schema")
    )

    _write_csv(src, "b.csv", [(3, "z")])
    _drain(df, ckpt, tgt)
    assert sorted(
        (r.id, r.name)
        for r in spark.read.format("delta").load(tgt).collect()
    ) == [(1, "x"), (2, "y"), (3, "z")]
    _drain(df, ckpt, tgt)  # nothing new: zero duplicates
    assert spark.read.format("delta").load(tgt).count() == 3


def test_add_new_columns_widens_then_restart_picks_up(spark, tmp_path):
    """addNewColumns contract: a file with an unknown column FAILS the
    batch after widening the tracked schema on disk; a fresh reader
    (the restart) serves the widened schema, reprocesses the failed
    file, and null-fills the new column for old files."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    tgt = str(tmp_path / "tgt")
    os.makedirs(src)
    _write_csv(src, "a.csv", [(1, "x")])
    df = _reference_reader(spark, src, ckpt)
    _drain(df, ckpt, tgt)

    _write_csv(src, "b.csv", [(2, "y", 9.5)], header=("id", "name", "w"))
    with pytest.raises(Exception, match="new columns|restart"):
        _drain(df, ckpt, tgt)
    # tracked schema widened on disk
    names = [
        f for f in os.listdir(ckpt + "/schema") if f.startswith("schema_")
    ]
    assert any("schema_1" in f for f in names)
    latest = max(names)
    with open(os.path.join(ckpt + "/schema", latest)) as f:
        widened = json.load(f)
    assert [x["name"] for x in widened["fields"]] == ["id", "name", "w"]

    # restart = a fresh reader over the same schemaLocation+checkpoint
    df2 = _reference_reader(spark, src, ckpt)
    assert "w" in df2.columns
    _drain(df2, ckpt, tgt + "2")
    # the failed batch was never committed: b.csv lands exactly once
    got = spark.read.format("delta").load(tgt + "2")
    assert sorted(
        (r.id, r.name, r.w) for r in got.collect()
    ) == [(2, "y", 9.5)]


def test_evolution_modes_and_trigger_budget(spark, tmp_path):
    """failOnNewColumns refuses without widening; none ignores unknown
    columns; maxFilesPerTrigger bounds every planned window including
    the first (unit-level offset walk)."""
    src = str(tmp_path / "src")
    loc = str(tmp_path / "loc")
    os.makedirs(src)
    _write_csv(src, "a.csv", [(1, "x")])
    _write_csv(src, "b.csv", [(2, "y")])
    _write_csv(src, "c.csv", [(3, "z", 1.5)], header=("id", "name", "w"))

    schema = (
        spark.readStream.format("cloudFiles")
        .option("cloudFiles.format", "csv")
        .option("cloudFiles.schemaLocation", loc)
        .load(src)
        .schema
    )
    r = CloudFilesStreamReader(
        src,
        schema,
        {
            "cloudfiles.format": "csv",
            "cloudfiles.schemalocation": loc,
            "cloudfiles.schemaevolutionmode": "failOnNewColumns",
            "cloudfiles.maxfilespertrigger": "1",
        },
    )
    assert r.initialOffset() == {"seq": 0}
    assert r.latestOffset() == {"seq": 1}  # first trigger bounded
    r.commit({"seq": 1})
    assert r.latestOffset() == {"seq": 2}
    r.commit({"seq": 2})
    assert r.latestOffset() == {"seq": 3}
    # c.csv carries an unknown column: refuse, schema NOT widened
    with pytest.raises(ValueError, match="failOnNewColumns"):
        r.partitions({"seq": 2}, {"seq": 3})
    assert not any(
        f.startswith("schema_1") for f in os.listdir(loc)
    )

    # none: unknown columns are ignored at read
    r2 = CloudFilesStreamReader(
        src,
        schema,
        {
            "cloudfiles.format": "csv",
            "cloudfiles.schemalocation": loc,
            "cloudfiles.schemaevolutionmode": "none",
        },
    )
    parts = r2.partitions({"seq": 2}, {"seq": 3})
    rows = []
    for b in r2.read(parts[0]):
        rows.extend(b.to_pylist())
    assert [(x["id"], x["name"]) for x in rows] == [(3, "z")]
    assert "w" not in rows[0]


def test_json_format_and_ledger_stability(spark, tmp_path):
    """cloudFiles.format=json; the ledger assigns permanent sequence
    numbers, so a file that SORTS before an already-processed one is
    still delivered (a plain sorted-listing offset would skip it)."""
    src = str(tmp_path / "src")
    loc = str(tmp_path / "loc")
    os.makedirs(src)
    with open(os.path.join(src, "zz.json"), "w") as f:
        f.write(json.dumps({"id": 1, "v": "a"}) + "\n")
    schema = (
        spark.readStream.format("cloudFiles")
        .option("cloudFiles.format", "json")
        .option("cloudFiles.schemaLocation", loc)
        .load(src)
        .schema
    )
    r = CloudFilesStreamReader(
        src,
        schema,
        {"cloudfiles.format": "json", "cloudfiles.schemalocation": loc},
    )
    assert r.latestOffset() == {"seq": 1}
    # a lexically-EARLIER file arrives later; mtime also earlier (the
    # pathological reordering case)
    p2 = os.path.join(src, "aa.json")
    with open(p2, "w") as f:
        f.write(json.dumps({"id": 2, "v": "b"}) + "\n")
    os.utime(p2, (0, 0))
    assert r.latestOffset() == {"seq": 2}
    parts = r.partitions({"seq": 1}, {"seq": 2})
    rows = []
    for b in r.read(parts[0]):
        rows.extend(b.to_pylist())
    assert [(x["id"], x["v"]) for x in rows] == [(2, "b")]
