"""File-based streaming CSV source with lineage columns.

OSS substitute for Databricks Auto Loader (reference
db_notebooks/01_bronze_csv_to_delta.py:33-44, S1/S2/S3/S4): Structured
Streaming's file source discovers new files incrementally (state in the
checkpoint), the schema comes from the explicit contract registry instead
of inference, and lineage columns are stamped per row:

- ingestion_ts: processing-time version column driving dedup-latest and
  merge guards downstream (01:42). Injectable clock for deterministic
  tests (SURVEY §7 risk 1 — current_timestamp is run-dependent).
- source_file: from the _metadata.file_path pseudo-column (01:43) — the
  bronze idempotency key.

Schema evolution stance: additive evolution is handled by the contract
registry (new nullable columns appended to the contract read as NULL for
old files); the stream never infers.
"""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def discover_tables(landing_dir: str) -> list[str]:
    """Dynamic table discovery: each subdirectory of the landing zone is a
    table (reference 01:16 — dbutils.fs.ls replaced by the filesystem)."""
    return sorted(
        d for d in os.listdir(landing_dir)
        if os.path.isdir(os.path.join(landing_dir, d))
    )


def _with_lineage(df: DataFrame, clock: datetime | None) -> DataFrame:
    ts = F.lit(clock).cast("timestamp") if clock else F.current_timestamp()
    return df.withColumn("ingestion_ts", ts).withColumn(
        "source_file", F.col("_metadata.file_path")
    )


def bronze_csv_stream(
    spark: SparkSession,
    landing_dir: str,
    table: str,
    schema: T.StructType,
    clock: datetime | None = None,
) -> DataFrame:
    """Streaming CSV reader for one landing table (S1)."""
    raw = (
        spark.readStream.format("csv")
        .option("header", True)
        # verify header NAMES against the contract instead of binding
        # columns positionally: with the default enforceSchema=true a
        # reordered export would silently load values into the wrong
        # columns (r4 review); with this off, Spark checks the header
        # and fails fast on a mismatched layout
        .option("enforceSchema", False)
        .schema(schema)
        .load(os.path.join(landing_dir, table))
    )
    return _with_lineage(raw, clock)
