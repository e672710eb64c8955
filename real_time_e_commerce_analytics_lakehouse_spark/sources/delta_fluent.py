"""Fluent ``DeltaTable`` facade over the foreign-Delta DML layer — the
``delta.tables`` API shape the reference's silver notebooks are written
against (db_notebooks/02_bronze_to_silver.py:9,65-87: ``DeltaTable
.forPath(spark, path).alias("target").merge(src.alias("source"),
"target.k = source.k").whenMatchedUpdate(condition=..., set=...)
.whenNotMatchedInsertAll().execute()``), served without delta-spark:
swap the import line

    from delta.tables import DeltaTable

for

    from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_fluent import DeltaTable

and the notebook's merge / delete / update / isDeltaTable / toDF blocks
run unchanged against any plain `_delta_log` table. Execution is
sources/delta_dml's file-pruned copy-on-write (only files containing
condition-passing matches rewrite; cdc actions emitted when the table
enables CDF).

Supported clause matrix — exactly the reference's usage plus the
obvious neighbors; anything else refuses loudly rather than
approximating: one ``whenMatchedUpdate(condition=?, set=?)`` OR
``whenMatchedUpdateAll(condition=?)``, plus one
``whenNotMatchedInsertAll()``; ``delete(condition)``;
``update(condition, set)``; ``vacuum(retentionHours)``;
``optimizeCompaction()`` / ``history()`` conveniences."""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from real_time_e_commerce_analytics_lakehouse_spark.sources import delta_dml
from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
    _DELTA_DIR,
    read_delta_log,
)


class DeltaMergeBuilder:
    def __init__(self, table: "DeltaTable", source: DataFrame, condition: str):
        self._table = table
        self._source = source
        self._condition = condition
        self._matched: dict[str, Any] | None = None
        self._insert_all = False
        self._by_source: dict[str, Any] | None = None

    def _one_matched(self) -> None:
        if self._matched is not None:
            raise NotImplementedError(
                "only one whenMatched clause is supported (the "
                "reference uses exactly one)"
            )

    def whenMatchedUpdate(
        self, condition: str | None = None, set: dict[str, str] | None = None
    ) -> "DeltaMergeBuilder":
        self._one_matched()
        if not set:
            raise ValueError("whenMatchedUpdate requires set={...}")
        self._matched = {"condition": condition, "set": dict(set)}
        return self

    def whenMatchedUpdateAll(
        self, condition: str | None = None
    ) -> "DeltaMergeBuilder":
        self._one_matched()
        self._matched = {"condition": condition, "set": None}
        return self

    def whenMatchedDelete(
        self, condition: str | None = None
    ) -> "DeltaMergeBuilder":
        """Delete matched target rows (optionally condition-gated) —
        WHEN MATCHED THEN DELETE."""
        self._one_matched()
        self._matched = {"condition": condition, "delete": True}
        return self

    def whenNotMatchedInsertAll(self) -> "DeltaMergeBuilder":
        self._insert_all = True
        return self

    def _one_by_source(self) -> None:
        if self._by_source is not None:
            raise NotImplementedError(
                "only one whenNotMatchedBySource clause is supported"
            )

    def whenNotMatchedBySourceDelete(
        self, condition: str | None = None
    ) -> "DeltaMergeBuilder":
        """Delete target rows no source row matches (optionally gated
        by a condition over the target alias) — delta-spark's
        whenNotMatchedBySourceDelete / SQL's WHEN NOT MATCHED BY
        SOURCE THEN DELETE."""
        self._one_by_source()
        self._by_source = {"delete": True, "condition": condition}
        return self

    def whenNotMatchedBySourceUpdate(
        self, condition: str | None = None, set: dict[str, str] | None = None
    ) -> "DeltaMergeBuilder":
        """Update target rows no source row matches (exprs over the
        target row only)."""
        self._one_by_source()
        if not set:
            raise ValueError(
                "whenNotMatchedBySourceUpdate requires set={...}"
            )
        self._by_source = {
            "delete": False, "condition": condition, "set": dict(set)
        }
        return self

    def execute(self) -> dict:
        m = self._matched
        bs = self._by_source
        return delta_dml.merge_delta(
            self._table._spark,
            self._table._path,
            self._source,
            condition=self._condition,
            insert_only=(m is None),
            matched_condition=m["condition"] if m else None,
            set_exprs=m.get("set") if m else None,
            matched_delete=bool(m and m.get("delete")),
            target_alias=self._table._alias,
            insert_when_not_matched=self._insert_all,
            not_matched_by_source_delete=(
                (bs["condition"] if bs["condition"] is not None else True)
                if bs is not None and bs["delete"]
                else False
            ),
            not_matched_by_source_set=(
                bs["set"] if bs is not None and not bs["delete"] else None
            ),
            not_matched_by_source_condition=(
                bs["condition"]
                if bs is not None and not bs["delete"]
                else None
            ),
        )


class DeltaTable:
    """Path-addressed Delta table handle (``forPath``), mirroring the
    delta.tables surface the reference uses."""

    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self._path = path
        self._alias = "t"

    # ------------------------------------------------------- constructors
    @classmethod
    def forPath(cls, spark: SparkSession, path: str) -> "DeltaTable":
        if not cls.isDeltaTable(spark, path):
            raise ValueError(f"{path} is not a Delta table (no _delta_log)")
        return cls(spark, path)

    @classmethod
    def create(cls, spark: SparkSession) -> "DeltaTableBuilder":
        """delta-spark's ``DeltaTable.create(spark)`` builder:
        ``.location(p).addColumn(...).partitionedBy(...).property(k,v)
        .clusterBy(...).execute()``. Identity columns via
        ``addColumn(name, 'bigint', generatedAlwaysAs=
        IdentityGenerator(start, step))`` (or
        ``generatedByDefaultAs=``); generated columns via a SQL string
        ``generatedAlwaysAs='expr'``."""
        return DeltaTableBuilder(spark)

    @staticmethod
    def isDeltaTable(spark: SparkSession, path: str) -> bool:
        log = os.path.join(path, _DELTA_DIR)
        try:
            return any(
                f.endswith(".json") or f.endswith(".checkpoint.parquet")
                for f in os.listdir(log)
            )
        except OSError:
            return False

    # ------------------------------------------------------------- verbs
    def alias(self, name: str) -> "DeltaTable":
        out = DeltaTable(self._spark, self._path)
        out._alias = name
        return out

    def toDF(self) -> DataFrame:
        return read_delta_log(self._spark, self._path)

    def merge(self, source: DataFrame, condition: str) -> DeltaMergeBuilder:
        return DeltaMergeBuilder(self, source, condition)

    def delete(self, condition: str | None = None) -> dict:
        return delta_dml.delete_delta(
            self._spark, self._path, condition if condition else "true"
        )

    def update(self, condition: str, set: dict[str, str]) -> dict:
        return delta_dml.update_delta(self._spark, self._path, condition, set)

    def vacuum(self, retentionHours: float = 168.0) -> list[str]:
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            vacuum_delta,
        )

        return vacuum_delta(self._path, retention_hours=retentionHours)

    def optimizeCompaction(self, zorder_by: list[str] | None = None) -> dict:
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            optimize_delta,
        )

        return optimize_delta(self._spark, self._path, zorder_by=zorder_by)

    def restoreToVersion(self, version: int) -> int:
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            restore_delta,
        )

        return restore_delta(self._path, version)

    def restoreToTimestamp(self, timestamp: "str | int") -> int:
        """RESTORE ... TIMESTAMP AS OF — ISO-8601 string (UTC unless an
        offset is given, delta-spark's convention) or epoch millis."""
        from datetime import datetime, timezone

        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            restore_delta_to_timestamp,
        )

        if isinstance(timestamp, str):
            dt = datetime.fromisoformat(timestamp)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            ts_ms = int(dt.timestamp() * 1000)
        else:
            ts_ms = int(timestamp)
        return restore_delta_to_timestamp(self._path, ts_ms)

    def detail(self) -> DataFrame:
        """DESCRIBE DETAIL: one row of table facts (format, id,
        location, partitionColumns, numFiles, sizeInBytes, properties,
        protocol versions) from the current snapshot."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            DeltaSnapshot,
        )

        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            clustering_columns,
        )

        snap = DeltaSnapshot(self._path)
        proto = snap.protocol or {}
        row = {
            "format": "delta",
            "id": getattr(snap, "meta_id", None),
            "location": os.path.abspath(self._path),
            "partitionColumns": list(snap.partition_cols),
            "clusteringColumns": clustering_columns(snap),
            "numFiles": len(snap.files),
            "sizeInBytes": sum(
                os.path.getsize(os.path.join(self._path, rel))
                for rel in snap.files
            ),
            "properties": dict(snap.configuration),
            "minReaderVersion": int(proto.get("minReaderVersion", 1)),
            "minWriterVersion": int(proto.get("minWriterVersion", 2)),
        }
        return self._spark.createDataFrame(
            [row],
            "format string, id string, location string, "
            "partitionColumns array<string>, "
            "clusteringColumns array<string>, numFiles long, "
            "sizeInBytes long, properties map<string,string>, "
            "minReaderVersion int, minWriterVersion int",
        )

    def addColumns(self, ddl: str) -> int:
        """ALTER TABLE ADD COLUMNS — metadata-only; old files
        null-fill."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            alter_delta_schema,
        )

        return alter_delta_schema(self._path, add=ddl)

    def renameColumn(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only; requires column
        mapping (upstream's rule)."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            alter_delta_schema,
        )

        return alter_delta_schema(self._path, rename={old: new})

    def dropColumns(self, *columns: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only; requires column
        mapping (the physical data stays, invisible)."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            alter_delta_schema,
        )

        return alter_delta_schema(self._path, drop=list(columns))

    def clusterBy(self, *columns: str) -> int:
        """ALTER TABLE ... CLUSTER BY (liquid clustering); pass no
        columns for CLUSTER BY NONE. OPTIMIZE re-clusters on these by
        default."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            cluster_by_delta,
        )

        return cluster_by_delta(self._path, list(columns))

    def upgradeTableProtocol(
        self, readerVersion: int, writerVersion: int
    ) -> int:
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            upgrade_delta_protocol,
        )

        return upgrade_delta_protocol(
            self._path, readerVersion, writerVersion
        )

    def setProperties(self, properties: dict[str, str]) -> int:
        """ALTER TABLE SET TBLPROPERTIES (auto-raises the protocol
        floor a property requires; 'delta.columnMapping.mode'='name'
        performs the mapping upgrade)."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            alter_delta_properties,
        )

        return alter_delta_properties(self._path, set_props=properties)

    def unsetProperties(self, keys: list[str]) -> int:
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            alter_delta_properties,
        )

        return alter_delta_properties(self._path, unset=keys)

    def generate(self, mode: str) -> list[str]:
        """``GENERATE symlink_format_manifest`` (the only mode, same
        as upstream)."""
        if mode != "symlink_format_manifest":
            raise ValueError(f"unknown generate mode {mode!r}")
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            generate_symlink_manifest,
        )

        return generate_symlink_manifest(self._path)

    @classmethod
    def convertToDelta(
        cls,
        spark: SparkSession,
        identifier: str,
        partition_schema: "str | None" = None,
    ) -> "DeltaTable":
        """``CONVERT TO DELTA parquet.`/path``` — in-place conversion
        of a plain (optionally Hive-partitioned) parquet directory;
        partitioned layouts require ``partition_schema`` (upstream's
        exact contract)."""
        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            convert_parquet_to_delta,
        )

        ident = identifier.strip()
        if ident.lower().startswith("parquet."):
            ident = ident[len("parquet."):]
        path = ident.strip("`")
        convert_parquet_to_delta(spark, path, partition_schema)
        return cls.forPath(spark, path)

    def history(self) -> DataFrame:
        """One row per commit: version, timestamp, operation,
        operationParameters — from commitInfo actions."""
        import json as _json

        from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
            _commit_file,
        )

        log = os.path.join(self._path, _DELTA_DIR)
        rows = []
        for fn in sorted(os.listdir(log)):
            if not (
                fn.endswith(".json")
                and fn.split(".")[0].isdigit()
                and len(fn.split(".")) == 2
            ):
                continue
            v = int(fn.split(".")[0])
            op, ts, params, metrics = None, None, None, None
            with open(_commit_file(self._path, v)) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    a = _json.loads(line)
                    if a.get("commitInfo"):
                        ci = a["commitInfo"]
                        op = ci.get("operation")
                        ts = ci.get("timestamp")
                        params = _json.dumps(
                            ci.get("operationParameters") or {}
                        )
                        metrics = {
                            str(k): str(x)
                            for k, x in (
                                ci.get("operationMetrics") or {}
                            ).items()
                        }
            rows.append((v, ts, op, params, metrics))
        return self._spark.createDataFrame(
            rows,
            "version long, timestamp long, operation string, "
            "operationParameters string, "
            "operationMetrics map<string,string>",
        )


class IdentityGenerator:
    """delta-spark's identity spec for ``DeltaTableBuilder.addColumn``:
    ``generatedAlwaysAs=IdentityGenerator(start, step)`` (GENERATED
    ALWAYS) or ``generatedByDefaultAs=`` (explicit inserts allowed,
    water mark syncs)."""

    def __init__(self, start: int = 1, step: int = 1):
        if step == 0:
            raise ValueError("identity step cannot be 0")
        self.start = int(start)
        self.step = int(step)


class DeltaTableBuilder:
    """``DeltaTable.create(spark)`` -> CREATE TABLE builder over
    delta_dml.create_delta_table: columns (plain / GENERATED ALWAYS AS
    expr / IDENTITY), partitioning, properties, liquid clustering."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._location: str | None = None
        self._cols: list[tuple[str, str, bool]] = []
        self._identity: dict[str, dict] = {}
        self._generated: dict[str, str] = {}
        self._partition: list[str] = []
        self._cluster: list[str] = []
        self._props: dict[str, str] = {}

    def location(self, path: str) -> "DeltaTableBuilder":
        self._location = path
        return self

    def addColumn(
        self,
        colName: str,
        dataType: str,
        nullable: bool = True,
        generatedAlwaysAs: "str | IdentityGenerator | None" = None,
        generatedByDefaultAs: "IdentityGenerator | None" = None,
    ) -> "DeltaTableBuilder":
        if generatedAlwaysAs is not None and generatedByDefaultAs is not None:
            raise ValueError(
                "a column is GENERATED ALWAYS or BY DEFAULT, not both"
            )
        self._cols.append((colName, dataType, nullable))
        if isinstance(generatedAlwaysAs, IdentityGenerator):
            self._identity[colName] = {
                "start": generatedAlwaysAs.start,
                "step": generatedAlwaysAs.step,
                "allow_explicit_insert": False,
            }
        elif isinstance(generatedAlwaysAs, str):
            self._generated[colName] = generatedAlwaysAs
        if generatedByDefaultAs is not None:
            self._identity[colName] = {
                "start": generatedByDefaultAs.start,
                "step": generatedByDefaultAs.step,
                "allow_explicit_insert": True,
            }
        return self

    def partitionedBy(self, *cols: str) -> "DeltaTableBuilder":
        self._partition = list(cols)
        return self

    def clusterBy(self, *cols: str) -> "DeltaTableBuilder":
        self._cluster = list(cols)
        return self

    def property(self, key: str, value: str) -> "DeltaTableBuilder":
        self._props[key] = str(value)
        return self

    def execute(self) -> "DeltaTable":
        if self._location is None:
            raise ValueError("call .location(path) before .execute()")
        if not self._cols:
            raise ValueError("add at least one column")
        if self._partition and self._cluster:
            raise ValueError(
                "a table partitions OR clusters, not both (upstream "
                "contract)"
            )
        ddl = ", ".join(
            f"`{n}` {t}" for n, t, _nullable in self._cols
        )
        delta_dml.create_delta_table(
            self._location,
            ddl,
            partition_by=self._partition,
            identity=self._identity or None,
            configuration=self._props or None,
            generated=self._generated or None,
        )
        if self._cluster:
            from real_time_e_commerce_analytics_lakehouse_spark.sources.delta_log import (
                cluster_by_delta,
            )

            cluster_by_delta(self._location, self._cluster)
        return DeltaTable(self._spark, self._location)
