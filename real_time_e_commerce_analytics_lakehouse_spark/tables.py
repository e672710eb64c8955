"""LakeTable: parquet-backed tables with lakehouse transaction semantics.

The reference stores everything in Delta Lake (SURVEY §2.1 S5-S13:
batch/stream read, overwrite/append write, three MERGE flavors,
exists-probe). delta-spark is not installable in this environment, so the
engine provides the same *contract* on plain parquet with a tiny
manifest log — design borrowed from the published lakehouse-format idea
(an ordered log of atomic metadata commits over immutable data files),
implemented from scratch:

    <path>/
      _log/00000001.json   <- manifest: list of data units (+ lineage)
      _log/00000002.json
      data/<uuid>/...      <- immutable parquet dirs, one per commit unit

- Readers resolve the highest manifest and read exactly the files it
  lists — writers never mutate visible data, so reads are snapshot-
  isolated; old manifests give time travel (`read(version=N)`).
- Commits are atomic: write the new manifest to a temp name, then
  os.rename into place (atomic on POSIX); exclusive-create failure
  detects a concurrent writer (single-writer optimistic model, like
  Delta's protocol but without retry logic).
- MERGE is implemented as join + rewrite. For partitioned tables the
  rewrite touches ONLY the partitions present in the source batch —
  the `replaceWhere`-style incremental pattern that keeps merge cost
  proportional to the update, not the table (SURVEY §7 risk 4; at
  100 TB facts are date-partitioned and a daily batch rewrites a few
  partitions out of thousands).
- `compact()` is the OPTIMIZE analog: collapses accumulated small
  commit units into one (small-file compaction is what keeps scan
  parallelism healthy under streaming append workloads).

Reference-parity map:
- S5/S6 read            -> LakeTable.read / as streaming source via parquet dir
- S7 overwrite          -> LakeTable.overwrite
- S8 append             -> LakeTable.append
- S9 insert-only merge  -> LakeTable.merge_insert_only (file/key idempotency)
- S10 conditional upsert-> LakeTable.merge_upsert(guard_col=...) (late-data guard)
- S11 unconditional     -> LakeTable.merge_upsert(guard_col=None)
- S12 composite keys    -> keys=[...]
- S13 exists probe      -> LakeTable.exists()
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_DIR = "_log"
_DATA_DIR = "data"


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


@dataclass
class _Unit:
    """One immutable data unit (a parquet directory) plus its partition
    values and their Spark types (empty for unpartitioned units)."""

    path: str
    partition: dict[str, str] = field(default_factory=dict)
    partition_types: dict[str, str] = field(default_factory=dict)

    def to_json(self) -> dict:
        return {
            "path": self.path,
            "partition": self.partition,
            "partition_types": self.partition_types,
        }

    @staticmethod
    def from_json(d: dict) -> "_Unit":
        return _Unit(
            path=d["path"],
            partition=dict(d.get("partition", {})),
            partition_types=dict(d.get("partition_types", {})),
        )


class ConcurrentWriteError(RuntimeError):
    pass


class LakeTable:
    """A manifest-logged parquet table. All operations are atomic commits."""

    def __init__(self, spark: SparkSession, path: str, partition_by: Sequence[str] = ()):
        self.spark = spark
        self.path = path
        self.partition_by = list(partition_by)

    # ------------------------------------------------------------------ log

    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG_DIR)

    def _manifest_file(self, version: int) -> str:
        return os.path.join(self._log_path(), f"{version:08d}.json")

    def latest_version(self) -> int | None:
        log = self._log_path()
        if not os.path.isdir(log):
            return None
        versions = [
            int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json")
        ]
        return max(versions) if versions else None

    def exists(self) -> bool:
        """S13 table-exists probe (DeltaTable.isDeltaTable analog)."""
        return self.latest_version() is not None

    def _read_manifest(self, version: int) -> list[_Unit]:
        with open(self._manifest_file(version)) as f:
            doc = json.load(f)
        return [_Unit.from_json(u) for u in doc["units"]]

    def _commit(self, units: list[_Unit], op: str) -> int:
        os.makedirs(self._log_path(), exist_ok=True)
        current = self.latest_version()
        new_version = (current or 0) + 1
        doc = {
            "version": new_version,
            "operation": op,
            "partition_by": self.partition_by,
            "units": [u.to_json() for u in units],
        }
        tmp = self._manifest_file(new_version) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        target = self._manifest_file(new_version)
        try:
            # os.link is atomic-exclusive: it FAILS if target exists,
            # unlike os.rename which silently replaces it — the losing
            # writer of a race must error, not clobber the winner.
            os.link(tmp, target)
        except FileExistsError:
            raise ConcurrentWriteError(
                f"version {new_version} already committed by another writer"
            ) from None
        finally:
            os.remove(tmp)
        return new_version

    # ----------------------------------------------------------------- data

    def _write_units(self, df: DataFrame) -> list[_Unit]:
        """Write df into a fresh immutable dir; one unit per partition
        value when partitioned (enables partition-scoped replace)."""
        dirname = os.path.join(self.path, _DATA_DIR, uuid.uuid4().hex)
        if not self.partition_by:
            df.write.mode("errorifexists").parquet(dirname)
            return [_Unit(path=os.path.relpath(dirname, self.path))]
        df.write.mode("errorifexists").partitionBy(*self.partition_by).parquet(dirname)
        ptypes = {
            f_.name: f_.dataType.simpleString()
            for f_ in df.schema.fields
            if f_.name in self.partition_by
        }
        units = []
        for root, dirs, files in os.walk(dirname):
            if any(f.endswith(".parquet") for f in files):
                rel = os.path.relpath(root, dirname)
                partition: dict[str, str] = {}
                for seg in rel.split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        partition[k] = v
                units.append(
                    _Unit(
                        path=os.path.relpath(root, self.path),
                        partition=partition,
                        partition_types=ptypes,
                    )
                )
        return units

    def _read_units(self, units: list[_Unit]) -> DataFrame:
        if not units:
            raise ValueError(f"table {self.path} has an empty snapshot")
        frames = []
        for u in units:
            df = self.spark.read.parquet(os.path.join(self.path, u.path))
            for col, val in u.partition.items():
                # partition value travels in the dir name; restore typed
                typ = u.partition_types.get(col, "string")
                lit = F.lit(None) if val == _HIVE_NULL else F.lit(val)
                df = df.withColumn(col, lit.cast(typ))
            frames.append(df)
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_, allowMissingColumns=True)
        return out

    # ------------------------------------------------------------------ api

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (S5). `version` = time travel."""
        v = version if version is not None else self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no table at {self.path}")
        return self._read_units(self._read_manifest(v))

    def read_changes(self, since_version: int | None) -> DataFrame | None:
        """Incremental change read (S6, Delta streaming-source analog):
        rows in data units added AFTER `since_version`. Exact CDC for
        append-only tables (bronze); consumers track their last-seen
        version (streaming/pipeline.IncrementalRunner). Returns None when
        there is nothing new."""
        latest = self.latest_version()
        if latest is None or (since_version is not None and latest <= since_version):
            return None
        old_paths = (
            {u.path for u in self._read_manifest(since_version)}
            if since_version
            else set()
        )
        new_units = [
            u for u in self._read_manifest(latest) if u.path not in old_paths
        ]
        if not new_units:
            return None
        return self._read_units(new_units)

    def overwrite(self, df: DataFrame) -> int:
        """Full-refresh write (S7; reference metrics marts 07:72-78)."""
        return self._commit(self._write_units(df), op="overwrite")

    def append(self, df: DataFrame) -> int:
        """Append commit (S8). Old units stay; new units are added — no
        rewrite, which is what makes streaming ingest cheap."""
        current = self._read_manifest(v) if (v := self.latest_version()) else []
        return self._commit(current + self._write_units(df), op="append")

    def create_if_absent(self, df: DataFrame) -> int | None:
        """S13 create-on-first-write guard."""
        if self.exists():
            return None
        return self.overwrite(df)

    def compact(self) -> int:
        """OPTIMIZE analog: rewrite the current snapshot as one unit set."""
        df = self.read()
        return self._commit(self._write_units(df), op="compact")

    # ---------------------------------------------------------------- merge

    def merge_insert_only(self, source: DataFrame, keys: str | Sequence[str]) -> int:
        """S9: insert-only merge — append source rows whose key is absent
        from the target. This is the reference's file-level idempotency
        (01_bronze_csv_to_delta.py:58-68, key = source_file): replaying a
        batch inserts nothing the second time, making an at-least-once
        stream effectively exactly-once. Pure append — no rewrite."""
        ks = [keys] if isinstance(keys, str) else list(keys)
        if not self.exists():
            return self.overwrite(source)
        target = self.read().select(*ks).dropDuplicates(ks)
        fresh = source.join(F.broadcast(target), ks, "left_anti")
        if fresh.isEmpty():
            return self.latest_version()  # nothing new: no commit needed
        current = self._read_manifest(self.latest_version())
        return self._commit(current + self._write_units(fresh), op="merge_insert_only")

    def merge_upsert(
        self,
        source: DataFrame,
        keys: str | Sequence[str],
        guard_col: str | None = None,
    ) -> int:
        """Keyed upsert (S10-S12).

        - matched & (no guard, or source.guard > target.guard): source wins
          (last-writer-wins with a monotonic-version guard — the
          reference's late/out-of-order protection, 02_bronze_to_silver.py:74)
        - matched & guard fails: target kept (stale update dropped)
        - not matched: insert

        Correctness invariant (SURVEY §7 risk 3): multiple source rows per
        key are an error (Delta throws DELTA_MULTIPLE_SOURCE_ROW_MATCHES);
        callers dedup first (operators.dedup.dedup_latest). Enforced here.

        Partitioned tables rewrite ONLY partitions present in the source
        (incremental MERGE at scale); untouched partitions' units carry
        over into the new manifest unchanged.
        """
        ks = [keys] if isinstance(keys, str) else list(keys)
        if not self.exists():
            return self.overwrite(source)

        # enforce the dedup-before-merge invariant
        dup = source.groupBy(*ks).count().filter(F.col("count") > 1)
        if not dup.isEmpty():
            sample = [r.asDict() for r in dup.limit(3).collect()]
            raise ValueError(
                f"merge source has multiple rows per key {ks}: {sample}; "
                "dedup first (operators.dedup.dedup_latest)"
            )

        current_units = self._read_manifest(self.latest_version())
        if self.partition_by:
            # restrict the rewrite to partitions present in the source
            src_parts = {
                tuple(str(r[c]) for c in self.partition_by)
                for r in source.select(*self.partition_by).distinct().collect()
            }
            touched = [
                u
                for u in current_units
                if tuple(u.partition.get(c) for c in self.partition_by) in src_parts
            ]
            untouched = [u for u in current_units if u not in touched]
            target = (
                self._read_units(touched)
                if touched
                else self.read().limit(0)
            )
        else:
            untouched = []
            target = self._read_units(current_units)

        merged = _merge_dataframes(target, source, ks, guard_col)
        new_units = self._write_units(merged)
        return self._commit(untouched + new_units, op="merge_upsert")


def _merge_dataframes(
    target: DataFrame, source: DataFrame, keys: list[str], guard_col: str | None
) -> DataFrame:
    """Join-based MERGE: per-column conditional select. Runs as one
    shuffle join on the keys (sort-merge or broadcast per Catalyst/AQE)."""
    cols = target.columns
    src_cols = source.columns
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else (cond & c)

    matched = F.col(f"s.{keys[0]}").isNotNull() if keys else F.lit(False)
    if guard_col is not None:
        source_wins = matched & (
            F.col(f"s.{guard_col}") > F.col(f"t.{guard_col}")
        )
    else:
        source_wins = matched

    joined = t.join(s, cond, "left")
    updated = joined.select(
        *[
            F.when(
                source_wins, F.col(f"s.{c}") if c in src_cols else F.col(f"t.{c}")
            )
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in cols
        ]
    )
    inserts = s.join(t, cond, "left_anti").select(
        *[
            (F.col(c) if c in src_cols else F.lit(None)).alias(c)
            for c in cols
        ]
    )
    return updated.unionByName(inserts)
