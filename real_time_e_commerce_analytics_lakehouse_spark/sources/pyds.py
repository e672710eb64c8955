"""LakeTable as a native Spark format via the Spark 4 Python DataSource
API: ``spark.read.format("laketable").option("version", 3).load(path)``.

This makes the engine's table layer consumable by ANY Spark job without
importing the engine — the reader walks the manifest on the driver,
prunes data units/files with the same metadata the JVM path uses
(partition values, per-unit AND per-file [min,max] stats), and streams
Arrow record batches from the parquet files on executors. Supported
through the format: snapshot + ``version`` time travel, Hive-escaped /
NULL partition values, column mapping (logical renames over stable
physical names), additive schema evolution (missing columns read NULL),
and merge-on-read deletion vectors (tombstoned rows filtered by file +
row index during the scan).

Filter pushdown (Spark 4.1 ``pushFilters``): comparison/equality/IN/
IS NULL predicates on partition columns prune whole units; range
predicates on stats columns prune units and then files inside surviving
units. All filters are returned as "still needs Spark" — pruning is a
strict subset operation, so double-application is safe and exactness is
never at risk.

The JVM scan path (``LakeTable.read``) remains the performance path —
whole-stage codegen, vectorized reader, DV anti-join in the plan. This
source is the interop path: at 100 TB its per-FILE input partitions
parallelize across executors like any file source, with batch-level
Arrow transfer (no per-row Python serde).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import date, datetime
from typing import Any, Iterator
from urllib.parse import unquote, urlparse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

# mirrored from tables.py (this module stays importable on executors
# without pulling the Spark-session-coupled table layer)
_LOG_DIR = "_log"
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _unescape_hive(raw: str) -> str:
    return raw if raw == _HIVE_NULL else unquote(raw)


def _utc_now_iso() -> str:
    """committed_at for writer manifests — tables.py's TIMESTAMP AS OF
    resolution and vacuum(retain_hours) index this field on EVERY
    manifest (r5 review: pyds-written commits used to omit it, making
    both crash with KeyError on mixed-writer tables)."""
    from datetime import timezone

    return datetime.now(timezone.utc).isoformat()


def _fs_path(path: str) -> str:
    """Normalize a table location to a filesystem path: the SQL surface
    (CREATE TABLE ... USING laketable) hands the reader a `file:` URI,
    the DataFrame surface a plain path."""
    if path.startswith("file:"):
        return unquote(urlparse(path).path)
    return path


def _parse_partition_value(
    raw: str, spark_type: str, *, unescape: bool = True
) -> Any:
    """Typed python value of a manifest partition string (None for the
    Hive NULL sentinel). ``unescape=False`` for CANONICAL Delta
    ``add.partitionValues`` — those are already logical strings, and
    percent-unquoting them corrupts any value containing a literal
    %XX sequence, e.g. '50%2Boff' -> '50+off' (ADVICE r8 #4; this
    module's Hive-layout manifests DO escape and need the unquote)."""
    if raw == _HIVE_NULL:
        return None
    if unescape:
        raw = _unescape_hive(raw)
    t = spark_type.lower()
    if t in ("int", "bigint", "long", "smallint", "tinyint"):
        return int(raw)
    if t in ("double", "float"):
        return float(raw)
    if t == "date":
        return date.fromisoformat(raw)
    if t.startswith("timestamp"):
        return datetime.fromisoformat(raw)
    if t == "boolean":
        return raw.lower() == "true"
    return raw


def _arrow_ddl(t) -> str:
    """Spark DDL type name for an arrow type (file-schema inference)."""
    import pyarrow as pa

    if pa.types.is_int64(t):
        return "bigint"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "int"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"array<{_arrow_ddl(t.value_type)}>"
    raise ValueError(f"unsupported parquet type for laketable source: {t}")


class _Snapshot:
    """Manifest state at one version, parsed without a SparkSession."""

    def __init__(self, path: str, version: int | None):
        log = os.path.join(path, _LOG_DIR)
        versions = sorted(
            int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json")
        )
        if not versions:
            raise ValueError(f"{path} is not a LakeTable (empty log)")
        self.version = version if version is not None else versions[-1]
        if self.version not in versions:
            raise ValueError(f"version {self.version} not in {path}")
        with open(os.path.join(log, f"{self.version:08d}.json")) as f:
            doc = json.load(f)
        self.root = path
        self.units: list[dict] = doc["units"]
        self.dv: list[str] = list(doc.get("dv", []))
        self.colmap: dict[str, str] = dict(doc.get("column_map", {}))
        self.dropped: list[str] = list(doc.get("column_dropped", []))
        # declared layout, from the manifest document — NOT inferred
        # from unit partition_types (a partitioned table with zero data
        # units would read as unpartitioned, ADVICE r3 #4)
        self.partition_by: list[str] = list(doc.get("partition_by", []))
        self.ptypes: dict[str, str] = {}
        for u in self.units:
            self.ptypes.update(u.get("partition_types", {}))

    def unit_files(self, unit: dict) -> list[str]:
        base = os.path.join(self.root, unit["path"])
        listed = unit.get("file_stats") or {}
        if listed:
            # The manifest records this unit's exact file names — read
            # only those. A zombie/speculative task attempt that lands
            # its parquet after commit-time pruning leaves an
            # unmanifested file a directory walk would double-count.
            return sorted(os.path.join(base, fn) for fn in listed)
        out = []
        for dirpath, _dirs, files in os.walk(base):
            out.extend(
                os.path.join(dirpath, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
        return sorted(out)

    def file_schema_ddl(self) -> str:
        """Merged DDL across units (first file per unit; later units win
        a name collision — additive evolution), with column mapping
        applied (physical -> logical, dropped removed) and partition
        columns appended."""
        import pyarrow.parquet as pq

        fields: dict[str, str] = {}
        for u in self.units:
            files = self.unit_files(u)
            if not files:
                continue
            for f_ in pq.read_schema(files[0]):
                fields[f_.name] = _arrow_ddl(f_.type)
        inv = {p: l for l, p in self.colmap.items()}
        cols = [
            f"`{inv.get(name, name)}` {ddl}"
            for name, ddl in fields.items()
            if name not in self.dropped
        ]
        # partition columns from unit metadata; a DECLARED partition
        # column with no data unit yet (partition_by is manifest truth,
        # r3 ADVICE #4) still appears, typed string — the Hive
        # convention for inferred partitions — so a zero-unit
        # partitioned table reads as an empty frame with its declared
        # layout instead of failing on an empty DDL
        ptypes = dict(self.ptypes)
        for c in self.partition_by:
            ptypes.setdefault(c, "string")
        cols += [f"`{c}` {t}" for c, t in ptypes.items()]
        return ", ".join(cols)

    def tombstones(self) -> dict[str, set]:
        """{absolute file path: {row indices}} from the active deletion
        vectors (merge-on-read)."""
        import pyarrow.parquet as pq

        out: dict[str, set] = {}
        for rel in self.dv:
            base = os.path.join(self.root, rel)
            for dirpath, _dirs, files in os.walk(base):
                for f in files:
                    if not f.endswith(".parquet") or f.startswith(("_", ".")):
                        continue
                    t = pq.read_table(os.path.join(dirpath, f), columns=["fp", "ri"])
                    for fp, ri in zip(
                        t.column("fp").to_pylist(), t.column("ri").to_pylist()
                    ):
                        p = unquote(urlparse(fp).path)
                        out.setdefault(p, set()).add(ri)
        return out


@dataclass
class _FileSlice(InputPartition):
    """One parquet file plus its unit's partition values and the
    tombstoned row indices inside it. Picklable by construction.

    `meta` (streaming only): the batch's OWN decode metadata —
    ((colmap items), (dropped cols), (ptypes items)) — resolved once on
    the driver at planning time, so executors neither re-parse the
    manifest log per partition nor decode an already-planned batch with
    metadata from a commit that landed after planning (e.g. a rename)."""

    file: str
    partition: tuple  # ((col, raw_manifest_string), ...)
    tomb: tuple  # sorted tombstoned row indices
    meta: tuple = ()


def _range_may_match(lo: Any, hi: Any, flt: Filter) -> bool:
    """Conservative [lo, hi] intersection test for one filter; True on
    any doubt (incomparable types, unsupported shape)."""
    try:
        if isinstance(flt, EqualTo):
            return not (flt.value < lo or flt.value > hi)
        if isinstance(flt, In):
            return any(not (v < lo or v > hi) for v in flt.value)
        if isinstance(flt, GreaterThan):
            return hi > flt.value
        if isinstance(flt, GreaterThanOrEqual):
            return hi >= flt.value
        if isinstance(flt, LessThan):
            return lo < flt.value
        if isinstance(flt, LessThanOrEqual):
            return lo <= flt.value
    except TypeError:
        return True
    return True


def _value_matches(v: Any, flt: Filter) -> bool:
    """Exact single-value predicate test (partition pruning). NULL
    partition values only satisfy IsNull."""
    if isinstance(flt, IsNull):
        return v is None
    if v is None:
        return False
    if isinstance(flt, IsNotNull):
        return True
    try:
        if isinstance(flt, EqualTo):
            return v == flt.value
        if isinstance(flt, In):
            return v in flt.value
        if isinstance(flt, GreaterThan):
            return v > flt.value
        if isinstance(flt, GreaterThanOrEqual):
            return v >= flt.value
        if isinstance(flt, LessThan):
            return v < flt.value
        if isinstance(flt, LessThanOrEqual):
            return v <= flt.value
    except TypeError:
        return True
    return True


class LakeTableReader(DataSourceReader):
    def __init__(self, path: str, version: int | None, schema: StructType):
        self.snap = _Snapshot(path, version)
        self.schema = schema
        self.filters: list[Filter] = []

    def __getstate__(self):
        """Executors need only the decode metadata (colmap/dropped/
        ptypes); the full parsed manifest — every unit dict with
        per-file stats — is multi-MB at large tables and would be
        pickled into EVERY scan task (r5 review). Planning
        (pushFilters/partitions) runs driver-side before serialization,
        so the stripped snapshot is sufficient on the other side; the
        streaming reader ships the same 3-tuple per slice."""
        from types import SimpleNamespace

        state = self.__dict__.copy()
        snap = state.get("snap")
        if isinstance(snap, _Snapshot):
            state["snap"] = SimpleNamespace(
                colmap=dict(snap.colmap),
                dropped=list(snap.dropped),
                ptypes=dict(snap.ptypes),
            )
        return state

    # filter types _value_matches/_range_may_match understand; anything
    # else (EqualNullSafe, StringContains, Not, ...) must NOT reach the
    # pruners — _value_matches would treat it as a non-match on NULL
    # partitions and wrongly prune live data
    _PRUNABLE = (
        EqualTo, In, GreaterThan, GreaterThanOrEqual,
        LessThan, LessThanOrEqual, IsNull, IsNotNull,
    )

    # -------------------------------------------------------------- plan
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Record single-column predicates for unit/file pruning; report
        EVERY filter as still-needed (pruning is subset-only, so Spark
        re-applying them is correct and cheap). Only known-semantics
        filter types are collected — an unrecognized type must never
        influence pruning."""
        for flt in filters:
            attr = getattr(flt, "attribute", None)
            if (
                isinstance(flt, self._PRUNABLE)
                and attr is not None
                and len(attr) == 1
            ):
                self.filters.append(flt)
            yield flt

    def _unit_survives(self, unit: dict) -> bool:
        part = unit.get("partition", {})
        ptypes = unit.get("partition_types", {})
        stats = unit.get("stats", {})
        for flt in self.filters:
            col = flt.attribute[0]
            if col in part:
                v = _parse_partition_value(part[col], ptypes.get(col, "string"))
                if not _value_matches(v, flt):
                    return False
            phys = self.snap.colmap.get(col, col)
            if phys in stats:
                lo, hi = stats[phys]
                if lo is not None and not _range_may_match(lo, hi, flt):
                    return False
        return True

    def _file_survives(self, unit: dict, fname: str) -> bool:
        fstats = unit.get("file_stats", {}).get(fname, {})
        for flt in self.filters:
            phys = self.snap.colmap.get(flt.attribute[0], flt.attribute[0])
            if phys in fstats:
                lo, hi = fstats[phys]
                if lo is not None and not _range_may_match(lo, hi, flt):
                    return False
        return True

    def partitions(self) -> list[InputPartition]:
        tomb = self.snap.tombstones()
        out: list[InputPartition] = []
        for u in self.snap.units:
            if not self._unit_survives(u):
                continue
            pvals = tuple(sorted(u.get("partition", {}).items()))
            for f in self.snap.unit_files(u):
                if not self._file_survives(u, os.path.basename(f)):
                    continue
                ris = tuple(sorted(tomb.get(os.path.abspath(f), ())))
                out.append(_FileSlice(file=f, partition=pvals, tomb=ris))
        return out

    # -------------------------------------------------------------- scan
    def read(self, partition: _FileSlice) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        t = pq.read_table(partition.file)
        if partition.tomb:
            import numpy as np

            # vectorized survivor mask (a Python per-row loop dominates
            # scan time on multi-million-row files)
            mask = np.ones(t.num_rows, dtype=bool)
            idx = np.fromiter(partition.tomb, dtype=np.int64)
            mask[idx[idx < t.num_rows]] = False
            t = t.filter(pa.array(mask))
        n = t.num_rows
        part = dict(partition.partition)
        inv = {p: l for l, p in self.snap.colmap.items()}
        logical_file_cols = {
            inv.get(c, c): c for c in t.column_names if c not in self.snap.dropped
        }
        arrays, names = [], []
        for field in self.schema.fields:
            pa_type = to_arrow_type(field.dataType)
            if field.name in part or (
                field.name in self.snap.ptypes and field.name not in logical_file_cols
            ):
                v = _parse_partition_value(
                    part.get(field.name, _HIVE_NULL),
                    self.snap.ptypes.get(field.name, "string"),
                )
                arrays.append(pa.array([v] * n, type=pa_type))
            elif field.name in logical_file_cols:
                col = t.column(logical_file_cols[field.name])
                if col.type != pa_type:
                    col = col.cast(pa_type)
                arrays.append(col.combine_chunks())
            else:
                # additive evolution: column absent from this older file
                arrays.append(pa.nulls(n, type=pa_type))
            names.append(field.name)
        yield from pa.Table.from_arrays(arrays, names=names).to_batches()


class LakeTableStreamReader(DataSourceStreamReader):
    """Streaming change feed over a LakeTable: the OFFSET is the
    manifest version, a micro-batch is the data units ADDED between two
    versions (append-only CDC, mirroring ``LakeTable.read_stream`` /
    Delta's streaming source semantics: appends stream; rewriting
    commits must be handled by the maintenance job, not the stream).

    Version offsets make the source replayable and checkpointable for
    free — manifests are immutable, so (start, end] always resolves to
    the same files; a checkpoint resume re-reads nothing (proven in
    tests). Partition columns restore exactly as in the batch reader.

    Trigger.AvailableNow falls back to single-batch execution for
    Python stream sources (Spark logs the fallback); with version
    offsets the semantics coincide — one batch drains everything up to
    the version observed at start."""

    def __init__(
        self,
        path: str,
        schema: StructType,
        max_versions: int | None = None,
        ignore_changes: bool = False,
    ):
        self.path = path
        self.schema = schema
        # maxFilesPerTrigger analog at commit granularity: each batch
        # advances at most this many manifest versions, so a long
        # backlog drains in bounded micro-batches
        self.max_versions = max_versions
        # Delta ignoreChanges parity: rewritten units re-deliver their
        # rows (at-least-once); default False raises on non-append
        # commits instead of silently duplicating the whole rewrite
        self.ignore_changes = ignore_changes

    def _version(self) -> int:
        log = os.path.join(self.path, _LOG_DIR)
        if not os.path.isdir(log):
            return 0
        vs = [int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json")]
        return max(vs) if vs else 0

    def initialOffset(self) -> dict:
        return {"version": 0}

    # Highest end-offset Spark committed THIS run, or None before the
    # first commit. The clamp only engages once known: on a checkpoint
    # restart the true committed offset lives in the checkpoint (not
    # visible here), and clamping below it would regress offsets and
    # re-deliver data — so the first post-(re)start batch is unbounded
    # and every subsequent one is rate-limited.
    _committed: int | None = None

    def latestOffset(self) -> dict:
        v = self._version()
        if self.max_versions is not None and self._committed is not None:
            v = min(v, self._committed + self.max_versions)
        return {"version": v}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        if end["version"] <= start["version"]:
            return []
        new = _Snapshot(self.path, end["version"])
        prev: _Snapshot | None = None
        seen: set[str] = set()
        if start["version"] > 0:
            prev = _Snapshot(self.path, start["version"])
            seen = {u["path"] for u in prev.units}
            removed = seen - {u["path"] for u in new.units}
            if removed and not self.ignore_changes:
                # a non-append commit (merge/compact/overwrite/delete)
                # rewrote already-streamed units; every "new" unit of
                # the rewrite holds historical rows, so continuing
                # would silently re-deliver the whole table (r5
                # review). Same contract as Delta's streaming source:
                # fail unless the consumer opts into at-least-once.
                raise ValueError(
                    "laketable stream: units were rewritten or removed "
                    "by a non-append commit between offsets "
                    f"{start['version']} and {end['version']} "
                    f"({sorted(removed)[:3]}...). A microbatch stream "
                    "cannot reconcile rewrites; set .option("
                    "'ignore_changes', 'true') to accept at-least-once "
                    "redelivery of rewritten units (Delta ignoreChanges "
                    "parity), or consume through read_cdf/apply_changes."
                )
        # merge-on-read deletion vectors (ADVICE r3 #2): tombstones are
        # resolved at planning time, as the batch reader does, and
        # applied to the units NEW in this batch (never delivered, so
        # filtering is exact). A DV that tombstones rows of a unit
        # already streamed in an earlier batch is a RETRACTION — a
        # microbatch stream cannot un-deliver rows — so that case
        # raises instead of silently re-delivering or dropping late.
        tomb = new.tombstones() if new.dv else {}
        if tomb and prev is not None and set(new.dv) != set(prev.dv):
            prev_tomb = prev.tombstones()
            new_paths = {u["path"] for u in new.units}
            for u in prev.units:
                if u["path"] not in new_paths:
                    # unit rewritten away (compact/purge): its files are
                    # gone, so no DV can newly tombstone delivered rows
                    continue
                for f in prev.unit_files(u):
                    p = os.path.abspath(f)
                    if tomb.get(p, set()) != prev_tomb.get(p, set()):
                        raise ValueError(
                            "laketable stream: deletion vector tombstones "
                            f"rows of already-streamed file {p} — "
                            "merge-on-read deletes of delivered rows "
                            "cannot be retracted from a stream; restage "
                            "via read_changes or rewrite (purge) the "
                            "deletes before streaming"
                        )
        # the batch's decode metadata rides in every slice (see
        # _FileSlice.meta) — resolved here, on the driver, exactly once
        meta = (
            tuple(sorted(new.colmap.items())),
            tuple(new.dropped),
            tuple(sorted(new.ptypes.items())),
        )
        out: list[InputPartition] = []
        for u in new.units:
            if u["path"] in seen:
                continue
            pvals = tuple(sorted(u.get("partition", {}).items()))
            for f in new.unit_files(u):
                ris = tuple(sorted(tomb.get(os.path.abspath(f), ())))
                out.append(
                    _FileSlice(file=f, partition=pvals, tomb=ris, meta=meta)
                )
        return out

    def read(self, partition: _FileSlice) -> Iterator:
        # identical scan kernel to the batch reader, INCLUDING the
        # slice's tombstones (planning resolved active DVs for new
        # units). Decode metadata comes from the slice itself — no
        # manifest access on the executor.
        from types import SimpleNamespace

        cm, dropped, ptypes = partition.meta
        reader = LakeTableReader.__new__(LakeTableReader)
        reader.snap = SimpleNamespace(
            colmap=dict(cm), dropped=list(dropped), ptypes=dict(ptypes)
        )
        reader.schema = self.schema
        reader.filters = []
        yield from LakeTableReader.read(reader, partition)

    def commit(self, end: dict) -> None:
        # manifests are immutable — nothing to clean up; track the
        # committed offset so rate limiting advances batch by batch
        self._committed = end["version"]


def _footer_stats(path: str) -> dict[str, list]:
    """Per-column [min, max] from the parquet footer of a file the task
    just wrote — the engine's _harvest_stats discipline (tables.py:417):
    int/float/str only (bool and binary excluded; parquet writers adjust
    truncated string bounds so footer min/max are valid bounds), and a
    column whose stats are missing in any row group is omitted (no
    stats = no pruning = safe). Makes format-written units
    stats-skippable like engine-written ones."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    for i in range(md.num_columns):
        name = md.schema.column(i).name
        acc = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if (
                st is None
                or not st.has_min_max
                or not isinstance(st.min, (int, float, str))
                or isinstance(st.min, bool)
            ):
                acc = None
                break
            acc = (
                [st.min, st.max]
                if acc is None
                else [min(acc[0], st.min), max(acc[1], st.max)]
            )
        if acc is not None:
            out[name] = acc
    return out


def _merge_stats(per_file: dict[str, dict[str, list]]) -> dict[str, list]:
    """Unit-level [min, max] over per-file stats: only columns present
    in EVERY file (a file without bounds for a column makes the unit
    bound unknown — skipping stays conservative)."""
    if not per_file:
        return {}
    common = set.intersection(*(set(s) for s in per_file.values()))
    out: dict[str, list] = {}
    for s in per_file.values():
        for c in common:
            lo, hi = s[c]
            if c in out:
                out[c] = [min(out[c][0], lo), max(out[c][1], hi)]
            else:
                out[c] = [lo, hi]
    return out


@dataclass
class _WrittenFile(WriterCommitMessage):
    filename: str
    n_rows: int
    # per written file: (dir-segment tuple, parquet filename, footer
    # [min,max] stats). Commit publishes ONLY files named here and
    # prunes everything else from the staged unit — files from failed
    # or speculative task attempts (Spark retries tasks; both attempts
    # land in the shared staged dir) must not reach the manifest.
    combos: tuple = ()


class LakeTableWriter(DataSourceArrowWriter):
    """``df.write.format("laketable").mode(...).save(path)``: each task
    streams its Arrow batches into one parquet file inside a staged
    ``data/<uuid>`` unit dir; ``commit`` then publishes the unit with
    the same exclusive-create manifest protocol the engine uses, so a
    racing writer errors instead of clobbering (and a failed job leaves
    only an unreferenced staging dir for vacuum). Append carries the
    previous snapshot's units and deletion vectors by reference.

    Partitioned writes: pass ``.option("partition_by", "col[,col2]")``
    (or append to an already-partitioned table, whose layout is
    inferred) — each task splits its batches by partition value and
    writes Hive ``col=value`` subdirs inside the staged unit; commit
    publishes ONE unit per partition combination, matching the engine's
    layout (partition columns live in the directory name, not the
    files). Partition values must be plain (no characters needing Hive
    escaping) — richer values go through the LakeTable API, which also
    remains the writer for column mapping, stats harvesting,
    constraints, identity, and clustering."""

    def __init__(
        self, path: str, schema: StructType, overwrite: bool,
        partition_by: list[str] | None = None,
    ):
        self.path = path
        self.schema = schema
        self.overwrite = overwrite
        self.unit_rel = os.path.join("data", uuid_hex())
        self.partition_by = list(partition_by or [])
        log = os.path.join(path, _LOG_DIR)
        if os.path.isdir(log) and any(
            f.endswith(".json") for f in os.listdir(log)
        ):
            snap = _Snapshot(path, None)
            existing = sorted(snap.partition_by)
            if not self.partition_by and existing:
                # inherit the table's declared layout (manifest order)
                self.partition_by = list(snap.partition_by)
            if sorted(self.partition_by) != existing and not (
                overwrite and not existing
            ):
                raise ValueError(
                    f"partition_by {self.partition_by} does not match the "
                    f"table's partition layout {existing}"
                )
            if snap.colmap or snap.dropped:
                raise ValueError(
                    "laketable writer does not support column-mapped "
                    "tables; use the LakeTable API"
                )
            self.base_version = snap.version
            self.carry_units = [] if overwrite else list(snap.units)
            self.carry_dv = [] if overwrite else list(snap.dv)
        else:
            self.base_version = 0
            self.carry_units = []
            self.carry_dv = []
        missing = [c for c in self.partition_by if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"partition columns {missing} absent from schema")
        self.ptype_ddl = {
            f.name: f.dataType.simpleString()
            for f in self.schema.fields
            if f.name in self.partition_by
        }

    @staticmethod
    def _pdir(col: str, v) -> str:
        """Hive `col=value` segment; plain values only (the engine
        escapes, this interop writer rejects instead)."""
        from urllib.parse import quote

        if v is None:
            return f"{col}={_HIVE_NULL}"
        s = str(v)
        if quote(s, safe="") != s:
            raise ValueError(
                f"partition value {s!r} needs Hive escaping; "
                "use the LakeTable API for such layouts"
            )
        return f"{col}={s}"

    # executors ------------------------------------------------------------
    def write(self, iterator) -> _WrittenFile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _WrittenFile(filename="", n_rows=0, combos=())
        t = pa.Table.from_batches(batches)
        if not self.partition_by:
            out_dir = os.path.join(self.path, self.unit_rel)
            os.makedirs(out_dir, exist_ok=True)
            fname = f"part-{uuid_hex()}.parquet"
            fpath = os.path.join(out_dir, fname)
            pq.write_table(t, fpath)
            return _WrittenFile(
                filename=fname,
                n_rows=t.num_rows,
                combos=(((), fname, _footer_stats(fpath)),),
            )
        keys = t.select(self.partition_by).to_pylist()
        combos: dict[tuple, list[int]] = {}
        for i, row in enumerate(keys):
            combos.setdefault(
                tuple((c, row[c]) for c in self.partition_by), []
            ).append(i)
        data = t.drop_columns(self.partition_by)
        written = []
        for combo, idx in combos.items():
            segs = [self._pdir(c, v) for c, v in combo]
            out_dir = os.path.join(self.path, self.unit_rel, *segs)
            os.makedirs(out_dir, exist_ok=True)
            fname = f"part-{uuid_hex()}.parquet"
            fpath = os.path.join(out_dir, fname)
            pq.write_table(
                data.take(pa.array(idx, type=pa.int64())), fpath
            )
            written.append((tuple(segs), fname, _footer_stats(fpath)))
        return _WrittenFile(filename="", n_rows=t.num_rows, combos=tuple(written))

    # driver ---------------------------------------------------------------
    def _prune_unlisted(self, messages) -> None:
        """Remove staged parquet files NOT named in any commit message:
        leftovers from failed or speculative task attempts (Spark may
        run a task twice; only the committed attempt's message reaches
        the driver). Without this, both attempts' files sit in the
        shared staged unit dir and readers — which walk the published
        directory — would double-count rows or trip over a truncated
        file from a killed attempt."""
        keep = {
            os.path.join(self.path, self.unit_rel, *segs, fname)
            for m in messages
            if m
            for segs, fname, _st in m.combos
        }
        base = os.path.join(self.path, self.unit_rel)
        if not os.path.isdir(base):
            return
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                p = os.path.join(dirpath, f)
                if f.endswith(".parquet") and p not in keep:
                    os.remove(p)

    def _sticky(self) -> dict:
        """Manifest fields that must survive any commit (the engine's
        _commit carries them by default, tables.py:330): the txn ledger
        (append_once / stream-sink exactly-once watermarks) and the
        identity high-water mark. Dropping either resets idempotency or
        re-issues identity values."""
        if self.base_version <= 0:
            return {}
        log = os.path.join(self.path, _LOG_DIR)
        try:
            with open(os.path.join(log, f"{self.base_version:08d}.json")) as f:
                prev = json.load(f)
        except OSError:
            return {}
        out = {}
        if prev.get("txn"):
            out["txn"] = dict(prev["txn"])
        if prev.get("identity_high"):
            out["identity_high"] = int(prev["identity_high"])
        return out

    def commit(self, messages) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        self._prune_unlisted(messages)
        n_rows = sum(m.n_rows for m in messages if m)
        if self.partition_by:
            by_segs: dict[tuple, dict[str, dict]] = {}
            for m in messages:
                if not m:
                    continue
                for segs, fname, st in m.combos:
                    by_segs.setdefault(segs, {})[fname] = st
            new_units = [
                {
                    "path": os.path.join(self.unit_rel, *segs),
                    "partition": {
                        s.split("=", 1)[0]: s.split("=", 1)[1] for s in segs
                    },
                    "partition_types": dict(self.ptype_ddl),
                    "stats": _merge_stats(files),
                    "file_stats": files,
                }
                for segs, files in sorted(by_segs.items())
            ]
            if not new_units and self.overwrite:
                raise ValueError(
                    "empty overwrite of a partitioned table is not "
                    "supported through the format; use the LakeTable API"
                )
            self._publish(self.carry_units + new_units)
            return
        out_dir = os.path.join(self.path, self.unit_rel)
        if n_rows == 0:
            # an empty relation is still a valid snapshot: one 0-row file
            os.makedirs(out_dir, exist_ok=True)
            empty = pa.table(
                {
                    f.name: pa.nulls(0, type=to_arrow_type(f.dataType))
                    for f in self.schema.fields
                }
            )
            pq.write_table(empty, os.path.join(out_dir, "part-empty.parquet"))
        files = {
            fname: st
            for m in messages
            if m
            for _segs, fname, st in m.combos
        }
        unit = {
            "path": self.unit_rel,
            "partition": {},
            "partition_types": {},
            "stats": _merge_stats(files),
            "file_stats": files,
        }
        doc = {
            "version": self.base_version + 1,
            "operation": "pyds-overwrite" if self.overwrite else "pyds-append",
            "committed_at": _utc_now_iso(),
            "partition_by": [],
            "units": self.carry_units + [unit],
            "dv": self.carry_dv,
            **self._sticky(),
        }
        self._write_manifest(doc)

    def _publish(self, units: list[dict]) -> None:
        self._write_manifest(
            {
                "version": self.base_version + 1,
                "operation": (
                    "pyds-overwrite" if self.overwrite else "pyds-append"
                ),
                "partition_by": list(self.partition_by),
                "units": units,
                "dv": self.carry_dv,
                **self._sticky(),
            }
        )

    def _write_manifest(self, doc: dict) -> None:
        log = os.path.join(self.path, _LOG_DIR)
        os.makedirs(log, exist_ok=True)
        target = os.path.join(log, f"{self.base_version + 1:08d}.json")
        tmp = target + f".tmp-{uuid_hex()}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        try:
            os.link(tmp, target)  # atomic-exclusive: racing writer errors
        except FileExistsError:
            raise RuntimeError(
                f"version {self.base_version + 1} already committed by "
                "another writer (optimistic concurrency)"
            ) from None
        finally:
            os.remove(tmp)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.path, self.unit_rel), ignore_errors=True)


class LakeTableStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("laketable").start(path)``: the streaming
    sink side of the format, with EXACTLY-ONCE batch commits.

    Per micro-batch, every task streams its Arrow batches into one
    parquet file inside its own staged ``data/<uuid>`` unit dir;
    ``commit(messages, batchId)`` publishes all of that batch's units in
    ONE manifest whose ``txn`` map records {txn_app_id: batchId} — the
    same ledger LakeTable.append_once uses (Delta txnAppId/txnVersion
    parity). On checkpoint-replay of an already-committed batch the
    commit sees ``batchId == txn[app]``, deletes the re-staged files and
    publishes nothing, so failures between data-write and commit cannot
    double-append; a batchId strictly BELOW the watermark is never a
    legit replay (only the last committed batch can be re-delivered)
    and raises instead of silently dropping data — that shape means a
    colliding txn app (two queries sharing an id, or a fresh-checkpoint
    restart). The default txn app is derived from checkpointLocation so
    independent queries never collide by default. Concurrent writers are handled by rebase-retry:
    the snapshot (units, dv, txn) is re-read at commit time and the
    manifest is claimed with the exclusive-create protocol; a lost race
    re-reads and retries, carrying the winner's units forward.

    Partitioned streaming: pass ``.option("partition_by", "col[,col2]")``
    matching the table's declared layout (validated at every commit;
    the option is required because executors split batches before the
    driver ever reads the manifest). Tasks write Hive ``col=value``
    subdirs inside their staged unit, exactly like the batch writer;
    each commit publishes one unit per (staged-unit, partition-combo).
    Column-mapped tables go through the engine API (e.g.
    ``foreachBatch`` + ``LakeTable.merge``)."""

    def __init__(self, path: str, schema: StructType, options):
        self.path = path
        self.schema = schema
        # Ledger identity. Two INDEPENDENT queries writing one table
        # must use distinct txn apps, or the replay guard in commit()
        # suppresses the second query's batches as "replays". Default:
        # derive the id from the query's checkpointLocation (unique per
        # query by construction — Spark forbids checkpoint sharing), so
        # defaults never collide; an explicit txn_app_id still wins (and
        # is what keeps idempotency across an intentional
        # checkpoint-reset redeploy).
        explicit = options.get("txn_app_id")
        ckpt = options.get("checkpointlocation") or options.get(
            "checkpointLocation"
        )
        if explicit:
            self.txn_app = explicit
        elif ckpt:
            self.txn_app = "pyds-stream:" + os.path.normpath(ckpt)
        else:
            self.txn_app = "pyds-stream"
        pb = options.get("partition_by")
        self.partition_by = (
            [c.strip() for c in pb.split(",")] if pb else []
        )
        missing = [c for c in self.partition_by if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"partition columns {missing} absent from schema")
        self.ptype_ddl = {
            f.name: f.dataType.simpleString()
            for f in schema.fields
            if f.name in self.partition_by
        }

    # executors ------------------------------------------------------------
    def write(self, iterator) -> _WrittenFile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _WrittenFile(filename="", n_rows=0, combos=())
        t = pa.Table.from_batches(batches)
        unit_rel = os.path.join("data", uuid_hex())
        if not self.partition_by:
            out_dir = os.path.join(self.path, unit_rel)
            os.makedirs(out_dir, exist_ok=True)
            fname = f"part-{uuid_hex()}.parquet"
            fpath = os.path.join(out_dir, fname)
            pq.write_table(t, fpath)
            return _WrittenFile(
                filename=unit_rel,
                n_rows=t.num_rows,
                combos=(((), fname, _footer_stats(fpath)),),
            )
        keys = t.select(self.partition_by).to_pylist()
        groups: dict[tuple, list[int]] = {}
        for i, row in enumerate(keys):
            groups.setdefault(
                tuple((c, row[c]) for c in self.partition_by), []
            ).append(i)
        data = t.drop_columns(self.partition_by)
        written = []
        for combo, idx in groups.items():
            segs = [LakeTableWriter._pdir(c, v) for c, v in combo]
            out_dir = os.path.join(self.path, unit_rel, *segs)
            os.makedirs(out_dir, exist_ok=True)
            fname = f"part-{uuid_hex()}.parquet"
            fpath = os.path.join(out_dir, fname)
            pq.write_table(data.take(pa.array(idx, type=pa.int64())), fpath)
            written.append((tuple(segs), fname, _footer_stats(fpath)))
        return _WrittenFile(
            filename=unit_rel, n_rows=t.num_rows, combos=tuple(written)
        )

    # driver ---------------------------------------------------------------
    def _drop_staged(self, messages) -> None:
        import shutil

        for m in messages:
            if m and m.filename:
                shutil.rmtree(
                    os.path.join(self.path, m.filename), ignore_errors=True
                )

    def commit(self, messages, batchId: int) -> None:
        if self.partition_by:
            new_units = [
                {
                    "path": os.path.join(m.filename, *segs),
                    "partition": {
                        s.split("=", 1)[0]: s.split("=", 1)[1] for s in segs
                    },
                    "partition_types": dict(self.ptype_ddl),
                    "stats": dict(st),
                    "file_stats": {fname: st},
                }
                for m in messages
                if m and m.filename
                for segs, fname, st in m.combos
            ]
        else:
            new_units = [
                {
                    "path": m.filename,
                    "partition": {},
                    "partition_types": {},
                    "stats": _merge_stats(
                        {fname: st for _s, fname, st in m.combos}
                    ),
                    "file_stats": {fname: st for _s, fname, st in m.combos},
                }
                for m in messages
                if m and m.filename
            ]
        if not new_units:
            return  # empty batch: nothing to publish, nothing to replay
        log = os.path.join(self.path, _LOG_DIR)
        os.makedirs(log, exist_ok=True)
        for _attempt in range(50):  # rebase-retry against racing writers
            versions = sorted(
                int(f.split(".")[0])
                for f in os.listdir(log)
                if f.endswith(".json")
            )
            if versions:
                with open(os.path.join(log, f"{versions[-1]:08d}.json")) as f:
                    prev = json.load(f)
                if prev.get("column_map") or prev.get("column_dropped"):
                    self._drop_staged(messages)  # no leak per retry
                    raise ValueError(
                        "laketable stream writer does not support "
                        "column-mapped tables; use foreachBatch + the "
                        "LakeTable API"
                    )
                if sorted(prev.get("partition_by", [])) != sorted(
                    self.partition_by
                ):
                    self._drop_staged(messages)  # no leak per retry
                    raise ValueError(
                        f"stream partition_by {self.partition_by} does not "
                        "match the table's declared layout "
                        f"{prev.get('partition_by', [])}; pass the matching "
                        '.option("partition_by", ...)'
                    )
                txns = dict(prev.get("txn", {}))
                recorded = int(txns.get(self.txn_app, -1))
                if batchId == recorded:
                    # checkpoint replay of the last committed batch —
                    # the only batch a crash between data-write and
                    # offset-commit can legitimately re-deliver: drop
                    # the re-staged files, publish nothing (exactly-once)
                    self._drop_staged(messages)
                    return
                if batchId < recorded:
                    # A legit replay can only re-deliver the LAST
                    # committed batch (== recorded). batchId strictly
                    # below the watermark means a different query run is
                    # sharing this txn app — a reset/fresh checkpoint
                    # (batchId restarted at 0) or two queries with a
                    # colliding txn_app_id. Silently dropping here is
                    # unreported data loss; fail loudly instead.
                    self._drop_staged(messages)
                    raise ValueError(
                        f"laketable stream sink: batch {batchId} is below "
                        f"the committed watermark {recorded} for txn app "
                        f"'{self.txn_app}'. This means a second query (or "
                        "a restart with a fresh checkpoint) is writing "
                        "under the same transaction id; its batches would "
                        "be silently suppressed as replays. Set a distinct "
                        '.option("txn_app_id", ...) per logical writer '
                        "(or keep the default, which derives the id from "
                        "checkpointLocation)."
                    )
                base = versions[-1]
                units = list(prev["units"]) + new_units
                dv = list(prev.get("dv", []))
            else:
                base, txns, units, dv = 0, {}, new_units, []
            txns[self.txn_app] = int(batchId)
            doc = {
                "version": base + 1,
                "operation": "pyds-stream-append",
                "committed_at": _utc_now_iso(),
                "partition_by": list(self.partition_by),
                "units": units,
                "dv": dv,
                "txn": txns,
            }
            if versions and prev.get("identity_high"):
                doc["identity_high"] = int(prev["identity_high"])
            target = os.path.join(log, f"{base + 1:08d}.json")
            tmp = target + f".tmp-{uuid_hex()}"
            with open(tmp, "w") as f:
                json.dump(doc, f, indent=1)
            try:
                os.link(tmp, target)  # atomic-exclusive claim
                return
            except FileExistsError:
                continue  # lost the race: re-read and rebase
            finally:
                os.remove(tmp)
        raise RuntimeError(
            f"could not commit batch {batchId} after 50 rebase attempts"
        )

    def abort(self, messages, batchId: int) -> None:
        self._drop_staged(messages)


def uuid_hex() -> str:
    import uuid

    return uuid.uuid4().hex


def register(spark) -> None:
    """Register the format and enable Python filter pushdown (an SQL
    conf, so it can be pinned on any caller-provided session)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LakeTableDataSource)


class LakeTableDataSource(DataSource):
    """``spark.read.format("laketable")`` — register with
    ``sources.pyds.register(spark)`` (or ``spark.dataSource.register``
    with ``spark.sql.python.filterPushdown.enabled`` set)."""

    @classmethod
    def name(cls) -> str:
        return "laketable"

    _pinned: int | None = None

    def _target(self) -> tuple[str, int | None]:
        path = self.options.get("path") or self.options.get("table_path")
        if not path:
            raise ValueError("laketable source requires .load(<table path>)")
        v = self.options.get("version")
        return _fs_path(path), (int(v) if v is not None else None)

    def _pin(self, path: str, version: int | None) -> int:
        """Resolve `latest` exactly once per DataSource instance, so
        schema() and reader() see the SAME snapshot — a commit landing
        between schema inference and scan planning must not make the
        scan read columns Spark never compiled (ADVICE r3 #3)."""
        if version is not None:
            return version
        if self._pinned is None:
            log = os.path.join(path, _LOG_DIR)
            vs = sorted(
                int(f.split(".")[0])
                for f in os.listdir(log)
                if f.endswith(".json")
            )
            if not vs:
                raise ValueError(f"{path} is not a LakeTable (empty log)")
            self._pinned = vs[-1]
        return self._pinned

    def schema(self) -> str:
        path, version = self._target()
        return _Snapshot(path, self._pin(path, version)).file_schema_ddl()

    def reader(self, schema: StructType) -> LakeTableReader:
        path, version = self._target()
        return LakeTableReader(path, self._pin(path, version), schema)

    def streamReader(self, schema: StructType) -> LakeTableStreamReader:
        path, _version = self._target()
        mv = self.options.get("maxversionspertrigger")
        ic = str(
            self.options.get("ignore_changes")
            or self.options.get("ignorechanges")
            or ""
        ).lower() in ("true", "1", "yes")
        return LakeTableStreamReader(
            path, schema, int(mv) if mv is not None else None,
            ignore_changes=ic,
        )

    def writer(self, schema: StructType, overwrite: bool) -> LakeTableWriter:
        path, _version = self._target()
        pb = self.options.get("partition_by")
        return LakeTableWriter(
            path, schema, overwrite,
            partition_by=[c.strip() for c in pb.split(",")] if pb else None,
        )

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> LakeTableStreamWriter:
        if overwrite:
            raise ValueError(
                "laketable streaming sink is append-only (complete/update "
                "output modes need MERGE semantics — use foreachBatch + "
                "the LakeTable API)"
            )
        path, _version = self._target()
        return LakeTableStreamWriter(path, schema, self.options)
