"""Nested column-mapping resolution (Delta PROTOCOL.md "Column
Mapping").

Under ``delta.columnMapping.mode`` 'name' or 'id', parquet files store
PHYSICAL field names (``col-<uuid>``) at EVERY nesting level; the
logical schema in ``metaData.schemaString`` carries each field's
``delta.columnMapping.physicalName`` (both modes — the spec requires
writers to set physicalName and id on every field, id mode merely makes
the parquet field id the authoritative resolution key). A flat
physical→logical top-level select therefore cannot rename fields inside
struct / array / map values; this module rebuilds them recursively on
the two read tiers:

- ``logical_expr``: a Spark Column expression converting a physical
  column to its logical shape (struct reconstruction under an isNull
  guard, ``transform`` over arrays, ``map_from_arrays`` over maps) —
  used by the engine read path (``read_delta_log``). All JVM
  expressions: codegen-friendly, no Python in the row path.
- ``relabel_arrow``: the same transformation on pyarrow arrays for the
  Python DataSource read tier (``format("delta")`` batch + stream) —
  buffer-reusing reconstruction (validity/offsets buffers are shared,
  only the type metadata changes), so the rename is O(fields), not
  O(rows), per batch.

Both handle additive evolution: a nested field present in the logical
schema but absent from the scanned file null-fills, same as the
top-level contract.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    StructType,
    _parse_datatype_json_value,
)

_PHYS = "delta.columnMapping.physicalName"


def physical_name(field_json: dict) -> str:
    """Stored parquet name of one logical field (identity when the
    writer recorded no mapping)."""
    return (field_json.get("metadata") or {}).get(_PHYS, field_json["name"])


def logical_type(type_json: Any) -> DataType:
    """Spark DataType of a Delta schema type value (the schemaString
    uses Spark's own JSON type format)."""
    return _parse_datatype_json_value(type_json)


def is_nested(type_json: Any) -> bool:
    return isinstance(type_json, dict) and type_json.get("type") in (
        "struct",
        "array",
        "map",
    )


# ---------------------------------------------------------------------------
# Spark-expression tier
# ---------------------------------------------------------------------------


def _actual_field(actual: DataType | None, phys: str) -> DataType | None:
    """Type of the physical child inside an ACTUAL scanned struct type,
    or None when the file footprint lacks it (additive evolution)."""
    if not isinstance(actual, StructType):
        return None
    for f in actual.fields:
        if f.name == phys:
            return f.dataType
    return None


def logical_expr(
    col: Column, type_json: Any, actual: DataType | None
) -> Column:
    """``col`` (physical layout, type ``actual``) reshaped to the
    logical schema ``type_json``. Primitives pass through; missing
    physical children null-fill at their logical type."""
    if not is_nested(type_json):
        return col
    kind = type_json["type"]
    if kind == "struct":
        children = []
        for f in type_json["fields"]:
            phys = physical_name(f)
            sub_actual = _actual_field(actual, phys)
            if sub_actual is None:
                children.append(
                    F.lit(None).cast(logical_type(f["type"])).alias(f["name"])
                )
            else:
                children.append(
                    logical_expr(col[phys], f["type"], sub_actual).alias(
                        f["name"]
                    )
                )
        # F.struct of a NULL struct row would yield a non-null struct of
        # NULLs — guard the null through explicitly
        rebuilt = F.struct(*children)
        return F.when(col.isNull(), F.lit(None).cast(
            logical_type(type_json)
        )).otherwise(rebuilt)
    if kind == "array":
        elem_actual = (
            actual.elementType if isinstance(actual, ArrayType) else None
        )
        et = type_json["elementType"]
        if not is_nested(et):
            return col
        return F.transform(col, lambda x: logical_expr(x, et, elem_actual))
    if kind == "map":
        k_actual = actual.keyType if isinstance(actual, MapType) else None
        v_actual = actual.valueType if isinstance(actual, MapType) else None
        kt, vt = type_json["keyType"], type_json["valueType"]
        if not is_nested(kt) and not is_nested(vt):
            return col
        return F.map_from_arrays(
            F.transform(
                F.map_keys(col), lambda k: logical_expr(k, kt, k_actual)
            ),
            F.transform(
                F.map_values(col), lambda v: logical_expr(v, vt, v_actual)
            ),
        )
    raise AssertionError(f"unreachable nested kind {kind!r}")


# ---------------------------------------------------------------------------
# pyarrow tier
# ---------------------------------------------------------------------------


def relabel_arrow(arr, type_json: Any):
    """Physical pyarrow array → logical field names per ``type_json``.
    Validity and offset buffers are reused; only struct child names (and
    null-filled missing children) change."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not is_nested(type_json):
        return arr
    kind = type_json["type"]
    if kind == "struct":
        from pyspark.sql.pandas.types import to_arrow_type

        children, fields = [], []
        for f in type_json["fields"]:
            phys = physical_name(f)
            idx = arr.type.get_field_index(phys)
            if idx < 0:  # additive evolution: null-fill at logical type
                child = pa.nulls(
                    len(arr), type=to_arrow_type(logical_type(f["type"]))
                )
            else:
                child = relabel_arrow(arr.field(idx), f["type"])
            children.append(child)
            fields.append(pa.field(f["name"], child.type, True))
        mask = None
        if arr.null_count:
            import pyarrow.compute as pc

            mask = pc.is_null(arr)
        return pa.StructArray.from_arrays(
            children, fields=fields, mask=mask
        )
    if kind == "array":
        et = type_json["elementType"]
        if not is_nested(et):
            return arr
        values = relabel_arrow(arr.values, et)
        if pa.types.is_large_list(arr.type):
            typ = pa.large_list(values.type)
        else:
            typ = pa.list_(values.type)
        return pa.Array.from_buffers(
            typ,
            len(arr),
            arr.buffers()[:2],  # [validity, offsets] of THIS level
            null_count=arr.null_count,
            offset=arr.offset,
            children=[values],
        )
    if kind == "map":
        kt, vt = type_json["keyType"], type_json["valueType"]
        if not is_nested(kt) and not is_nested(vt):
            return arr
        entries = arr.values  # MapArray is a ListArray of struct entries
        new_keys = relabel_arrow(entries.field(0), kt)
        new_items = relabel_arrow(entries.field(1), vt)
        typ = pa.map_(new_keys.type, new_items.type)
        # the child's struct type must EQUAL the map type's entries
        # field type (key non-nullable) — from_arrays with explicit
        # fields, or the buffer-trusting from_buffers builds an array
        # that aborts on access
        new_entries = pa.StructArray.from_arrays(
            [new_keys, new_items],
            fields=[typ.key_field, typ.item_field],
        )
        return pa.Array.from_buffers(
            typ,
            len(arr),
            arr.buffers()[:2],
            null_count=arr.null_count,
            offset=arr.offset,
            children=[new_entries],
        )
    raise AssertionError(f"unreachable nested kind {kind!r}")


# ---------------------------------------------------------------------------
# writer tier: logical -> physical
# ---------------------------------------------------------------------------


def _invert_type(type_json: Any) -> Any:
    if not is_nested(type_json):
        return type_json
    kind = type_json["type"]
    if kind == "struct":
        return {
            "type": "struct",
            "fields": [invert_mapping(f) for f in type_json["fields"]],
        }
    if kind == "array":
        out = dict(type_json)
        out["elementType"] = _invert_type(type_json["elementType"])
        return out
    out = dict(type_json)  # map
    out["keyType"] = _invert_type(type_json["keyType"])
    out["valueType"] = _invert_type(type_json["valueType"])
    return out


def invert_mapping(field_json: dict) -> dict:
    """Field JSON whose *name* is the PHYSICAL name and whose
    physicalName metadata is the LOGICAL name — feeding this to
    :func:`relabel_arrow` over a LOGICAL array renames every level to
    its physical spelling (the writer direction)."""
    return {
        "name": physical_name(field_json),
        "type": _invert_type(field_json["type"]),
        "nullable": field_json.get("nullable", True),
        "metadata": {_PHYS: field_json["name"]},
        # the original logical field json rides along so the write
        # schema can attach id-mode field ids (physical_write_schema)
        "source": field_json,
    }


def _id_meta(field_json: dict) -> dict | None:
    fid = (field_json.get("metadata") or {}).get("delta.columnMapping.id")
    if fid is None:
        return None
    return {b"PARQUET:field_id": str(int(fid)).encode()}


def _attach_ids_type(t, type_json: Any):
    """Arrow type rebuilt with PARQUET:field_id metadata from the Delta
    schema's delta.columnMapping.id at every nesting level (id-mode
    writes: the spec makes the field id the resolution key, so every
    written footer must carry them)."""
    import pyarrow as pa

    if not is_nested(type_json):
        return t
    kind = type_json["type"]
    if kind == "struct":
        return pa.struct(
            [
                pa.field(
                    f.name,
                    _attach_ids_type(f.type, fj["type"]),
                    f.nullable,
                    metadata=_id_meta(fj),
                )
                for f, fj in zip(t, type_json["fields"])
            ]
        )
    if kind == "array":
        return pa.list_(
            _attach_ids_type(t.value_type, type_json["elementType"])
        )
    return pa.map_(
        _attach_ids_type(t.key_type, type_json["keyType"]),
        _attach_ids_type(t.item_type, type_json["valueType"]),
    )


def physical_write_schema(arrays, phys_fields: list[dict], with_ids: bool):
    """pa.schema for writing ``arrays`` (already physically-renamed, in
    ``phys_fields`` order): field-id metadata attached at every level
    when ``with_ids`` (id mode). phys_fields are INVERTED jsons whose
    original-field metadata rides along via ``source``."""
    import pyarrow as pa

    fields = []
    for arr, fj in zip(arrays, phys_fields):
        src = fj["source"]  # the original logical field json
        t = (
            _attach_ids_type(arr.type, src["type"]) if with_ids else arr.type
        )
        fields.append(
            pa.field(
                fj["name"],
                t,
                True,
                metadata=_id_meta(src) if with_ids else None,
            )
        )
    return pa.schema(fields)


# ---------------------------------------------------------------------------
# Spark writer tier: logical DataFrame -> physical layout (for DML
# rewrites on column-mapped tables, which stage files through Spark's
# JVM parquet writer rather than the pyds arrow tasks)
# ---------------------------------------------------------------------------


def _physical_spark_type(type_json: Any) -> DataType:
    if not is_nested(type_json):
        return logical_type(type_json)
    kind = type_json["type"]
    if kind == "struct":
        return StructType(
            [physical_spark_field(f) for f in type_json["fields"]]
        )
    if kind == "array":
        return ArrayType(_physical_spark_type(type_json["elementType"]), True)
    return MapType(
        _physical_spark_type(type_json["keyType"]),
        _physical_spark_type(type_json["valueType"]),
        True,
    )


def physical_spark_field(field_json: dict):
    """StructField with the PHYSICAL name and ``parquet.field.id``
    metadata (Spark's parquet writer emits PARQUET:field_id from it at
    every nesting level when spark.sql.parquet.fieldId.write.enabled,
    the default)."""
    from pyspark.sql.types import StructField

    meta = None
    fid = (field_json.get("metadata") or {}).get("delta.columnMapping.id")
    if fid is not None:
        meta = {"parquet.field.id": int(fid)}
    return StructField(
        physical_name(field_json),
        _physical_spark_type(field_json["type"]),
        True,
        meta,
    )


def to_physical_df(df, fields_json: list[dict], passthrough: tuple = ()):
    """Rename a LOGICAL DataFrame to the physical layout: every level's
    field renamed via the inverted mapping (logical_expr over inverted
    jsons), then ``.to()`` the field-id-carrying physical schema so the
    parquet footer records the ids. ``passthrough`` columns (e.g.
    ``_change_type``) keep their name and type."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    cols, fields = [], []
    for f in fields_json:
        if f["name"] not in actual:
            continue  # projected away by the caller
        inv = invert_mapping(f)
        cols.append(
            logical_expr(
                F.col(f["name"]), inv["type"], actual[f["name"]]
            ).alias(physical_name(f))
        )
        fields.append(physical_spark_field(f))
    for c in passthrough:
        if c in actual:
            cols.append(F.col(c))
            fields.append(df.schema[c])
    return df.select(*cols).to(StructType(fields))


# ---------------------------------------------------------------------------
# mapping allocation (schema evolution on mapped tables)
# ---------------------------------------------------------------------------


def max_column_id(schema_json: dict, configuration: dict | None = None) -> int:
    """The table's current max delta.columnMapping.id: the
    ``delta.columnMapping.maxColumnId`` property when present (the
    authoritative counter real writers maintain), else the max id found
    by walking the schema (defensive — a table missing the property but
    carrying ids must never get duplicate allocations)."""
    best = 0
    raw = (configuration or {}).get("delta.columnMapping.maxColumnId")
    if raw is not None:
        try:
            best = int(raw)
        except (TypeError, ValueError):
            best = 0

    def walk_type(tj: Any) -> None:
        if not is_nested(tj):
            return
        kind = tj["type"]
        if kind == "struct":
            for f in tj["fields"]:
                walk_field(f)
        elif kind == "array":
            walk_type(tj["elementType"])
        else:
            walk_type(tj["keyType"])
            walk_type(tj["valueType"])

    def walk_field(f: dict) -> None:
        nonlocal best
        fid = (f.get("metadata") or {}).get("delta.columnMapping.id")
        if fid is not None:
            best = max(best, int(fid))
        walk_type(f["type"])

    for f in schema_json.get("fields", []):
        walk_field(f)
    return best


def allocate_mapping(
    field_json: dict,
    next_id: list[int],
    name_for: "Callable[[str, int], str] | None" = None,
) -> dict:
    """A copy of one LOGICAL Spark field json with fresh
    ``delta.columnMapping.id`` + ``physicalName`` metadata allocated at
    every struct level (the spec requires both on every field of a
    mapped table; ids come from the shared counter so nested fields
    never collide with top-level ones). ``next_id`` is a one-cell
    counter seeded with maxColumnId+1; after allocating every new field
    the caller persists ``next_id[0] - 1`` back to
    ``delta.columnMapping.maxColumnId``.

    ``name_for(logical_name, id) -> physical name`` overrides the
    default random ``col-<uuid4>``: callers whose allocation runs in
    MORE THAN ONE process for the same write (the streaming sink — the
    Python DataSource API constructs the writer independently on the
    write path and in the commit runner) must derive the physical name
    deterministically from stable inputs, or the staged files and the
    committed metaData disagree on the mapping."""
    import uuid

    def walk_type(tj: Any) -> Any:
        if not is_nested(tj):
            return tj
        kind = tj["type"]
        if kind == "struct":
            return {
                "type": "struct",
                "fields": [alloc(f) for f in tj["fields"]],
            }
        if kind == "array":
            out = dict(tj)
            out["elementType"] = walk_type(tj["elementType"])
            return out
        out = dict(tj)
        out["keyType"] = walk_type(tj["keyType"])
        out["valueType"] = walk_type(tj["valueType"])
        return out

    def alloc(f: dict) -> dict:
        meta = dict(f.get("metadata") or {})
        meta["delta.columnMapping.id"] = next_id[0]
        meta["delta.columnMapping.physicalName"] = (
            name_for(f["name"], next_id[0])
            if name_for is not None
            else f"col-{uuid.uuid4()}"
        )
        next_id[0] += 1
        return {
            "name": f["name"],
            "type": walk_type(f["type"]),
            "nullable": f.get("nullable", True),
            "metadata": meta,
        }

    return alloc(field_json)
