"""Field-id schema evolution: read data files written under OLDER
schemas through the table's CURRENT schema.

Iceberg column identity is the FIELD ID, never the name (spec §4
"Schema Evolution"): a rename changes only metadata, an add allocates a
fresh id, a drop retires one — data files are never rewritten.  The
reference threads schemas by field id through its whole scan
(core/src/executor/datafusion/datafusion_processor.rs:741-774), so a
file written before a rename still resolves.  Without this, the first
rename on a real table silently mis-reads every pre-rename file (the
old column comes back NULL under name-based resolution).

Spark-first mapping — two read paths, one identity rule:

- **Engine path** (``spark.read.parquet``): Spark's native field-id
  resolution (`spark.sql.parquet.fieldId.read.enabled`).  We build the
  requested ``StructType`` from the table's current Iceberg schema with
  ``parquet.field.id`` metadata on every field; the vectorized parquet
  reader then matches file columns BY ID — renames resolve, added
  columns read as NULL from old files, dropped columns are never
  requested.  Zero Python in the hot path; whole-stage codegen intact.
- **DataSource path** (executor-side pyarrow): the same resolution as
  an Arrow-level projection built ONCE per file from the footer
  (``PARQUET:field_id`` key metadata, the standard parquet <-> Arrow
  carrier both pyarrow and Spark write), then applied per batch as
  zero-copy column selection + rename.

Files carrying NO field ids (pre-Iceberg imports) fall back to
name-based resolution — Iceberg's ``schema.name-mapping.default``
behavior in its default form (field name = mapped name).

Nested types resolve by id on BOTH paths (the reference passes nested
schemas opaquely, so this exceeds reference parity):

- DataSource/Arrow: ``remap_batch_table`` -> ``_remap_array`` recurses
  structs, lists and maps, so a rename/add/promotion INSIDE a struct —
  including a struct that lives inside ``list<...>`` or ``map<...>`` —
  is metadata-only there too; offsets and validity of the enclosing
  list/map carry through zero-copy while only the values buffer
  re-projects.
- Engine (``spark.read``): Spark's native field-id matcher resolves
  ids at every nesting level when the requested schema declares them,
  so ``struct_with_field_ids`` stamps ``parquet.field.id`` on nested
  StructFields as well — still zero Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Arrow <-> parquet field-id carrier key (written by pyarrow and Spark)
ARROW_FIELD_ID_KEY = b"PARQUET:field_id"
# Spark StructField metadata key for its native field-id read path
SPARK_FIELD_ID_KEY = "parquet.field.id"

_PRIMITIVE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
    # Iceberg time is micros-since-midnight; Spark (pre-TimeType) reads
    # the physical int64
    "time": T.LongType(),
    "timestamp": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
}


def _is_struct_type(t) -> bool:
    """True for the Iceberg JSON struct type form
    ``{"type": "struct", "fields": [...]}``."""
    return isinstance(t, dict) and t.get("type") == "struct"


def _is_list_type(t) -> bool:
    """Iceberg JSON list form ``{"type": "list", "element": ...}``."""
    return isinstance(t, dict) and t.get("type") == "list"


def _is_map_type(t) -> bool:
    """Iceberg JSON map form ``{"type": "map", "key": .., "value": ..}``."""
    return isinstance(t, dict) and t.get("type") == "map"


def iceberg_type_to_spark(t, nested: bool = False):
    """Spark DataType for an Iceberg type; None for unknown types
    (callers fall back to name-based reads).  Nested types resolve only
    with ``nested=True``; struct children then carry their own
    ``parquet.field.id`` metadata, which both the engine's native
    field-id reader and the DataSource's Arrow remap honor at every
    nesting level."""
    if _is_struct_type(t):
        if not nested:
            return None
        out = []
        for f in t.get("fields", []):
            dt = iceberg_type_to_spark(f.get("type"), nested=True)
            if dt is None:
                return None
            out.append(
                T.StructField(
                    f["name"],
                    dt,
                    nullable=not f.get("required", False),
                    # nested StructFields carry their field id too:
                    # Spark's native reader resolves ids at EVERY
                    # nesting level when the requested schema declares
                    # them (verified on 4.1: struct/child rename,
                    # child promotion, child add, list rename)
                    metadata={SPARK_FIELD_ID_KEY: int(f["id"])}
                    if f.get("id") is not None
                    else None,
                )
            )
        return T.StructType(out)
    if _is_list_type(t):
        if not nested:
            return None
        et = iceberg_type_to_spark(t.get("element"), nested=True)
        return (
            T.ArrayType(et, not t.get("element-required", False))
            if et is not None
            else None
        )
    if _is_map_type(t):
        if not nested:
            return None
        kt = iceberg_type_to_spark(t.get("key"), nested=True)
        vt = iceberg_type_to_spark(t.get("value"), nested=True)
        return (
            T.MapType(kt, vt, not t.get("value-required", False))
            if kt is not None and vt is not None
            else None
        )
    if not isinstance(t, str):
        return None
    if t in ("geometry", "geography") or (
        isinstance(t, str)
        and (t.startswith("geometry(") or t.startswith("geography("))
    ):
        # v3 geometry/geography: WKB in a binary column (the optional
        # CRS parameter affects interpretation, not storage); codec +
        # predicates in operators/geo.py
        return T.BinaryType()
    if t == "variant":
        # v3 variant: the spec's physical group — two binary fields in
        # the open variant binary encoding (operators/variant_ops.py).
        # Children are NOT field-id addressed (the spec gives the
        # variant ONE id); name-matched within the struct.
        if not nested:
            return None
        from iceberg_compaction_spark.operators.variant_ops import (
            VARIANT_SPARK_TYPE,
        )

        return VARIANT_SPARK_TYPE
    if t in _PRIMITIVE_TO_SPARK:
        return _PRIMITIVE_TO_SPARK[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal("):-1].split(",")
        return T.DecimalType(int(p), int(s))
    if t.startswith("fixed[") and t.endswith("]"):
        return T.BinaryType()
    return None


def struct_with_field_ids(
    fields: list[dict], nested: bool = False
) -> T.StructType | None:
    """Spark StructType for an Iceberg schema field list, each field
    carrying ``parquet.field.id`` metadata so Spark's parquet reader
    resolves columns by id.  None when any field's type is unknown
    (caller falls back to plain name-based reads).  ``nested=True``
    admits nested types: struct children carry their own ids, which
    BOTH consumers honor — Spark's native field-id reader resolves ids
    at every nesting level (engine path), and the DataSource's Arrow
    remap does its own per-file child resolution."""
    out = []
    for f in fields:
        dt = iceberg_type_to_spark(f.get("type"), nested=nested)
        if dt is None:
            return None
        out.append(
            T.StructField(
                f["name"],
                dt,
                nullable=not f.get("required", False),
                metadata={SPARK_FIELD_ID_KEY: int(f["id"])},
            )
        )
    return T.StructType(out)


def dml_field_id_stamp(manifest) -> dict:
    """``{column_name: field_id}`` when a DML/writer data file landing
    on this table should carry parquet field ids — empty dict
    otherwise.  The rule (round 13): stamp iff the table's EXISTING
    data files carry ids (one driver-side footer probe on the first
    file), or the table is empty and its declared schema has ids.
    Writing the opposite class would create a mixed id-ful/id-less
    file group, which the engine scan rejects loudly."""
    fields = {
        f["name"]: int(f["id"])
        for f in (manifest.schema_fields or [])
        if f.get("id") is not None
    }
    if not fields:
        return {}
    if manifest.data_files:
        import pyarrow.parquet as _pq

        from iceberg_compaction_spark.sources.fileio import open_input

        try:
            with open_input(
                manifest.data_files[0].data_file_path
            ) as fh:
                if not file_field_ids(_pq.read_schema(fh)):
                    return {}  # id-less table: stay id-less
        except Exception:
            return {}
    return fields


def enable_field_id_reads(spark) -> None:
    """Turn on Spark's parquet field-id resolution (runtime SQL conf,
    default off).  Only activates for reads whose REQUESTED schema
    carries ``parquet.field.id`` metadata, so it is safe session-wide —
    every other read keeps name-based resolution."""
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")


# ---------------------------------------------------------------------------
# Arrow side (fixture writers + DataSource executors)
# ---------------------------------------------------------------------------


def iceberg_type_to_arrow(t):
    import pyarrow as pa

    if _is_struct_type(t):
        children = []
        for f in t.get("fields", []):
            ct = iceberg_type_to_arrow(f.get("type"))
            if ct is None:
                return None
            children.append(
                pa.field(
                    f["name"],
                    ct,
                    nullable=not f.get("required", False),
                    metadata={ARROW_FIELD_ID_KEY: str(f["id"]).encode()},
                )
            )
        return pa.struct(children)
    if _is_list_type(t):
        # lists/maps evolve on the Arrow path: primitive elements via a
        # plain cast (widening) or typed-null projection, struct
        # elements via the offset-preserving child remap in
        # ``_remap_array`` (the values buffer is re-projected by field
        # id; offsets and validity carry through unchanged)
        et = iceberg_type_to_arrow(t.get("element"))
        return pa.list_(et) if et is not None else None
    if _is_map_type(t):
        kt = iceberg_type_to_arrow(t.get("key"))
        vt = iceberg_type_to_arrow(t.get("value"))
        return pa.map_(kt, vt) if kt is not None and vt is not None else None
    if t in ("geometry", "geography") or (
        isinstance(t, str)
        and (t.startswith("geometry(") or t.startswith("geography("))
    ):
        return pa.binary()
    if t == "variant":
        # v3 variant physical group (see iceberg_type_to_spark)
        return pa.struct(
            [
                pa.field("metadata", pa.binary(), nullable=True),
                pa.field("value", pa.binary(), nullable=True),
            ]
        )
    m = {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "date": pa.date32(),
        "string": pa.string(),
        "uuid": pa.string(),
        "binary": pa.binary(),
        "time": pa.int64(),
        "timestamp": pa.timestamp("us"),
        "timestamptz": pa.timestamp("us", tz="UTC"),
    }
    if not isinstance(t, str):
        return None
    if t in m:
        return m[t]
    if t.startswith("decimal(") and t.endswith(")"):
        p, s = t[len("decimal("):-1].split(",")
        return pa.decimal128(int(p), int(s))
    if t.startswith("fixed[") and t.endswith("]"):
        return pa.binary()
    return None


def arrow_schema_with_ids(schema, ids_by_name: dict[str, int]):
    """Attach ``PARQUET:field_id`` metadata to an existing Arrow schema
    — how fixtures/writers produce spec-compliant files whose columns
    stay resolvable across renames."""
    import pyarrow as pa

    return pa.schema(
        [
            f.with_metadata(
                {ARROW_FIELD_ID_KEY: str(ids_by_name[f.name]).encode()}
            )
            if f.name in ids_by_name
            else f
            for f in schema
        ],
        metadata=schema.metadata,
    )


def file_field_ids(arrow_schema) -> dict[int, str]:
    """field id -> physical column name from a file's Arrow schema;
    empty when the file carries no ids (pre-Iceberg import)."""
    out: dict[int, str] = {}
    for f in arrow_schema:
        meta = f.metadata or {}
        fid = meta.get(ARROW_FIELD_ID_KEY)
        if fid is not None:
            try:
                out[int(fid.decode())] = f.name
            except ValueError:
                pass
    return out


NAME_MAPPING_PROP = "schema.name-mapping.default"


def parse_name_mapping(mapping_json: str | None) -> dict[int, tuple]:
    """Iceberg's ``schema.name-mapping.default`` table property:
    field id -> candidate PHYSICAL names, for files that carry NO
    parquet field ids (Hive/Spark imports whose columns were later
    renamed).  Spec shape: a JSON list of ``{"field-id": N, "names":
    [..]}`` entries; nested ``fields`` are flattened in (child ids are
    globally unique in an Iceberg schema, so one flat dict suffices).
    Malformed input returns {} — the reader then keeps the default
    mapping (current name = physical name) rather than failing the
    scan over an optional property."""
    import json

    if not mapping_json:
        return {}
    try:
        entries = json.loads(mapping_json)
    except (ValueError, TypeError):
        return {}
    out: dict[int, tuple] = {}

    def walk(items):
        if not isinstance(items, list):
            return
        for e in items:
            if not isinstance(e, dict):
                continue
            fid = e.get("field-id")
            names = e.get("names")
            if fid is not None and isinstance(names, list) and names:
                out[int(fid)] = tuple(str(n) for n in names)
            walk(e.get("fields"))

    walk(entries)
    return out


def physical_name_map(
    arrow_schema, fields: list[dict], name_mapping: dict[int, tuple] | None = None
) -> dict[str, str]:
    """current column name -> PHYSICAL name in this file.  Resolution:
    by field id when the file carries ids; otherwise through the
    table's name mapping (first candidate name present in the file),
    falling back to the identity mapping (current name = physical
    name — Iceberg's default form).  Columns absent from the file
    (added after it was written) are omitted — readers project NULL
    for them."""
    by_id = file_field_ids(arrow_schema)
    names = {f.name for f in arrow_schema}
    out = {}
    for f in fields:
        if by_id:
            phys = by_id.get(int(f["id"]))
        else:
            phys = f["name"] if f["name"] in names else None
            if phys is None and name_mapping:
                phys = next(
                    (
                        n
                        for n in name_mapping.get(int(f["id"]), ())
                        if n in names
                    ),
                    None,
                )
        if phys is not None:
            out[f["name"]] = phys
    return out


def _same_arrow_shape(a, b) -> bool:
    """Structural type equality that ignores list/map CHILD FIELD NAMES
    (parquet files say ``element``/``key_value``, constructed types say
    ``item``) — casting on a name-only difference would rebuild every
    batch for nothing.  Struct field names stay significant (they ARE
    the projection)."""
    import pyarrow.types as pat

    if pat.is_list(a) and pat.is_list(b):
        return _same_arrow_shape(a.value_type, b.value_type)
    if pat.is_large_list(a) and pat.is_large_list(b):
        return _same_arrow_shape(a.value_type, b.value_type)
    if pat.is_map(a) and pat.is_map(b):
        return _same_arrow_shape(a.key_type, b.key_type) and (
            _same_arrow_shape(a.item_type, b.item_type)
        )
    return a.equals(b)


def _struct_child_index(struct_type) -> dict[int, int]:
    """field id -> child position for an Arrow struct type (from the
    ``PARQUET:field_id`` metadata pyarrow round-trips on nested fields);
    empty when the children carry no ids."""
    out: dict[int, int] = {}
    for i in range(struct_type.num_fields):
        meta = struct_type.field(i).metadata or {}
        fid = meta.get(ARROW_FIELD_ID_KEY)
        if fid is not None:
            try:
                out[int(fid.decode())] = i
            except ValueError:
                pass
    return out


def _remap_struct_array(arr, fields: list[dict]):
    """Recursively project one StructArray onto the current schema's
    struct ``fields``: children resolve by field id (name fallback for
    id-less files), renames are zero-copy, absent children become typed
    nulls, narrower physical children widen.  Parent validity carries
    through unchanged."""
    import pyarrow as pa

    st = arr.type
    by_id = _struct_child_index(st)
    by_name = {st.field(i).name: i for i in range(st.num_fields)}
    n = len(arr)
    children, names = [], []
    for f in fields:
        idx = (
            by_id.get(int(f["id"]))
            if by_id
            else by_name.get(f["name"])
        )
        ft = f.get("type")
        at = iceberg_type_to_arrow(ft)
        if idx is not None:
            children.append(_remap_array(arr.field(idx), ft))
        else:
            children.append(pa.nulls(n, type=at or pa.null()))
        names.append(f["name"])
    return pa.StructArray.from_arrays(
        children,
        names=names,
        mask=arr.is_null() if arr.null_count else None,
    )


def _null_marked_offsets(arr):
    """The array's list/map offsets with entries NULLED where the
    parent entry is null — the encoding ``MapArray.from_arrays``
    (which has no ``mask`` parameter) uses to carry entry validity."""
    import numpy as np
    import pyarrow as pa

    offs = arr.offsets
    if not arr.null_count:
        return offs
    ov = offs.to_numpy(zero_copy_only=False)
    invalid = ~arr.is_valid().to_numpy(zero_copy_only=False)
    return pa.array(
        ov, type=offs.type, mask=np.append(invalid, False)
    )


def _remap_array(arr, ft):
    """Project ONE Arrow array onto the Iceberg type ``ft``.

    Structs re-project children by field id (``_remap_struct_array``);
    lists/maps remap their VALUES buffer recursively and rebuild with
    the original offsets + validity (zero-copy for the offsets — a
    struct rename inside ``list<struct<...>>`` touches only child
    metadata); anything else widens via Arrow cast when the physical
    type is narrower, or passes through untouched."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if _is_struct_type(ft) and pa.types.is_struct(arr.type):
        return _remap_struct_array(arr, ft["fields"])
    if _is_list_type(ft) and (
        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
    ):
        values = _remap_array(arr.values, ft.get("element"))
        cls = (
            pa.LargeListArray
            if pa.types.is_large_list(arr.type)
            else pa.ListArray
        )
        return cls.from_arrays(
            arr.offsets,
            values,
            mask=arr.is_null() if arr.null_count else None,
        )
    if _is_map_type(ft) and pa.types.is_map(arr.type):
        return pa.MapArray.from_arrays(
            _null_marked_offsets(arr),
            _remap_array(arr.keys, ft.get("key")),
            _remap_array(arr.items, ft.get("value")),
        )
    at = iceberg_type_to_arrow(ft)
    if at is not None and not _same_arrow_shape(arr.type, at):
        return arr.cast(at)
    return arr


def remap_batch_table(table, name_map: dict[str, str], fields: list[dict]):
    """Project one Arrow table onto the CURRENT schema: physical columns
    renamed per ``name_map`` (zero-copy), absent columns materialized as
    typed nulls, struct columns recursively re-projected by CHILD field
    id (rename/add/promote inside a struct).  Applied per batch on
    executors — no driver involvement, no shuffle; the projection is
    built once per file."""
    import pyarrow as pa

    cols, arrays = [], []
    n = table.num_rows
    for f in fields:
        cur = f["name"]
        phys = name_map.get(cur)
        ft = f.get("type")
        at = iceberg_type_to_arrow(ft)
        if phys is not None and phys in table.column_names:
            # struct/list/map columns re-project recursively by child
            # field id; primitives widen via Arrow cast when the file's
            # physical type is narrower (Iceberg promotion: int->long,
            # float->double, decimal widening); shape-equal types pass
            # through zero-copy
            arrays.append(_remap_array(table.column(phys), ft))
        elif f.get("initial-default") is not None:
            # v3 default values: a column ABSENT from the file was
            # added after the file was written, so its rows take the
            # field's initial-default — exactly and only the absent
            # case (post-add files with explicit NULLs keep them)
            arrays.append(
                pa.array([f["initial-default"]] * n, type=at)
            )
        else:
            arrays.append(pa.nulls(n, type=at or pa.null()))
        cols.append(cur)
    return pa.Table.from_arrays(arrays, names=cols)
