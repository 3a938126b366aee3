"""Iceberg v3 VARIANT columns (semi-structured data) over Spark.

The v3 spec adds a ``variant`` type for semi-structured values: each
cell is a pair of binary fields — ``metadata`` (the field-name
dictionary) and ``value`` (the encoded value) — in the open *variant
binary encoding* shared by Apache Spark, Apache Iceberg v3, and the
Parquet VARIANT logical type.  This module supplies the engine's
variant tier (VERDICT r12 #5):

- **Physical layout**: ``struct<metadata: binary, value: binary>`` —
  the spec's group layout *without* the Parquet VARIANT logical-type
  annotation.  Deliberate: Spark 4 writes VARIANT-annotated footers
  that this environment's pyarrow cannot parse at all ("Thrift
  LogicalType that is not recognized"), which would break every
  footer-probing path (planner stats, field-id probes, the
  DataSource's Arrow reader).  An annotation-less group reads as a
  plain struct everywhere while the PAYLOAD stays the open encoding,
  so a JVM engine can reconstruct true variants from these bytes.

- **Codec**: pyspark's PUBLIC pure-Python implementation of the
  encoding (``pyspark.sql.variant_utils.VariantUtils`` — the same
  module that backs ``VariantVal``), run executor-side in
  Arrow-batched pandas UDFs.  Byte-compatibility with the JVM's
  ``parse_json``/``variant_get`` is pinned in tests/test_variant.py,
  not assumed.

- **Extraction**: :func:`variant_get_path` decodes only the requested
  path per row (object fields resolve through the metadata dictionary
  without materializing siblings).  On clusters whose Spark reads the
  reconstructed variant natively, the same logical op is
  ``F.variant_get`` — the JVM fast path; this module is the engine's
  env-independent implementation with identical semantics.

Scale shape: encoding/extraction are Arrow-batched column passes (no
row-at-a-time Python UDF registration, no driver collect); a variant
column shuffles as two binary buffers like any other column.  Reference
parity: the reference passes Iceberg schemas through opaquely
(SURVEY §1.2) — variant is net-new surface the v3 spec defines.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "VARIANT_SPARK_TYPE",
    "json_to_variant",
    "variant_to_json",
    "variant_get_path",
    "shred_variant",
    "shredded_column_name",
    "shred_variant_spec",
    "unshred_variant_spec",
    "variant_spec_shredded_fields",
]

# the v3 physical group: field names fixed by the spec
VARIANT_SPARK_TYPE = T.StructType(
    [
        T.StructField("metadata", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
    ]
)

_CAST = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def json_to_variant(
    df: DataFrame, json_col: str, out_col: str = "variant"
) -> DataFrame:
    """Encode a JSON-string column into a variant ``(metadata, value)``
    struct column using the open variant binary encoding.  NULL/invalid
    JSON encodes as a NULL struct cell (mirroring ``try_parse_json``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(VARIANT_SPARK_TYPE)
    def _encode(s):
        import pandas as pd
        from pyspark.sql.types import VariantVal

        # memoize per batch: real event/props streams repeat values
        # heavily (bounded enums, templated payloads), so encoding each
        # DISTINCT string once turns a per-row codec loop into a
        # per-distinct one — for low-cardinality columns this is the
        # difference between O(rows) and O(values) Python work; for
        # high-cardinality ones the extra hash pass is noise
        memo: dict = {}

        def enc(j):
            hit = memo.get(j)
            if hit is None:
                try:
                    v = VariantVal.parseJson(j)
                    hit = (bytes(v.metadata), bytes(v.value))
                except Exception:
                    hit = (None, None)
                memo[j] = hit
            return hit

        metas, vals = [], []
        for j in s:
            m, v = (None, None) if j is None else enc(j)
            metas.append(m)
            vals.append(v)
        return pd.DataFrame({"metadata": metas, "value": vals})

    return df.withColumn(out_col, _encode(F.col(json_col)))


def variant_to_json(
    df: DataFrame, variant_col: str, out_col: str = "json"
) -> DataFrame:
    """Decode a variant struct column back to its canonical JSON string
    (Spark's ``to_json(variant)`` rendering — same codec)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _decode(pdf):
        import pandas as pd
        from pyspark.sql.variant_utils import VariantUtils

        memo: dict = {}
        out = []
        for m, v in zip(pdf["metadata"], pdf["value"]):
            if m is None or v is None:
                out.append(None)
                continue
            k = (bytes(m), bytes(v))
            hit = memo.get(k)
            if hit is None:
                hit = VariantUtils.to_json(k[1], k[0])
                memo[k] = hit
            out.append(hit)
        return pd.Series(out)

    return df.withColumn(out_col, _decode(F.col(variant_col)))


# ---------------------------------------------------------------------------
# Shredding (the v3 spec's "variant shredding": frequently-extracted
# paths materialize as TYPED sibling columns at write time, so reads
# get plain-column speed — predicate pushdown, column pruning, zero
# decode).  The engine's shredded column for path ``$.a.b`` on variant
# column ``v`` is ``v__a_b`` (deterministic, collision-checked); the
# shredded-path registry travels as a table property
# ``variant.shred.<col> = $.a.b:long,...`` so any reader can discover
# which paths are shredded without probing files.
# ---------------------------------------------------------------------------

SHRED_PROP_PREFIX = "variant.shred."


def shredded_column_name(variant_col: str, path: str) -> str:
    """Deterministic shredded-column name for ``(column, path)``:
    ``$.a.b[0]`` on ``v`` -> ``v__a_b_0``."""
    steps = _parse_path(path)
    return variant_col + "__" + "_".join(str(s) for s in steps)


def shred_variant(
    df: DataFrame, variant_col: str, paths: dict
) -> DataFrame:
    """Materialize typed sibling columns for the given
    ``{path: target_type}`` map (one Arrow-batched decode pass TOTAL —
    all paths extract from a single per-row decode, not one UDF per
    path).  Run at WRITE time; readers then take the zero-Python fast
    path in :func:`variant_get_path`."""
    from pyspark.sql.functions import pandas_udf

    items = sorted(paths.items())
    for p, t in items:
        if t not in _CAST:
            raise ValueError(f"unsupported shred type {t!r} for {p!r}")
    parsed = [(_parse_path(p), p) for p, _ in items]
    out_names = [shredded_column_name(variant_col, p) for p, _ in items]
    clash = set(out_names) & set(df.columns)
    if clash:
        raise ValueError(f"shredded column name collision: {sorted(clash)}")
    out_schema = T.StructType(
        [
            T.StructField(n, T.StringType(), True)
            for n in out_names
        ]
    )

    @pandas_udf(out_schema)
    def _shred(pdf):
        import pandas as pd
        from pyspark.sql.variant_utils import VariantUtils

        def row_values(m, v):
            py = None
            if m is not None and v is not None:
                try:
                    py = VariantUtils.to_python(v, m)
                except Exception:
                    py = None
            vals = []
            for steps, _p in parsed:
                cur = py
                for s in steps:
                    if isinstance(s, str) and isinstance(cur, dict):
                        cur = cur.get(s)
                    elif isinstance(s, int) and isinstance(cur, list):
                        cur = cur[s] if 0 <= s < len(cur) else None
                    else:
                        cur = None
                    if cur is None:
                        break
                if cur is None:
                    vals.append(None)
                elif isinstance(cur, bool):
                    vals.append("true" if cur else "false")
                elif isinstance(cur, (dict, list)):
                    import json as _json

                    vals.append(_json.dumps(cur, separators=(",", ":")))
                else:
                    vals.append(str(cur))
            return tuple(vals)

        memo: dict = {}  # per-batch distinct-value memo (see _encode)
        cols: dict = {n: [] for n in out_names}
        for m, v in zip(pdf["metadata"], pdf["value"]):
            k = (
                (bytes(m), bytes(v))
                if m is not None and v is not None
                else (None, None)
            )
            if k not in memo:
                memo[k] = row_values(k[0], k[1])
            for n, val in zip(out_names, memo[k]):
                cols[n].append(val)
        return pd.DataFrame(cols)

    packed = _shred(F.col(variant_col)).alias("__shred")
    out = df.withColumn("__shred", packed)
    for (p, t), n in zip(items, out_names):
        out = out.withColumn(n, F.col(f"__shred.{n}").cast(_CAST[t]))
    return out.drop("__shred")


# ---------------------------------------------------------------------------
# Spec-shape shredding (round 14 — VERDICT r13 #4).  The Parquet/
# Iceberg-v3 variant-shredding spec nests the shredded fields INSIDE
# the variant group itself:
#
#     group v {            # the variant column
#       binary metadata
#       binary value       # residual (null when fully shredded)
#       group typed_value {           # one group per shredded field
#         group k { binary value      # per-field residual (unused here)
#                   <type> typed_value }
#       }
#     }
#
# so an EXTERNAL v3 reader discovers the shredded fields from the file
# footer alone — unlike the engine-named sibling columns above, which
# need the ``variant.shred.*`` table property.  Both tiers coexist:
# sibling columns feed this engine's pruning fast path; the spec group
# is the interchange shape.  Shred targets may be scalars
# (``"$.k": "long"``), nested object fields at any depth
# (``"$.a.b": "string"`` — the spec's recursive object shredding,
# field groups nesting inside field groups), and arrays of scalars
# (``"$.xs": "array<long>"`` — the spec's repeated ``typed_value``
# group, one ``(value, typed_value)`` element group per item).
#
# Writer policy (spec-legal "best effort" shredding): a row shreds
# only when its value is an object and every requested path either is
# absent or fits its declared shape (object steps are objects, array
# targets are arrays whose EVERY element fits the element type); any
# other row stores its COMPLETE original encoding in the top-level
# ``value`` with ``typed_value`` null — the spec's designated fallback
# for values that do not match the shredding schema.  All-or-nothing
# per ROW, deliberately: the spec also allows per-field and
# per-element local fallbacks (partial residuals inside inner
# ``value`` slots), but those inner residuals must share the top-level
# metadata dictionary, which the public codec cannot re-encode
# against; the row-level fallback is always spec-correct and keeps the
# reader algorithm a single ``typed_value IS NULL`` dispatch.  For
# shredded rows the top-level ``value`` holds the re-encoded residual
# object (the non-shredded fields; a partially-shredded nested
# object's remaining fields ride there under their original key — the
# inner group ``value`` slots stay null), or null when none remain;
# shredded field names are carried by the parquet schema, so the
# row's ``metadata`` dictionary only needs to cover the residual —
# which is exactly what re-encoding produces.
# ---------------------------------------------------------------------------


def _descend(cur: dict, s: str, kind: str, p: str) -> dict:
    """Get-or-create an interior ``kind`` node named ``s`` in ``cur``
    (conflicting kinds raise) and return its subtree."""
    node = cur.get(s)
    if node is None:
        node = (kind, {})
        cur[s] = node
    elif node[0] != kind:
        raise ValueError(
            f"shred path conflict at {s!r} in {p!r}: already a "
            f"{node[0]} target"
        )
    return node[1]


def _spec_tree(paths: dict) -> dict:
    """Parse ``{"$.a.b": "long", "$.xs": "array<long>",
    "$.items[].a": "long", ...}`` into a field tree ``{name:
    ("leaf", t) | ("array", t) | ("node", sub) | ("aobj", sub)}``.
    ``[]`` descends into ARRAY-OF-OBJECT elements (the spec's
    recursive element-group shape) and must be followed by at least
    one field (a scalar array shreds via an ``array<...>`` target on
    the field itself); one ``[]`` per path.  Numeric index steps are
    not shred targets; a path may not be both a leaf and a prefix of
    another."""
    tree: dict = {}
    for p, t in sorted(paths.items()):
        if "[]" in p:
            if p.count("[]") > 1:
                raise ValueError(
                    f"one '[]' per shred path (got {p!r}); nested "
                    f"array-of-array-of-object targets are out of scope"
                )
            outer_s, inner_s = p.split("[]", 1)
            if not inner_s.startswith("."):
                raise ValueError(
                    f"'[]' must be followed by a field (got {p!r}); a "
                    f"scalar array shreds via an array<...> target"
                )
            outer = _parse_path(outer_s)
            steps = _parse_path("$" + inner_s)
        else:
            outer = None
            steps = _parse_path(p)
        if (
            not steps
            or not all(isinstance(s, str) for s in steps)
            or (outer is not None and not all(isinstance(s, str) for s in outer))
        ):
            raise ValueError(
                f"spec shredding addresses object fields (got {p!r}); "
                f"array elements shred via an array<...> target on the "
                f"array field itself or an '[]' object descent"
            )
        if isinstance(t, str) and t.startswith("array<") and t.endswith(">"):
            kind, leaf_t = "array", t[len("array<"):-1]
        else:
            kind, leaf_t = "leaf", t
        if leaf_t not in _CAST:
            raise ValueError(f"unsupported shred type {t!r} for {p!r}")
        cur = tree
        if outer is not None:
            for s in outer[:-1]:
                cur = _descend(cur, s, "node", p)
            cur = _descend(cur, outer[-1], "aobj", p)
        for s in steps[:-1]:
            cur = _descend(cur, s, "node", p)
        if steps[-1] in cur:
            raise ValueError(f"shred path conflict: {p!r}")
        cur[steps[-1]] = (kind, leaf_t)
    return tree


def _element_group_type(t: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("value", T.BinaryType(), True),
            T.StructField("typed_value", t, True),
        ]
    )


def _tree_type(tree: dict) -> T.StructType:
    fields = []
    for name in sorted(tree):
        kind, sub = tree[name]
        if kind == "leaf":
            tv: T.DataType = _CAST[sub]
        elif kind == "array":
            tv = T.ArrayType(_element_group_type(_CAST[sub]), True)
        elif kind == "aobj":
            tv = T.ArrayType(
                _element_group_type(_tree_type(sub)), True
            )
        else:
            tv = _tree_type(sub)
        fields.append(T.StructField(name, _element_group_type(tv), True))
    return T.StructType(fields)


def variant_spec_shred_type(paths: dict) -> T.StructType:
    """Spark type of a spec-shredded variant column for ``paths`` —
    ``{"$.k": "long", "$.a.b": "string", "$.xs": "array<long>",
    "$.items[].a": "long"}``: scalars, nested object fields
    (recursive groups), arrays of scalars (repeated element groups),
    and arrays of OBJECTS (element groups whose typed_value is itself
    a field-group struct — the spec's full recursion)."""
    return T.StructType(
        [
            T.StructField("metadata", T.BinaryType(), True),
            T.StructField("value", T.BinaryType(), True),
            T.StructField("typed_value", _tree_type(_spec_tree(paths)), True),
        ]
    )


def _fits(py, t: str):
    """Typed value for the shredding target, or None when it doesn't
    fit (bool is NOT an int here — the variant encoding keeps them
    distinct types; the codec decodes JSON doubles as Decimal).
    Integer targets are RANGE-checked: an out-of-range value must take
    the documented whole-row unshredded fallback, not crash the write
    when Arrow refuses the cast."""
    from decimal import Decimal

    if t == "long" or t == "int":
        if not isinstance(py, int) or isinstance(py, bool):
            return None
        lo, hi = (
            (-(2**31), 2**31 - 1) if t == "int" else (-(2**63), 2**63 - 1)
        )
        return py if lo <= py <= hi else None
    if t == "double":
        if isinstance(py, bool):
            return None
        if isinstance(py, float):
            return py
        if not isinstance(py, (int, Decimal)):
            return None
        # Decimal (how the codec decodes JSON numbers) and wide ints
        # only shred to double when the float round-trip preserves the
        # stored digits exactly — _json_exact was added specifically so
        # the residual path keeps values digit-for-digit, and the typed
        # path must not be quietly lossier than the fallback it
        # replaces (ADVICE r14).  1.10 (format 'f' != repr(1.1)) and
        # 2**63-1 (beyond float53 mantissa) both take the documented
        # whole-row unshredded fallback instead.
        f = float(py)
        if isinstance(py, int):
            return f if int(f) == py else None
        return f if format(Decimal(repr(f)), "f") == format(py, "f") else None
    if t == "string":
        return py if isinstance(py, str) else None
    if t == "boolean":
        return py if isinstance(py, bool) else None
    return None


def _json_exact(obj) -> str:
    """JSON text preserving Decimal values digit-for-digit (emitted as
    plain JSON numbers via str(Decimal), which parseJson reads back as
    decimals) — json.dumps' ``default`` hook cannot do this (it would
    round through float, silently altering stored values on the
    shred/unshred write path)."""
    import json as _json
    from decimal import Decimal

    if obj is None:
        return "null"
    if obj is True:
        return "true"
    if obj is False:
        return "false"
    if isinstance(obj, Decimal):
        return format(obj, "f")
    if isinstance(obj, (int, float)):
        return _json.dumps(obj)
    if isinstance(obj, str):
        return _json.dumps(obj)
    if isinstance(obj, dict):
        return (
            "{"
            + ",".join(
                f"{_json.dumps(str(k))}:{_json_exact(v)}"
                for k, v in obj.items()
            )
            + "}"
        )
    if isinstance(obj, (list, tuple)):
        return "[" + ",".join(_json_exact(v) for v in obj) + "]"
    raise TypeError(f"not JSON-encodable: {type(obj).__name__}")


def shred_variant_spec(
    df: DataFrame, variant_col: str, paths: dict
) -> DataFrame:
    """Rewrite ``variant_col`` into the v3 spec's shredded group shape
    (see the block comment above) — run at WRITE time, one
    Arrow-batched decode pass.  The resulting column writes to parquet
    as the spec's footer-visible nested group; reads of a shredded
    path take a plain nested-column reference (zero Python)."""
    out_type = variant_spec_shred_type(paths)
    tree = _spec_tree(paths)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(out_type)
    def _spec_shred(pdf):
        import pandas as pd
        from pyspark.sql.types import VariantVal
        from pyspark.sql.variant_utils import VariantUtils

        from iceberg_compaction_spark.operators.variant_ops import _fits

        metas, residuals, typed_rows = [], [], []
        memo: dict = {}
        for m, v in zip(pdf["metadata"], pdf["value"]):
            if m is None or v is None:
                metas.append(None)
                residuals.append(None)
                typed_rows.append(None)
                continue
            k = (bytes(m), bytes(v))
            hit = memo.get(k)
            if hit is None:
                hit = _shred_one(k, tree, VariantVal, VariantUtils, _fits)
                memo[k] = hit
            metas.append(hit[0])
            residuals.append(hit[1])
            typed_rows.append(hit[2])
        return pd.DataFrame(
            {"metadata": metas, "value": residuals, "typed_value": typed_rows}
        )

    return df.withColumn(variant_col, _spec_shred(F.col(variant_col)))


class _ShredFallback(Exception):
    """Raised when a value does not match the shredding schema — the
    row takes the spec's whole-value unshredded fallback."""


def _shred_tree(py: dict, tree: dict, fits):
    """Recursively shred object ``py`` against the field tree ->
    ``(typed_dict, residual_dict)``; raises :class:`_ShredFallback`
    when any requested path is present but does not fit."""
    typed: dict = {}
    residual: dict = {}
    for name, (kind, sub) in tree.items():
        if name not in py:
            typed[name] = {"value": None, "typed_value": None}
            continue
        val = py[name]
        if kind == "leaf":
            tv = fits(val, sub)
            if tv is None:
                raise _ShredFallback
            typed[name] = {"value": None, "typed_value": tv}
        elif kind == "array":
            if not isinstance(val, list):
                raise _ShredFallback
            elems = []
            for e in val:
                tv = fits(e, sub)
                if tv is None:
                    raise _ShredFallback
                elems.append({"value": None, "typed_value": tv})
            typed[name] = {"value": None, "typed_value": elems}
        elif kind == "aobj":  # array of objects: shred each element
            if not isinstance(val, list):
                raise _ShredFallback
            elems = []
            elem_res = []
            any_res = False
            for e in val:
                if not isinstance(e, dict):
                    raise _ShredFallback
                e_typed, e_res = _shred_tree(e, sub, fits)
                elems.append({"value": None, "typed_value": e_typed})
                elem_res.append(e_res)
                any_res = any_res or bool(e_res)
            typed[name] = {"value": None, "typed_value": elems}
            if any_res:
                # positional residual list: element i's non-shredded
                # fields ({} when none) — unshred re-merges by index
                residual[name] = elem_res
        else:  # nested object
            if not isinstance(val, dict):
                raise _ShredFallback
            sub_typed, sub_res = _shred_tree(val, sub, fits)
            typed[name] = {"value": None, "typed_value": sub_typed}
            if sub_res:
                residual[name] = sub_res
    for k, v in py.items():
        if k not in tree:
            residual[k] = v
    return typed, residual


def _shred_one(k, tree, VariantVal, VariantUtils, fits):
    """(metadata, residual_value, typed_value_dict) for one distinct
    variant cell — module-level so the memoized UDF body stays flat."""
    meta, val = k
    try:
        py = VariantUtils.to_python(val, meta)
    except Exception:
        py = None
    unshredded = (meta, val, None)
    if not isinstance(py, dict):
        return unshredded
    try:
        typed, residual = _shred_tree(py, tree, fits)
    except _ShredFallback:
        return unshredded  # writer policy: whole-row fallback
    if not residual:
        return (meta, None, typed)
    try:
        from iceberg_compaction_spark.operators.variant_ops import (
            _json_exact,
        )

        rv = VariantVal.parseJson(_json_exact(residual))
        return (bytes(rv.metadata), bytes(rv.value), typed)
    except Exception:
        return unshredded


def _is_field_group(dt) -> bool:
    return (
        isinstance(dt, T.StructType)
        and len(dt.fields) == 2
        and set(dt.names) == {"value", "typed_value"}
        and isinstance(dt["value"].dataType, T.BinaryType)
    )


def variant_spec_shredded_fields(df: DataFrame, variant_col: str) -> dict:
    """``{dotted.path: spark_type_name}`` of every shredded LEAF
    discovered from the column's ``typed_value`` group — how a reader
    finds the fast paths from the SCHEMA alone (footer-visible, no
    table property needed).  Nested object fields appear as dotted
    paths (``a.b``); array targets as ``array<elem_type>``."""
    dt = df.schema[variant_col].dataType
    if not isinstance(dt, T.StructType) or "typed_value" not in dt.names:
        return {}
    tv = dt["typed_value"].dataType
    if not isinstance(tv, T.StructType):
        return {}

    out: dict = {}

    def walk(group: T.StructType, prefix: str) -> None:
        for f in group.fields:
            if not _is_field_group(f.dataType):
                continue
            inner = f.dataType["typed_value"].dataType
            path = prefix + f.name
            if isinstance(inner, T.StructType) and inner.fields and all(
                _is_field_group(c.dataType) for c in inner.fields
            ):
                walk(inner, path + ".")
            elif isinstance(inner, T.ArrayType) and _is_field_group(
                inner.elementType
            ):
                elem = inner.elementType["typed_value"].dataType
                if isinstance(elem, T.StructType) and elem.fields and all(
                    _is_field_group(c.dataType) for c in elem.fields
                ):
                    # array-of-object elements: recurse with the []
                    # descent marker
                    walk(elem, path + "[].")
                else:
                    out[path] = f"array<{elem.simpleString()}>"
            else:
                out[path] = inner.simpleString()

    walk(tv, "")
    return out


def _tree_from_fields(fields: dict) -> dict:
    """Rebuild the shred field tree from the dotted-path dict
    :func:`variant_spec_shredded_fields` returns (``a.b`` object
    descent, ``items[].a`` array-of-object descent)."""
    tree: dict = {}
    for path in sorted(fields):
        t = fields[path]
        steps = path.split(".")
        cur = tree
        for s in steps[:-1]:
            if s.endswith("[]"):
                name, kind = s[:-2], "aobj"
            else:
                name, kind = s, "node"
            node = cur.get(name)
            if node is None:
                node = (kind, {})
                cur[name] = node
            cur = node[1]
        kind = "array" if t.startswith("array<") else "leaf"
        cur[steps[-1]] = (kind, t)
    return tree


def _overlay_typed(tv, tree: dict, merged: dict) -> None:
    """Overlay a row's typed_value groups onto the decoded residual
    object — the spec reader's merge, recursing through nested object
    groups and expanding array element groups."""
    if not isinstance(tv, dict):
        return
    for name, (kind, sub) in tree.items():
        g = tv.get(name)
        gtv = g.get("typed_value") if isinstance(g, dict) else None
        if gtv is None:
            continue  # field absent from this row (writer left both null)
        if kind == "leaf":
            merged[name] = gtv
        elif kind == "array":
            merged[name] = [
                e.get("typed_value") if isinstance(e, dict) else None
                for e in gtv
            ]
        elif kind == "aobj":
            # per-element merge: the residual carries a positional
            # list of each element's non-shredded fields ({} when
            # none) — overlay each element's typed group onto it
            res_list = merged.get(name)
            out_elems = []
            for i, e in enumerate(gtv):
                base = (
                    res_list[i]
                    if isinstance(res_list, list)
                    and i < len(res_list)
                    and isinstance(res_list[i], dict)
                    else {}
                )
                etv = e.get("typed_value") if isinstance(e, dict) else None
                if etv is not None:
                    _overlay_typed(etv, sub, base)
                out_elems.append(base)
            merged[name] = out_elems
        else:
            inner = merged.get(name)
            if not isinstance(inner, dict):
                inner = {}
                merged[name] = inner
            _overlay_typed(gtv, sub, inner)


def unshred_variant_spec(
    df: DataFrame, variant_col: str, out_col: str | None = None
) -> DataFrame:
    """Reconstruct the plain ``(metadata, value)`` variant from a
    spec-shredded group (residual + typed fields merged, recursing
    through nested object groups and array element groups) — the
    full-fidelity read path; Arrow-batched Python by necessity, used
    when a consumer needs the COMPLETE value rather than a shredded
    fast path."""
    out_col = out_col or variant_col
    tree = _tree_from_fields(variant_spec_shredded_fields(df, variant_col))
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(VARIANT_SPARK_TYPE)
    def _unshred(pdf):
        import pandas as pd
        from pyspark.sql.types import VariantVal
        from pyspark.sql.variant_utils import VariantUtils

        from iceberg_compaction_spark.operators.variant_ops import (
            _overlay_typed,
        )

        metas, vals = [], []
        for m, v, tv in zip(
            pdf["metadata"], pdf["value"], pdf["typed_value"]
        ):
            if m is None:
                metas.append(None)
                vals.append(None)
                continue
            if tv is None:  # unshredded row: value IS the whole variant
                metas.append(bytes(m))
                vals.append(bytes(v) if v is not None else None)
                continue
            merged: dict = {}
            if v is not None:
                try:
                    res = VariantUtils.to_python(bytes(v), bytes(m))
                    if isinstance(res, dict):
                        merged.update(res)
                except Exception:
                    pass
            _overlay_typed(tv, tree, merged)
            try:
                from iceberg_compaction_spark.operators.variant_ops import (
                    _json_exact,
                )

                rv = VariantVal.parseJson(_json_exact(merged))
                metas.append(bytes(rv.metadata))
                vals.append(bytes(rv.value))
            except Exception:
                metas.append(None)
                vals.append(None)
        return pd.DataFrame({"metadata": metas, "value": vals})

    return df.withColumn(out_col, _unshred(F.col(variant_col)))


def shred_properties(variant_col: str, paths: dict) -> dict:
    """The table-property entry advertising shredded paths — set it on
    the manifest at write/commit time so readers discover the fast
    path without probing files."""
    spec = ",".join(f"{p}:{t}" for p, t in sorted(paths.items()))
    return {SHRED_PROP_PREFIX + variant_col: spec}


_PATH_RE = re.compile(r"\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]")


def _parse_path(path: str) -> list:
    """``$.a.b[2].c`` -> ['a', 'b', 2, 'c'] (the variant_get path
    grammar's common core; quoted bracket keys are out of scope)."""
    if not path.startswith("$"):
        raise ValueError(f"variant path must start with '$': {path!r}")
    steps: list = []
    pos = 1
    while pos < len(path):
        m = _PATH_RE.match(path, pos)
        if m is None:
            raise ValueError(f"bad variant path at {pos}: {path!r}")
        steps.append(m.group(1) if m.group(1) is not None else int(m.group(2)))
        pos = m.end()
    return steps


def _extract_udf(steps: list):
    """pandas_udf factory: per-row decode of ``(metadata, value)``
    along ``steps`` -> string (the cold extraction path, shared by the
    ad-hoc decode and the shredded read's residual fallback)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _extract(pdf):
        import pandas as pd
        from pyspark.sql.variant_utils import VariantUtils

        def walk(m, v):
            try:
                cur = VariantUtils.to_python(v, m)
            except Exception:
                return None
            for s in steps:
                if isinstance(s, str) and isinstance(cur, dict):
                    cur = cur.get(s)
                elif isinstance(s, int) and isinstance(cur, list):
                    cur = cur[s] if 0 <= s < len(cur) else None
                else:
                    cur = None
                if cur is None:
                    return None
            if isinstance(cur, bool):
                return "true" if cur else "false"
            if isinstance(cur, (dict, list)):
                import json as _json

                return _json.dumps(cur, separators=(",", ":"))
            return str(cur)

        memo: dict = {}  # per-batch distinct-value memo (see _encode)
        out = []
        for m, v in zip(pdf["metadata"], pdf["value"]):
            if m is None or v is None:
                out.append(None)
                continue
            k = (bytes(m), bytes(v))
            if k not in memo:
                memo[k] = walk(k[0], k[1])
            out.append(memo[k])
        return pd.Series(out)

    return _extract


def _spec_typed_ref(variant_col: str, steps: list, spec_fields: dict):
    """Column expr reading ``steps`` through the spec ``typed_value``
    groups, or None when the path is not fully shredded.  A generic
    walk of the discovered field tree: nested object groups
    (``$.a.b``), element access on a scalar-array target (``$.xs[1]``
    — try_element_at, out-of-range -> NULL, matching the try contract
    under ANSI mode), and indexed descent through array-of-object
    element groups (``$.items[2].a`` — try_element_at into the element
    group, then plain nested references)."""
    tree = _tree_from_fields(spec_fields)
    expr = F.col(f"{variant_col}.typed_value")
    i = 0
    while i < len(steps):
        s = steps[i]
        if not isinstance(s, str):
            return None  # an index where an object field is required
        node = tree.get(s)
        if node is None:
            return None
        kind, sub = node
        group = expr[s]
        if kind == "leaf":
            return group["typed_value"] if i == len(steps) - 1 else None
        if kind == "array":
            if i == len(steps) - 2 and isinstance(steps[i + 1], int):
                return F.try_element_at(
                    group["typed_value"], F.lit(steps[i + 1] + 1)
                )["typed_value"]
            return None  # whole-array / deeper reads reconstruct
        if kind == "aobj":
            if i + 1 >= len(steps) or not isinstance(steps[i + 1], int):
                return None  # whole-array-of-object reads reconstruct
            elem = F.try_element_at(
                group["typed_value"], F.lit(steps[i + 1] + 1)
            )
            expr = elem["typed_value"]
            tree = sub
            i += 2
            continue
        # interior object node
        if i == len(steps) - 1:
            return None  # partially-shredded object: reconstruct
        expr = group["typed_value"]
        tree = sub
        i += 1
    return None


def variant_get_path(
    df: DataFrame,
    variant_col: str,
    path: str,
    target_type: str = "string",
    out_col: str | None = None,
    assume_shredded: bool = False,
) -> DataFrame:
    """``variant_get``: extract ``path`` (``$.a.b[0]`` grammar) from a
    variant struct column and cast to ``target_type``.  Missing paths
    and NULL variants yield NULL (the ``try_variant_get`` contract —
    extraction over heterogeneous rows must not fail the job).

    Per-row decode walks the encoded value along the path; Python-side
    (Arrow-batched) by necessity here — on Spark clusters reading the
    reconstructed VariantType this is natively ``F.variant_get``.

    When ``out_col`` is omitted the output name derives from the
    variant column and the path (``<variant_col>_<path-slug>``) —
    NEVER a bare ``value``, which is a common real column name the
    default would silently clobber (ADVICE r13); an explicit
    ``out_col`` may still intentionally replace an existing column."""
    if target_type not in _CAST:
        raise ValueError(
            f"unsupported target_type {target_type!r}; "
            f"one of {sorted(_CAST)}"
        )
    steps = _parse_path(path)
    if out_col is None:
        import re as _re

        slug = _re.sub(r"[^A-Za-z0-9]+", "_", path).strip("_") or "root"
        out_col = f"{variant_col}_{slug}"
        if out_col in df.columns:
            raise ValueError(
                f"derived output column {out_col!r} already exists; "
                "pass out_col explicitly to overwrite or rename"
            )
    # SPEC-SHREDDED fast path: a path materialized in the column's own
    # ``typed_value`` group (shred_variant_spec) reads as a plain
    # nested-column reference — JVM-side, discovered from the schema
    # alone.  The spec's reader algorithm REQUIRES falling back to the
    # ``value`` residual for rows the writer left unshredded (ADVICE
    # r14), so by default the typed reference dispatches on the
    # row-level ``typed_value IS NULL`` marker and fallback rows decode
    # their residual in an Arrow pass whose input is NULL-masked for
    # every shredded row (near-free when no fallback rows exist, but
    # still a Python eval node in the plan).  ``assume_shredded=True``
    # drops the fallback for the strictly zero-Python plan — correct
    # only under a writer-guaranteed all-rows-shredded contract (e.g.
    # a pipeline that validates conformance at ingest).
    spec_fields = variant_spec_shredded_fields(df, variant_col)
    if spec_fields:
        typed = _spec_typed_ref(variant_col, steps, spec_fields)
        if typed is not None:
            typed = typed.cast(_CAST[target_type])
            if assume_shredded:
                return df.withColumn(out_col, typed)
            shred_marker = F.col(f"{variant_col}.typed_value")
            masked = F.when(
                shred_marker.isNull(),
                F.struct(
                    F.col(f"{variant_col}.metadata").alias("metadata"),
                    F.col(f"{variant_col}.value").alias("value"),
                ),
            )
            fb = _extract_udf(steps)(masked).try_cast(
                _CAST[target_type]
            )
            return df.withColumn(
                out_col,
                F.when(shred_marker.isNotNull(), typed).otherwise(fb),
            )
        # path OVERLAPS the shred tree without being fully shredded
        # (an intermediate object node like ``$.a`` when ``$.a.b`` is
        # shredded, or a whole-array read of an array target): the
        # residual alone is missing the typed fields, so extract over
        # the full reconstruction — correctness over speed on this
        # genuinely mixed shape.
        head = steps[0] if steps and isinstance(steps[0], str) else None
        if head is not None and any(
            k == head
            or k.startswith(head + ".")
            or k.startswith(head + "[]")
            for k in spec_fields
        ):
            rec_col = "__vg_rec"
            while rec_col in df.columns:
                rec_col += "_"
            rec = unshred_variant_spec(df, variant_col, rec_col)
            return variant_get_path(
                rec, rec_col, path, target_type, out_col
            ).drop(rec_col)
    # SIBLING-COLUMN fast path: the path was materialized as a typed
    # engine-named sibling column at write time (shred_variant) —
    # plain column reference, prunable, pushdown-eligible, zero
    # Python.  This is the 100 TB shape for hot paths; the decode
    # below is the cold-path fallback for ad-hoc extraction.
    shred_col = shredded_column_name(variant_col, path)
    if shred_col in df.columns:
        return df.withColumn(
            out_col, F.col(shred_col).cast(_CAST[target_type])
        )
    extracted = _extract_udf(steps)(F.col(variant_col))
    # try semantics end-to-end: a value of the WRONG type reads NULL
    # (try_variant_get contract), never an ANSI cast failure
    return df.withColumn(
        out_col, extracted.try_cast(_CAST[target_type])
    )
