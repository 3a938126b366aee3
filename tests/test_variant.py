"""Iceberg v3 VARIANT columns (operators/variant_ops.py).

Interop is the point: the engine's variant payloads use pyspark's
PUBLIC pure-Python codec for the open variant binary encoding, and the
tests here prove byte-compatibility against Spark's JVM-side
``parse_json`` / ``variant_get`` / ``to_json(variant)`` — the same
encoding Iceberg v3 specifies for variant columns.  The physical
layout is the spec's ``struct<metadata: binary, value: binary>`` group
(annotation-less so pyarrow footer probes keep working; see the module
doc), and the field-id evolution test proves a variant column renames
metadata-only like any other field.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.operators.variant_ops import (
    VARIANT_SPARK_TYPE,
    json_to_variant,
    variant_get_path,
    variant_to_json,
)

JS = [
    '{"a": 1, "b": {"c": [10, 20], "d": "x"}, "e": true, "f": 2.5}',
    '{"a": -7, "b": {"c": [], "d": "y (z)"}, "e": false}',
    '{"a": 0, "g": null}',
    "[1, 2, 3]",
    '"bare string"',
    "42",
    None,
]


@pytest.fixture()
def vdf(spark):
    df = spark.createDataFrame([(j,) for j in JS], "j string")
    return json_to_variant(df, "j", "v")


def test_encoding_is_byte_compatible_with_jvm_parse_json(spark, vdf):
    """Our (metadata, value) pairs must equal what the JVM's parse_json
    produces for the same JSON — the encoding is one spec."""
    ours = {
        r["j"]: (
            bytes(r["v"]["metadata"]) if r["v"]["metadata"] else None,
            bytes(r["v"]["value"]) if r["v"]["value"] else None,
        )
        for r in vdf.collect()
    }
    jvm = {
        r["j"]: r["pv"]
        for r in spark.createDataFrame([(j,) for j in JS if j], "j string")
        .select("j", F.parse_json("j").alias("pv"))
        .collect()
    }
    for j, v in jvm.items():
        assert ours[j] == (bytes(v.metadata), bytes(v.value)), j
    assert ours[None] == (None, None)


def test_variant_to_json_matches_jvm_rendering(spark, vdf):
    got = {r["j"]: r["json"] for r in variant_to_json(vdf, "v").collect()}
    want = {
        r["j"]: r["js"]
        for r in spark.createDataFrame([(j,) for j in JS if j], "j string")
        .select("j", F.to_json(F.parse_json("j")).alias("js"))
        .collect()
    }
    for j, js in want.items():
        assert got[j] == js, j
    assert got[None] is None


def test_variant_get_path_matches_native_variant_get(spark, vdf):
    """Path extraction semantics == Spark's native variant_get over
    the same variants (try semantics: missing path -> NULL)."""
    cases = [
        ("$.a", "long"),
        ("$.b.c[1]", "long"),
        ("$.b.d", "string"),
        ("$.e", "boolean"),
        ("$.f", "double"),
        ("$.missing.deep", "string"),
        ("$[0]", "long"),
    ]
    native = spark.createDataFrame(
        [(j,) for j in JS if j], "j string"
    ).select("j", F.parse_json("j").alias("pv"))
    for path, t in cases:
        ours = {
            r["j"]: r["out"]
            for r in variant_get_path(vdf, "v", path, t, "out").collect()
        }
        want = {
            r["j"]: r["out"]
            for r in native.select(
                "j", F.try_variant_get("pv", path, t).alias("out")
            ).collect()
        }
        for j, val in want.items():
            assert ours[j] == val, (path, t, j)
        assert ours[None] is None, (path, t)


def test_invalid_json_encodes_null(spark):
    df = spark.createDataFrame([("not json",), ("{broken",)], "j string")
    rows = json_to_variant(df, "j", "v").collect()
    assert all(r["v"]["metadata"] is None for r in rows)


def test_variant_path_grammar():
    from iceberg_compaction_spark.operators.variant_ops import _parse_path

    assert _parse_path("$.a.b[2].c") == ["a", "b", 2, "c"]
    assert _parse_path("$[0][1]") == [0, 1]
    with pytest.raises(ValueError):
        _parse_path("a.b")
    with pytest.raises(ValueError):
        _parse_path("$.a[b]")


def test_variant_column_field_id_rename_roundtrip(spark, tmp_path):
    """A variant column in the declared Iceberg schema: stored as the
    spec's binary group, readable after a field-id RENAME (metadata-only
    evolution), payload intact through MOR."""
    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources import schema_evo as se
    from iceberg_compaction_spark.sources.ingest import read_table_mor
    from iceberg_compaction_spark.sources.manifest import Manifest

    # the spark->parquet write of our struct carries top-level ids
    root = str(tmp_path / "vt")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, JS[i % 3]) for i in range(6)], "id long, j string"
    )
    v = json_to_variant(df, "j", "payload").select("id", "payload")
    pdf = v.toPandas()
    arrow_schema = se.arrow_schema_with_ids(
        pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field(
                    "payload",
                    pa.struct(
                        [
                            pa.field("metadata", pa.binary()),
                            pa.field("value", pa.binary()),
                        ]
                    ),
                ),
            ]
        ),
        {"id": 1, "payload": 2},
    )
    path = os.path.join(root, "a.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=arrow_schema), path
    )

    fields_v1 = [
        {"id": 1, "name": "id", "type": "long", "required": True},
        {"id": 2, "name": "payload", "type": "variant", "required": False},
    ]
    m = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=1,
        schema_fields=fields_v1,
        data_files=[
            FileScanTask(
                data_file_path=path,
                length=os.path.getsize(path),
                file_size_in_bytes=os.path.getsize(path),
                record_count=6,
                sequence_number=1,
            )
        ],
    )
    out = read_table_mor(spark, m)
    assert out.schema["payload"].dataType == VARIANT_SPARK_TYPE
    a = variant_get_path(out, "payload", "$.a", "long", "a")
    assert {r["id"]: r["a"] for r in a.collect()} == {
        i: (1, -7, 0)[i % 3] for i in range(6)
    }

    # rename by field id: the file still carries "payload"; the table
    # schema now names it "doc" — id resolution makes it metadata-only
    m.evolve_schema(
        [
            {"id": 1, "name": "id", "type": "long", "required": True},
            {"id": 2, "name": "doc", "type": "variant", "required": False},
        ]
    )
    out2 = read_table_mor(spark, m)
    assert "doc" in out2.columns and "payload" not in out2.columns
    a2 = variant_get_path(out2, "doc", "$.a", "long", "a")
    assert {r["id"]: r["a"] for r in a2.collect()} == {
        i: (1, -7, 0)[i % 3] for i in range(6)
    }


def test_datasource_reads_variant_column(spark, tmp_path):
    """The iceberg-table DataSource (executor-side pyarrow reader)
    surfaces a variant column as the physical binary group; extraction
    over the DataSource read matches the engine-scan read."""
    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources import schema_evo as se
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.datasource import register
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "vt")
    os.makedirs(root)
    df = spark.createDataFrame(
        [(i, JS[i % 3]) for i in range(6)], "id long, j string"
    )
    v = json_to_variant(df, "j", "payload").select("id", "payload")
    arrow_schema = se.arrow_schema_with_ids(
        pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field(
                    "payload",
                    pa.struct(
                        [
                            pa.field("metadata", pa.binary()),
                            pa.field("value", pa.binary()),
                        ]
                    ),
                ),
            ]
        ),
        {"id": 1, "payload": 2},
    )
    path = os.path.join(root, "a.parquet")
    pq.write_table(
        pa.Table.from_pandas(v.toPandas(), schema=arrow_schema), path
    )
    m = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=1,
        schema_fields=[
            {"id": 1, "name": "id", "type": "long", "required": True},
            {"id": 2, "name": "payload", "type": "variant",
             "required": False},
        ],
        data_files=[
            FileScanTask(
                data_file_path=path,
                length=os.path.getsize(path),
                file_size_in_bytes=os.path.getsize(path),
                record_count=6,
                sequence_number=1,
            )
        ],
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("vtab", m)
    register(spark)
    out = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "vtab")
        .load()
    )
    assert out.schema["payload"].dataType == VARIANT_SPARK_TYPE
    a = variant_get_path(out, "payload", "$.a", "long", "a")
    assert {r["id"]: r["a"] for r in a.collect()} == {
        i: (1, -7, 0)[i % 3] for i in range(6)
    }


def test_shred_variant_and_fast_path(spark):
    """Shredding (v3 spec's typed sibling columns): one decode pass
    materializes all requested paths; variant_get_path over a shredded
    frame takes the zero-Python fast path and matches the decode path;
    the plan for the fast path contains NO Python eval node."""
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_properties,
        shred_variant,
        shredded_column_name,
    )

    df = spark.createDataFrame([(j,) for j in JS], "j string")
    v = json_to_variant(df, "j", "v")
    shredded = shred_variant(
        v, "v", {"$.a": "long", "$.b.d": "string", "$.f": "double"}
    )
    assert shredded_column_name("v", "$.a") == "v__a"
    assert shredded_column_name("v", "$.b.c[0]") == "v__b_c_0"

    # fast path == cold path, value for value
    for path, t in [("$.a", "long"), ("$.b.d", "string"), ("$.f", "double")]:
        fast = [
            r["out"]
            for r in variant_get_path(shredded, "v", path, t, "out")
            .select("out")
            .collect()
        ]
        cold = [
            r["out"]
            for r in variant_get_path(v, "v", path, t, "out")
            .select("out")
            .collect()
        ]
        assert fast == cold, path

    # the fast path's plan is Python-free over a STORED shredded table
    # (the write-time decode already paid for every future read)
    import tempfile

    d = tempfile.mkdtemp()
    shredded.write.mode("overwrite").parquet(d)
    stored = spark.read.parquet(d)
    out = variant_get_path(stored, "v", "$.a", "long", "out").select("out")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # and column pruning reaches the scan: only the shredded column read
    assert "v__a" in plan

    # property advertisement for readers
    assert shred_properties("v", {"$.a": "long"}) == {
        "variant.shred.v": "$.a:long"
    }

    # name collision is loud
    with pytest.raises(ValueError, match="collision"):
        shred_variant(shredded, "v", {"$.a": "long"})


def test_variant_column_through_upsert_lifecycle(spark, tmp_path):
    """A variant column rides the full DML lifecycle: catalog table
    with a declared ``variant`` field, UPSERT (equality-delete + data
    file commit), MOR read-back — payloads intact, updated row carries
    the new variant value."""
    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources import schema_evo as se
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "vt")
    os.makedirs(root)
    base = spark.createDataFrame(
        [(i, '{"v": %d}' % i) for i in range(6)], "id long, j string"
    )
    v = json_to_variant(base, "j", "payload").select("id", "payload")
    schema = se.arrow_schema_with_ids(
        pa.schema(
            [
                pa.field("id", pa.int64()),
                pa.field(
                    "payload",
                    pa.struct(
                        [
                            pa.field("metadata", pa.binary()),
                            pa.field("value", pa.binary()),
                        ]
                    ),
                ),
            ]
        ),
        {"id": 1, "payload": 2},
    )
    path = os.path.join(root, "a.parquet")
    pq.write_table(pa.Table.from_pandas(v.toPandas(), schema=schema), path)
    m = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=1,
        schema_fields=[
            {"id": 1, "name": "id", "type": "long", "required": True},
            {"id": 2, "name": "payload", "type": "variant",
             "required": False},
        ],
        data_files=[
            FileScanTask(
                data_file_path=path,
                length=os.path.getsize(path),
                file_size_in_bytes=os.path.getsize(path),
                record_count=6,
                sequence_number=1,
            )
        ],
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("vt", m)

    # upsert: replace id=3's variant, insert id=99
    delta_src = spark.createDataFrame(
        [(3, '{"v": 333, "tag": "new"}'), (99, '{"v": 99}')],
        "id long, j string",
    )
    delta = json_to_variant(delta_src, "j", "payload").select(
        "id", "payload"
    )
    upsert(spark, cat, "vt", delta, keys=["id"])

    out = read_table_mor(spark, cat.load_table("vt"))
    assert out.count() == 7
    got = {
        r["id"]: r["json"]
        for r in variant_to_json(out, "payload").select("id", "json")
        .collect()
    }
    assert got[3] == '{"tag":"new","v":333}'  # canonical key order
    assert got[99] == '{"v":99}'
    assert got[0] == '{"v":0}'


def test_variant_get_default_out_col_never_clobbers(spark):
    """ADVICE r13: the derived default output name must not silently
    replace an existing column (the old default 'value' collided with
    the events fixture's real column)."""
    import pytest as _pytest

    from iceberg_compaction_spark.operators.variant_ops import (
        json_to_variant,
        variant_get_path,
    )

    df = spark.createDataFrame(
        [(1, 10.0, '{"k": 7}')], "id long, value double, props string"
    )
    v = json_to_variant(df, "props", "pv")
    out = variant_get_path(v, "pv", "$.k", "long")
    assert "pv_k" in out.columns and "value" in out.columns
    [r] = out.collect()
    assert r["pv_k"] == 7 and r["value"] == 10.0  # untouched
    # a colliding derived name is loud, not silent
    v2 = v.withColumn("pv_k", F.lit(0))
    with _pytest.raises(ValueError, match="already exists"):
        variant_get_path(v2, "pv", "$.k", "long")


# ---------------------------------------------------------------------------
# round 14 (VERDICT r13 #4): spec-shape shredding — the typed_value
# group INSIDE the variant group, footer-visible to external readers
# ---------------------------------------------------------------------------


def _spec_shredded(spark):
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
    )

    df = spark.createDataFrame(
        [(i, JS[i % len(JS)]) for i in range(len(JS))], "id long, j string"
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    return shred_variant_spec(v, "v", {"$.a": "long", "$.f": "double"})


def test_spec_shred_group_shape_and_values(spark):
    """The shredded column carries the spec's nested group — metadata,
    residual value, typed_value.<field>.{value,typed_value} — with
    object rows shredded, non-object / non-fitting rows falling back
    to the whole-value residual (the spec's designated fallback)."""
    from iceberg_compaction_spark.operators.variant_ops import (
        variant_spec_shredded_fields,
    )

    s = _spec_shredded(spark)
    assert variant_spec_shredded_fields(s, "v") == {
        "a": "bigint",
        "f": "double",
    }
    rows = {r["id"]: r["v"] for r in s.collect()}
    # row 0: full object -> a=1 typed, f=2.5 typed, residual holds b/e
    assert rows[0]["typed_value"]["a"]["typed_value"] == 1
    assert rows[0]["typed_value"]["f"]["typed_value"] == 2.5
    assert rows[0]["value"] is not None  # residual: b, e
    # row 2: {"a": 0, "g": null} -> a typed, f missing (both null)
    assert rows[2]["typed_value"]["a"]["typed_value"] == 0
    assert rows[2]["typed_value"]["f"]["typed_value"] is None
    # rows 3-5: array / bare string / int -> unshredded fallback
    for i in (3, 4, 5):
        assert rows[i]["typed_value"] is None
        assert rows[i]["value"] is not None
    assert rows[6] is None or rows[6]["metadata"] is None  # null json


def test_spec_shred_footer_visible_and_zero_python_read(spark, tmp_path):
    """Write the spec-shredded frame to parquet: the FOOTER carries
    the typed_value group (an external v3 reader discovers the
    shredded fields with no table property), and a shredded-path read
    back through spark.read is a plain nested-column reference — no
    Python eval node in the plan."""
    import pyarrow.parquet as pq_

    d = str(tmp_path / "specshred")
    s = _spec_shredded(spark)
    s.write.mode("overwrite").parquet(d)

    # footer: variant group contains metadata/value/typed_value.a.typed_value
    import glob

    [f] = glob.glob(d + "/*.parquet")[:1]
    sch = pq_.read_schema(f)
    v_type = sch.field("v").type
    names = {v_type.field(i).name for i in range(v_type.num_fields)}
    assert names == {"metadata", "value", "typed_value"}
    tv = v_type.field("typed_value").type
    tv_names = {tv.field(i).name for i in range(tv.num_fields)}
    assert tv_names == {"a", "f"}
    a_grp = tv.field("a").type
    a_names = {a_grp.field(i).name for i in range(a_grp.num_fields)}
    assert a_names == {"value", "typed_value"}

    stored = spark.read.parquet(d)
    # writer-guaranteed contract: strictly zero-Python read plan
    got = variant_get_path(
        stored, "v", "$.a", "long", "out", assume_shredded=True
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    vals = {r["id"]: r["out"] for r in got.select("id", "out").collect()}
    assert vals[0] == 1 and vals[1] == -7 and vals[2] == 0
    # default (spec reader algorithm): typed reference + NULL-masked
    # residual fallback — same values here, one extra Arrow eval whose
    # input is null for every shredded row
    dflt = variant_get_path(stored, "v", "$.a", "long", "out")
    vals2 = {r["id"]: r["out"] for r in dflt.select("id", "out").collect()}
    assert vals2 == vals


def test_spec_shred_unshred_roundtrip(spark):
    """Reconstruction (residual + typed fields merged) round-trips the
    original JSON for shredded rows and passes unshredded rows
    through untouched."""
    import json as _json

    from iceberg_compaction_spark.operators.variant_ops import (
        unshred_variant_spec,
        variant_to_json,
    )

    s = _spec_shredded(spark)
    back = variant_to_json(unshred_variant_spec(s, "v"), "v", "js")
    got = {r["id"]: r["js"] for r in back.select("id", "js").collect()}
    for i, j in enumerate(JS):
        if j is None:
            assert got[i] is None
        else:
            assert _json.loads(got[i]) == _json.loads(j), i


def test_spec_shred_reads_through_datasource_zero_python(spark, tmp_path):
    """The full interchange story: a spec-shredded table read back
    through spark.read.format('iceberg-table') — the declared schema
    carries the typed_value group, the shredded-path extraction is a
    plain nested-column reference, and the plan has no Python EVAL
    node (the scan itself is the engine's Python DataSource; the point
    is that no per-row decode runs on top of it)."""
    import glob as _glob

    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.datasource import register
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "specds")
    s = _spec_shredded(spark)
    s.coalesce(1).write.mode("overwrite").parquet(root + "/stage")
    [part] = _glob.glob(root + "/stage/*.parquet")
    os.makedirs(root + "/tbl")
    dst = os.path.join(root, "tbl", "a.parquet")
    os.rename(part, dst)

    def grp(fid, name, typ):
        return {"id": fid, "name": name, "type": typ, "required": False}

    field_group = lambda base, t: {  # noqa: E731
        "type": "struct",
        "fields": [
            grp(base, "value", "binary"),
            grp(base + 1, "typed_value", t),
        ],
    }
    v_type = {
        "type": "struct",
        "fields": [
            grp(10, "metadata", "binary"),
            grp(11, "value", "binary"),
            grp(
                12,
                "typed_value",
                {
                    "type": "struct",
                    "fields": [
                        grp(13, "a", field_group(14, "long")),
                        grp(16, "f", field_group(17, "double")),
                    ],
                },
            ),
        ],
    }
    m = Manifest(
        table_root=root + "/tbl",
        snapshot_id=1,
        sequence_number=1,
        schema_fields=[
            {"id": 1, "name": "id", "type": "long", "required": True},
            {"id": 2, "name": "v", "type": v_type, "required": False},
        ],
        data_files=[
            FileScanTask(
                data_file_path=dst,
                length=os.path.getsize(dst),
                file_size_in_bytes=os.path.getsize(dst),
                record_count=7,
                sequence_number=1,
            )
        ],
    )
    cat = FileCatalog(warehouse=str(tmp_path / "whs"))
    cat.create_table("shredded", m)
    register(spark)
    out = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "shredded")
        .load()
    )
    from iceberg_compaction_spark.operators.variant_ops import (
        variant_spec_shredded_fields,
    )

    assert variant_spec_shredded_fields(out, "v") == {
        "a": "bigint",
        "f": "double",
    }
    got = variant_get_path(
        out, "v", "$.a", "long", "out", assume_shredded=True
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    vals = {r["id"]: r["out"] for r in got.select("id", "out").collect()}
    assert vals[0] == 1 and vals[1] == -7 and vals[2] == 0
    assert vals[3] is None and vals[4] is None  # unshredded fallback rows


def test_spec_shred_out_of_range_int_falls_back(spark):
    """Code-review r14: an integer too wide for the declared 'int'
    target must take the documented whole-row unshredded fallback —
    never crash the write on Arrow's int32 cast."""
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
        variant_get_path,
    )

    df = spark.createDataFrame(
        [(1, '{"a": 5}'), (2, '{"a": 4294967296}')], "id long, j string"
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    s = shred_variant_spec(v, "v", {"$.a": "int"})
    rows = {r["id"]: r["v"] for r in s.collect()}
    assert rows[1]["typed_value"]["a"]["typed_value"] == 5
    assert rows[2]["typed_value"] is None  # fallback, value intact
    # full fidelity still readable through the cold path
    a = variant_get_path(v, "v", "$.a", "long", "out")
    assert {r["id"]: r["out"] for r in a.collect()} == {
        1: 5, 2: 4294967296,
    }


def test_spec_shred_preserves_decimal_precision(spark):
    """Code-review r14: residual re-encoding must keep high-precision
    decimals digit-for-digit (no float round-trip on the write path)."""
    import json as _json

    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
        unshred_variant_spec,
        variant_to_json,
    )

    precise = "0.1234567890123456789012345"  # 25 digits: fits decimal128
    df = spark.createDataFrame(
        [(1, f'{{"a": 1, "p": {precise}}}')], "id long, j string"
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    s = shred_variant_spec(v, "v", {"$.a": "long"})
    back = variant_to_json(unshred_variant_spec(s, "v"), "v", "js")
    [r] = back.select("js").collect()
    from decimal import Decimal

    got = _json.loads(r["js"], parse_float=Decimal)
    assert got["p"] == Decimal(precise)


# ---------------------------------------------------------------------------
# round 15: the spec READER algorithm (residual fallback on shredded
# reads — ADVICE r14), nested-object and array-of-scalar spec shredding
# ---------------------------------------------------------------------------


def test_spec_shredded_read_falls_back_to_residual(spark):
    """ADVICE r14: rows the writer left unshredded (here: 'k' arrives
    as a STRING, failing the long target) must still read their true
    value through the residual — the spec reader's required fallback.
    assume_shredded=True is the strict zero-Python variant that
    documents away exactly these rows."""
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
        variant_get_path,
    )

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, '{"k": "7"}'), (3, '{"x": 1}')],
        "id long, j string",
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    s = shred_variant_spec(v, "v", {"$.k": "long"})
    rows = {r["id"]: r["v"] for r in s.collect()}
    assert rows[1]["typed_value"]["k"]["typed_value"] == 5
    assert rows[2]["typed_value"] is None  # writer fallback: "7" not long
    # default read = spec reader algorithm: typed OR residual decode
    got = variant_get_path(s, "v", "$.k", "long", "out")
    assert {r["id"]: r["out"] for r in got.collect()} == {
        1: 5,
        2: 7,  # cast("7" -> 7) through the residual, NOT silently null
        3: None,
    }
    # strict mode loses exactly the fallback row — by declared contract
    strict = variant_get_path(
        s, "v", "$.k", "long", "out", assume_shredded=True
    )
    assert {r["id"]: r["out"] for r in strict.collect()} == {
        1: 5,
        2: None,
        3: None,
    }


NESTED_JS = [
    '{"a": {"b": 10, "c": "x", "extra": true}, "top": 1}',
    '{"a": {"b": -3}, "xs": [1, 2, 3]}',
    '{"a": "not an object"}',
    '{"xs": [4, "five", 6]}',
    '{"xs": []}',
    "7",
    None,
]


def _nested_shredded(spark):
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
    )

    df = spark.createDataFrame(
        [(i, NESTED_JS[i]) for i in range(len(NESTED_JS))],
        "id long, j string",
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    return shred_variant_spec(
        v, "v", {"$.a.b": "long", "$.xs": "array<long>"}
    )


def test_spec_shred_nested_and_array_shapes(spark):
    """Nested object fields shred as recursive field groups; arrays of
    scalars as repeated (value, typed_value) element groups; rows not
    matching the shapes take the whole-row fallback."""
    from iceberg_compaction_spark.operators.variant_ops import (
        variant_spec_shredded_fields,
    )

    s = _nested_shredded(spark)
    assert variant_spec_shredded_fields(s, "v") == {
        "a.b": "bigint",
        "xs": "array<bigint>",
    }
    rows = {r["id"]: r["v"] for r in s.collect()}
    # row 0: a.b typed; a's leftover fields (c, extra) ride the
    # top-level residual under key "a"; xs absent
    assert rows[0]["typed_value"]["a"]["typed_value"]["b"]["typed_value"] == 10
    assert rows[0]["typed_value"]["xs"]["typed_value"] is None
    assert rows[0]["value"] is not None
    # row 1: both paths shred; residual empty
    assert rows[1]["typed_value"]["a"]["typed_value"]["b"]["typed_value"] == -3
    xs = rows[1]["typed_value"]["xs"]["typed_value"]
    assert [e["typed_value"] for e in xs] == [1, 2, 3]
    assert rows[1]["value"] is None
    # row 2: a not an object -> whole-row fallback
    assert rows[2]["typed_value"] is None and rows[2]["value"] is not None
    # row 3: "five" fails the long element target -> whole-row fallback
    assert rows[3]["typed_value"] is None
    # row 4: empty array still shreds (zero element groups)
    assert rows[4]["typed_value"]["xs"]["typed_value"] == []
    # row 5: non-object -> fallback; row 6: null json -> null cell
    assert rows[5]["typed_value"] is None


def test_spec_shred_nested_array_reads(spark):
    """Fast-path reads over the nested/array groups: $.a.b is a plain
    nested reference, $.xs[i] is try_element_at over the element
    groups (zero Python under assume_shredded), and the DEFAULT reads
    recover fallback rows through the residual."""
    from iceberg_compaction_spark.operators.variant_ops import (
        variant_get_path,
    )

    s = _nested_shredded(spark)
    ab = variant_get_path(
        s, "v", "$.a.b", "long", "ab", assume_shredded=True
    )
    plan = ab._jdf.queryExecution().executedPlan().toString()
    # encode+shred are upstream evals; the READ adds none on top
    assert plan.count("ArrowEvalPython") <= 2
    vals = {r["id"]: r["ab"] for r in ab.collect()}
    assert vals[0] == 10 and vals[1] == -3 and vals[2] is None
    # default read: row 2's a is a bare string -> $.a.b truly null;
    # row 3's fallback row has no a at all
    dflt = variant_get_path(s, "v", "$.a.b", "long", "ab")
    assert {r["id"]: r["ab"] for r in dflt.collect()} == {
        0: 10, 1: -3, 2: None, 3: None, 4: None, 5: None, 6: None,
    }
    # array element access: in-range, out-of-range, fallback row
    x1 = variant_get_path(s, "v", "$.xs[1]", "long", "x1")
    got = {r["id"]: r["x1"] for r in x1.collect()}
    assert got[1] == 2 and got[4] is None and got[0] is None
    # fallback row: $.xs[1] is the STRING "five" — a long read yields
    # NULL (try_variant_get contract), never an ANSI cast failure
    assert got[3] is None
    x0 = variant_get_path(s, "v", "$.xs[0]", "long", "x0")
    assert {r["id"]: r["x0"] for r in x0.collect()}[3] == 4
    x9 = variant_get_path(
        s, "v", "$.xs[9]", "long", "x9", assume_shredded=True
    )
    assert {r["id"]: r["x9"] for r in x9.collect()}[1] is None


def test_spec_shred_whole_subtree_reads_reconstruct(spark):
    """Reads of an intermediate node ($.a) or a whole array target
    ($.xs) cannot be served by the residual alone — they route through
    reconstruction and return the COMPLETE original value."""
    import json as _json

    from iceberg_compaction_spark.operators.variant_ops import (
        variant_get_path,
    )

    s = _nested_shredded(spark)
    a = variant_get_path(s, "v", "$.a", "string", "a_js")
    got = {r["id"]: r["a_js"] for r in a.collect()}
    assert _json.loads(got[0]) == {"b": 10, "c": "x", "extra": True}
    assert _json.loads(got[1]) == {"b": -3}
    assert got[2] == "not an object"
    xs = variant_get_path(s, "v", "$.xs", "string", "xs_js")
    gx = {r["id"]: r["xs_js"] for r in xs.collect()}
    assert _json.loads(gx[1]) == [1, 2, 3]
    assert _json.loads(gx[3]) == [4, "five", 6]
    assert _json.loads(gx[4]) == []


def test_spec_shred_nested_roundtrip_and_footer(spark, tmp_path):
    """Unshred reconstructs the original JSON across nested + array
    shapes, and the parquet footer carries the recursive group."""
    import glob
    import json as _json

    import pyarrow.parquet as pq_

    from iceberg_compaction_spark.operators.variant_ops import (
        unshred_variant_spec,
        variant_to_json,
    )

    s = _nested_shredded(spark)
    back = variant_to_json(unshred_variant_spec(s, "v"), "v", "js")
    got = {r["id"]: r["js"] for r in back.collect()}
    for i, j in enumerate(NESTED_JS):
        if j is None:
            assert got[i] is None
        else:
            assert _json.loads(got[i]) == _json.loads(j), i
    d = str(tmp_path / "nestedshred")
    s.write.mode("overwrite").parquet(d)
    [f] = glob.glob(d + "/*.parquet")[:1]
    sch = pq_.read_schema(f)
    v_type = sch.field("v").type
    tv = v_type.field(
        [v_type.field(i).name for i in range(v_type.num_fields)].index(
            "typed_value"
        )
    ).type
    names = {tv.field(i).name for i in range(tv.num_fields)}
    assert names == {"a", "xs"}
    a_grp = tv.field(0 if tv.field(0).name == "a" else 1).type
    a_tv = a_grp.field(
        [a_grp.field(i).name for i in range(a_grp.num_fields)].index(
            "typed_value"
        )
    ).type
    assert {a_tv.field(i).name for i in range(a_tv.num_fields)} == {"b"}


def test_spec_shred_double_digit_fidelity(spark):
    """ADVICE r14: Decimals whose float round-trip changes the stored
    digits (1.10) refuse the double target and take the whole-row
    fallback, so shred+unshred never alters digits; floats that
    round-trip exactly (1.5) shred normally.  Wide ints beyond the
    float mantissa refuse too."""
    import json as _json

    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
        unshred_variant_spec,
        variant_to_json,
    )

    df = spark.createDataFrame(
        [
            (1, '{"f": 1.5}'),
            (2, '{"f": 1.10}'),
            (3, '{"f": 9223372036854775807}'),
        ],
        "id long, j string",
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    s = shred_variant_spec(v, "v", {"$.f": "double"})
    rows = {r["id"]: r["v"] for r in s.collect()}
    assert rows[1]["typed_value"]["f"]["typed_value"] == 1.5
    assert rows[2]["typed_value"] is None  # 1.10 would reread as 1.1
    assert rows[3]["typed_value"] is None  # beyond float53
    back = variant_to_json(unshred_variant_spec(s, "v"), "v", "js")
    got = {r["id"]: r["js"] for r in back.collect()}
    assert _json.loads(got[2])["f"] != 1.2  # parse sanity
    assert '"f":1.10' in got[2].replace(" ", "")
    assert _json.loads(got[3])["f"] == 9223372036854775807


AOBJ_JS = [
    # 0: full conformance, one element with a leftover field
    '{"items": [{"a": 1, "b": "x"}, {"a": 2, "b": "y", "extra": true}],'
    ' "tag": "t0"}',
    # 1: element missing a shredded field (absent -> both slots null)
    '{"items": [{"b": "only-b"}], "tag": "t1"}',
    # 2: empty array still shreds
    '{"items": [], "tag": "t2"}',
    # 3: element not an object -> whole-row fallback
    '{"items": [{"a": 1}, 7], "tag": "t3"}',
    # 4: "a" fails the long target -> whole-row fallback
    '{"items": [{"a": "NaN"}], "tag": "t4"}',
    # 5: items absent entirely
    '{"tag": "t5"}',
]


def _aobj_shredded(spark):
    from iceberg_compaction_spark.operators.variant_ops import (
        shred_variant_spec,
    )

    df = spark.createDataFrame(
        [(i, AOBJ_JS[i]) for i in range(len(AOBJ_JS))],
        "id long, j string",
    )
    v = json_to_variant(df, "j", "v").select("id", "v")
    return shred_variant_spec(
        v, "v", {"$.items[].a": "long", "$.items[].b": "string"}
    )


def test_spec_shred_array_of_objects_shapes(spark):
    """Round 15: array-of-OBJECT targets ($.items[].a) shred as
    element groups whose typed_value is itself a field-group struct —
    the spec's full recursion; per-element leftovers ride the row
    residual as a positional list; non-conforming rows take the
    whole-row fallback."""
    from iceberg_compaction_spark.operators.variant_ops import (
        variant_spec_shredded_fields,
    )

    s = _aobj_shredded(spark)
    assert variant_spec_shredded_fields(s, "v") == {
        "items[].a": "bigint",
        "items[].b": "string",
    }
    rows = {r["id"]: r["v"] for r in s.collect()}
    elems = rows[0]["typed_value"]["items"]["typed_value"]
    assert [e["typed_value"]["a"]["typed_value"] for e in elems] == [1, 2]
    assert [e["typed_value"]["b"]["typed_value"] for e in elems] == ["x", "y"]
    assert rows[0]["value"] is not None  # tag + element-1 extra
    only_b = rows[1]["typed_value"]["items"]["typed_value"][0]["typed_value"]
    assert only_b["a"]["typed_value"] is None
    assert only_b["b"]["typed_value"] == "only-b"
    assert rows[2]["typed_value"]["items"]["typed_value"] == []
    assert rows[3]["typed_value"] is None and rows[3]["value"] is not None
    assert rows[4]["typed_value"] is None
    assert rows[5]["typed_value"]["items"]["typed_value"] is None


def test_spec_shred_array_of_objects_reads_and_roundtrip(spark):
    """$.items[i].a reads as try_element_at + plain nested references
    (zero Python on top under assume_shredded); default reads recover
    fallback rows; unshred reconstructs every original value
    digit-for-digit including per-element residual fields."""
    import json

    from iceberg_compaction_spark.operators.variant_ops import (
        unshred_variant_spec,
        variant_get_path,
        variant_to_json,
    )

    s = _aobj_shredded(spark)
    a0 = variant_get_path(
        s, "v", "$.items[0].a", "long", "a0", assume_shredded=True
    )
    plan = a0._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") <= 2  # encode+shred upstream only
    vals = {r["id"]: r["a0"] for r in a0.collect()}
    assert vals[0] == 1 and vals[1] is None and vals[2] is None
    b1 = variant_get_path(s, "v", "$.items[1].b", "string", "b1")
    got = {r["id"]: r["b1"] for r in b1.collect()}
    assert got[0] == "y" and got[1] is None
    # default read recovers the fallback rows through the residual
    a_fb = variant_get_path(s, "v", "$.items[0].a", "long", "af")
    fb = {r["id"]: r["af"] for r in a_fb.collect()}
    assert fb[3] == 1 and fb[4] is None and fb[0] == 1
    # whole-subtree read reconstructs (typed + positional residual)
    tag = variant_get_path(s, "v", "$.tag", "string", "tag")
    assert {r["id"]: r["tag"] for r in tag.collect()}[0] == "t0"
    u = unshred_variant_spec(s, "v", "u")
    js = variant_to_json(u, "u", "uj")
    back = {r["id"]: r["uj"] for r in js.collect()}
    for i, orig in enumerate(AOBJ_JS):
        assert json.loads(back[i]) == json.loads(orig), i
