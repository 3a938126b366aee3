"""Field-id schema evolution (sources/schema_evo.py): data files
written under OLDER schemas read correctly through the table's CURRENT
schema — rename resolves by id, added columns project NULL for old
files, int->long promotion widens — on BOTH read paths (the engine's
spark.read scan and the Python DataSource's executor-side pyarrow),
matching the reference's field-id schema threading
(core/src/executor/datafusion/datafusion_processor.rs:741-774)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    DeleteFile,
    FileScanTask,
)
from iceberg_compaction_spark.sources import schema_evo as se
from iceberg_compaction_spark.sources.ingest import read_table_mor
from iceberg_compaction_spark.sources.manifest import Manifest

# schema v1: id(1) long, old_name(2) string, small(4) int
V1 = [
    {"id": 1, "name": "id", "type": "long", "required": True},
    {"id": 2, "name": "old_name", "type": "string", "required": False},
    {"id": 4, "name": "small", "type": "int", "required": False},
]
# schema v2: old_name RENAMED to new_name, extra(3) double ADDED,
# small(4) PROMOTED int -> long
V2 = [
    {"id": 1, "name": "id", "type": "long", "required": True},
    {"id": 2, "name": "new_name", "type": "string", "required": False},
    {"id": 3, "name": "extra", "type": "double", "required": False},
    {"id": 4, "name": "small", "type": "long", "required": False},
]


def _write(path, names_types_ids, cols):
    schema = pa.schema([pa.field(n, t) for n, t, _ in names_types_ids])
    schema = se.arrow_schema_with_ids(
        schema, {n: i for n, _, i in names_types_ids}
    )
    pq.write_table(pa.table(cols, schema=schema), path)


@pytest.fixture()
def evolved(tmp_path):
    """Two data files: A written under V1, B under V2; table is at V2."""
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    a = os.path.join(root, "a-v1.parquet")
    b = os.path.join(root, "b-v2.parquet")
    _write(
        a,
        [("id", pa.int64(), 1), ("old_name", pa.string(), 2),
         ("small", pa.int32(), 4)],
        {"id": [1, 2, 3], "old_name": ["x1", "x2", "x3"],
         "small": [10, 20, 30]},
    )
    _write(
        b,
        [("id", pa.int64(), 1), ("new_name", pa.string(), 2),
         ("extra", pa.float64(), 3), ("small", pa.int64(), 4)],
        {"id": [4, 5], "new_name": ["y4", "y5"], "extra": [0.4, 0.5],
         "small": [40, 50]},
    )
    m = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=2,
        schema_fields=[dict(f) for f in V2],
        data_files=[
            FileScanTask(
                data_file_path=a, length=os.path.getsize(a),
                file_size_in_bytes=os.path.getsize(a), record_count=3,
                sequence_number=1,
            ),
            FileScanTask(
                data_file_path=b, length=os.path.getsize(b),
                file_size_in_bytes=os.path.getsize(b), record_count=2,
                sequence_number=2,
            ),
        ],
    )
    return m


EXPECT = {
    1: ("x1", None, 10),
    2: ("x2", None, 20),
    3: ("x3", None, 30),
    4: ("y4", 0.4, 40),
    5: ("y5", 0.5, 50),
}


def _check(rows):
    got = {r["id"]: (r["new_name"], r["extra"], r["small"]) for r in rows}
    assert got == EXPECT


def test_engine_scan_resolves_renamed_and_added_columns(spark, evolved):
    df = read_table_mor(spark, evolved)
    assert df.columns == ["id", "new_name", "extra", "small"]
    assert dict(df.dtypes)["small"] == "bigint"  # int -> long promotion
    _check(df.collect())


def test_equality_delete_on_renamed_column(spark, evolved, tmp_path):
    """Equality-delete keys speak CURRENT names; the delete must hit
    rows in the pre-rename file too (key column physically named
    old_name there)."""
    dpath = str(tmp_path / "eqdel.parquet")
    pq.write_table(pa.table({"new_name": ["x2", "y5"]}), dpath)
    d = DeleteFile(
        path=dpath, content=EQUALITY_DELETE, record_count=2,
        sequence_number=3, equality_ids=("new_name",),
        file_size_in_bytes=os.path.getsize(dpath),
    )
    for t in evolved.data_files:
        t.deletes.append(d)
    df = read_table_mor(spark, evolved)
    assert sorted(r["id"] for r in df.collect()) == [1, 3, 4]


def test_real_metadata_roundtrip_carries_schema_fields(spark, evolved, tmp_path):
    """export with prior_schemas -> load_iceberg_table resolves the
    CURRENT schema (v2) and the MOR read matches — the full
    rename-then-read lifecycle over real Iceberg metadata."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        export_iceberg_metadata,
        load_iceberg_table,
    )

    export_iceberg_metadata(
        evolved, evolved.table_root, V2, prior_schemas=[V1]
    )
    loaded = load_iceberg_table(evolved.table_root)
    assert [f["name"] for f in loaded.schema_fields] == [
        "id", "new_name", "extra", "small",
    ]
    _check(read_table_mor(spark, loaded).collect())


def test_datasource_reads_across_rename(spark, evolved, tmp_path):
    """The Python DataSource path: executor-side field-id remap gives
    the same projection, and a pushed filter on the RENAMED column
    still hits rows in the old file."""
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.datasource import register

    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("evo", evolved)
    register(spark)
    df = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "evo")
        .load()
    )
    assert df.columns == ["id", "new_name", "extra", "small"]
    _check(df.collect())
    hit = df.where(df.new_name == "x3").collect()
    assert [r["id"] for r in hit] == [3]
    # predicate on the ADDED column: old-file rows are NULL, never match
    assert sorted(
        r["id"] for r in df.where(df.extra > 0.45).collect()
    ) == [5]


def test_name_fallback_for_files_without_ids(spark, tmp_path):
    """A file with NO field ids (pre-Iceberg import) resolves by NAME —
    Iceberg's default name-mapping behavior."""
    root = str(tmp_path / "tbl2")
    os.makedirs(root)
    p = os.path.join(root, "noid.parquet")
    pq.write_table(
        pa.table({"id": pa.array([7], type=pa.int64()), "new_name": ["n7"]}),
        p,
    )
    m = Manifest(
        table_root=root, snapshot_id=1, sequence_number=1,
        schema_fields=[dict(f) for f in V2],
        data_files=[
            FileScanTask(
                data_file_path=p, length=os.path.getsize(p),
                file_size_in_bytes=os.path.getsize(p), record_count=1,
                sequence_number=1,
            )
        ],
    )
    rows = read_table_mor(spark, m).collect()
    assert [(r["id"], r["new_name"], r["extra"]) for r in rows] == [
        (7, "n7", None)
    ]


def test_manifest_schema_fields_roundtrip(evolved):
    again = Manifest.from_dict(evolved.to_dict())
    assert again.schema_fields == evolved.schema_fields


def test_struct_with_field_ids_nested_falls_back():
    nested = [{"id": 1, "name": "s", "type": {"type": "struct"}}]
    assert se.struct_with_field_ids(nested) is None
