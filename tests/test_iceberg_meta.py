"""Real Iceberg metadata interop: Avro OCF round-trips, metadata-layout
loading (the reference's get_all_files_from_snapshot walk,
core/src/compaction/mod.rs:734-761), and end-to-end compaction of a
table loaded purely from spec-format metadata files."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    DeleteFile,
    FileScanTask,
)
from iceberg_compaction_spark.sources.avro_io import (
    read_avro_file,
    write_avro_file,
)
from iceberg_compaction_spark.sources.iceberg_meta import (
    export_iceberg_metadata,
    load_iceberg_table,
)
from iceberg_compaction_spark.sources.manifest import Manifest

SF0001 = "/root/testdata/sf0.001"

SCHEMA_FIELDS = [
    {"id": 1, "name": "id", "type": "long", "required": True},
    {"id": 2, "name": "name", "type": "string", "required": False},
]


def test_avro_ocf_round_trip_all_types(tmp_path):
    """Generic datum coverage: primitives, unions, arrays, maps, nested
    records, named-type references, enum, fixed — byte round-trip under
    both codecs."""
    nested = {
        "type": "record",
        "name": "inner",
        "fields": [{"name": "x", "type": "long"}],
    }
    schema = {
        "type": "record",
        "name": "outer",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "u", "type": ["null", "string"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {"name": "rec", "type": nested},
            {"name": "rec2", "type": "inner"},  # named reference
            {
                "name": "e",
                "type": {
                    "type": "enum",
                    "name": "col",
                    "symbols": ["RED", "BLUE"],
                },
            },
            {
                "name": "fx",
                "type": {"type": "fixed", "name": "f8", "size": 8},
            },
        ],
    }
    rows = [
        {
            "b": True,
            "i": -7,
            "l": 2**40,
            "f": 0.5,
            "d": -1.25,
            "s": "héllo",
            "by": b"\x00\xff",
            "u": "set",
            "arr": [1, -2, 3],
            "m": {"k1": 10, "k2": -20},
            "rec": {"x": 5},
            "rec2": {"x": 9},
            "e": "BLUE",
            "fx": b"12345678",
        },
        {
            "b": False,
            "i": 0,
            "l": -(2**50),
            "f": 2.0,
            "d": 3.5,
            "s": "",
            "by": b"",
            "u": None,
            "arr": [],
            "m": {},
            "rec": {"x": -1},
            "rec2": {"x": 0},
            "e": "RED",
            "fx": b"abcdefgh",
        },
    ]
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"rt-{codec}.avro")
        write_avro_file(p, schema, rows, codec=codec)
        got_schema, got = read_avro_file(p)
        assert got == rows
        assert got_schema["name"] == "outer"


@pytest.fixture()
def iceberg_table(tmp_path):
    """A real-layout Iceberg v2 table: parquet data + delete files under
    data/, spec-format metadata (JSON + Avro manifests) under metadata/.
    Same row semantics as the test_mor fixture: pos deletes remove id 0
    and 15, eq deletes remove 5 and 7 (12's delete is too old)."""
    root = str(tmp_path / "tbl")
    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir)
    d1 = os.path.join(data_dir, "d1.parquet")
    d2 = os.path.join(data_dir, "d2.parquet")
    pq.write_table(
        pa.table(
            {"id": list(range(10)), "name": [f"n{i}" for i in range(10)]}
        ),
        d1,
    )
    pq.write_table(
        pa.table(
            {
                "id": list(range(10, 20)),
                "name": [f"n{i}" for i in range(10, 20)],
            }
        ),
        d2,
    )
    pos = os.path.join(data_dir, "pos-del.parquet")
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [d1, d2],
                "sys_hidden_pos": pa.array([0, 5], type=pa.int64()),
            }
        ),
        pos,
    )
    eqo = os.path.join(data_dir, "eq-old.parquet")  # seq 2: hits seq-1 file
    pq.write_table(
        pa.table(
            {
                "id": pa.array([5, 12], type=pa.int64()),
                "sys_hidden_seq_num": pa.array([2, 2], type=pa.int64()),
            }
        ),
        eqo,
    )
    eqn = os.path.join(data_dir, "eq-new.parquet")  # seq 9: hits both files
    pq.write_table(
        pa.table(
            {
                "id": pa.array([7], type=pa.int64()),
                "sys_hidden_seq_num": pa.array([9], type=pa.int64()),
            }
        ),
        eqn,
    )

    pos_f = DeleteFile(
        path=pos,
        content=POSITION_DELETE,
        file_size_in_bytes=os.path.getsize(pos),
        record_count=2,
        sequence_number=9,
    )
    eqo_f = DeleteFile(
        path=eqo,
        content=EQUALITY_DELETE,
        file_size_in_bytes=os.path.getsize(eqo),
        record_count=2,
        sequence_number=2,
        equality_ids=("id",),
    )
    eqn_f = DeleteFile(
        path=eqn,
        content=EQUALITY_DELETE,
        file_size_in_bytes=os.path.getsize(eqn),
        record_count=1,
        sequence_number=9,
        equality_ids=("id",),
    )
    t1 = FileScanTask(
        data_file_path=d1,
        length=os.path.getsize(d1),
        record_count=10,
        sequence_number=1,
        deletes=[pos_f, eqo_f, eqn_f],
    )
    t2 = FileScanTask(
        data_file_path=d2,
        length=os.path.getsize(d2),
        record_count=10,
        sequence_number=3,
        deletes=[pos_f, eqn_f],  # eq-old (seq 2) does NOT apply to seq 3
    )
    ours = Manifest(
        table_root=root,
        snapshot_id=1,
        sequence_number=9,
        data_files=[t1, t2],
    )
    export_iceberg_metadata(ours, root, SCHEMA_FIELDS)
    return root, ours


EXPECTED_IDS = sorted(set(range(20)) - {0, 15, 5, 7})


def test_load_iceberg_table_round_trip(iceberg_table):
    """export -> load reproduces file paths, sequence numbers, equality
    ids (field ids translated back to column names), and the per-file
    delete attachments implied by the sequence predicates."""
    root, ours = iceberg_table
    loaded = load_iceberg_table(root)
    assert loaded.format_version == 2
    assert loaded.sequence_number == 9
    assert sorted(t.data_file_path for t in loaded.data_files) == sorted(
        t.data_file_path for t in ours.data_files
    )
    by_path = {t.data_file_path: t for t in loaded.data_files}
    for want in ours.data_files:
        got = by_path[want.data_file_path]
        assert got.sequence_number == want.sequence_number
        assert got.record_count == want.record_count
        assert sorted(d.path for d in got.deletes) == sorted(
            d.path for d in want.deletes
        )
        for d in got.deletes:
            if d.content == EQUALITY_DELETE:
                assert d.equality_ids == ("id",)


def test_loaded_table_mor_read_and_compaction(spark, iceberg_table):
    """End-to-end on metadata alone: MOR-read the loaded table, then
    compact it — survivors match the expected delete application."""
    from iceberg_compaction_spark.compaction import Compaction
    from iceberg_compaction_spark.config import CompactionConfig
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    root, _ours = iceberg_table
    loaded = load_iceberg_table(root)

    ids = sorted(
        r["id"] for r in read_table_mor(spark, loaded).collect()
    )
    assert ids == EXPECTED_IDS

    c = Compaction(spark=spark, config=CompactionConfig.full())
    compacted, stats = c.compact(loaded, out_root=root)
    assert stats.input_files_count == 5  # 2 data + 1 pos + 2 eq deletes
    rows = spark.read.parquet(*compacted.paths())
    assert sorted(r["id"] for r in rows.collect()) == EXPECTED_IDS
    # compaction materialized the deletes away
    assert all(not t.deletes for t in compacted.data_files)


def test_load_object_store_layout_without_hint(iceberg_table):
    """Spark/Trino object-store convention: no version-hint.text, files
    named <5-digit>-<uuid>.metadata.json — the newest one wins."""
    root, _ours = iceberg_table
    mdir = os.path.join(root, "metadata")
    os.unlink(os.path.join(mdir, "version-hint.text"))
    src = os.path.join(mdir, "v1.metadata.json")
    with open(src) as f:
        md = json.load(f)
    os.unlink(src)
    # an OLDER metadata version with no snapshots, then the real one
    stale = dict(md, **{"current-snapshot-id": -1, "snapshots": []})
    with open(
        os.path.join(mdir, "00000-aaaaaaaa.metadata.json"), "w"
    ) as f:
        json.dump(stale, f)
    with open(
        os.path.join(mdir, "00001-bbbbbbbb.metadata.json"), "w"
    ) as f:
        json.dump(md, f)
    loaded = load_iceberg_table(root)
    assert len(loaded.data_files) == 2
    assert loaded.sequence_number == 9


def test_manifest_entry_sequence_inheritance(iceberg_table):
    """v2 inheritance: a null sequence_number on an ADDED entry takes
    the manifest-list entry's sequence number."""
    root, _ours = iceberg_table
    mdir = os.path.join(root, "metadata")
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        md = json.load(f)
    list_path = md["snapshots"][0]["manifest-list"].replace("file://", "")
    _s, mf_entries = read_avro_file(list_path)
    data_mf = next(
        m for m in mf_entries if m["content"] == 0
    )["manifest_path"].replace("file://", "")
    schema, entries = read_avro_file(data_mf)
    for e in entries:
        e["sequence_number"] = None  # force inheritance
        e["file_sequence_number"] = None
    write_avro_file(data_mf, schema, entries)

    loaded = load_iceberg_table(root)
    # both data files now inherit the manifest's sequence number
    mf_seq = next(m for m in mf_entries if m["content"] == 0)[
        "sequence_number"
    ]
    assert {t.sequence_number for t in loaded.data_files} == {mf_seq}


# ---------------------------------------------------------------------------
# Hadoop-layout catalog: full lifecycles over REAL metadata files
# ---------------------------------------------------------------------------


@pytest.fixture()
def hadoop_cat(tmp_path):
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    wh = str(tmp_path / "wh")
    root = str(tmp_path / "wh" / "t")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=wh)
    cat.create_table(
        "t", Manifest.from_parquet_dir(root, sequence_number=1)
    )
    return cat


def test_hadoop_catalog_create_infers_schema_and_loads(hadoop_cat):
    m = hadoop_cat.load_table("t")
    assert m.snapshot_id == 1
    assert len(m.data_files) == 1
    # the metadata on disk is the real layout: JSON + avro manifest list
    mdir = hadoop_cat._mdir("t")
    assert os.path.exists(os.path.join(mdir, "v1.metadata.json"))
    with open(os.path.join(mdir, "v1.metadata.json")) as f:
        md = json.load(f)
    fields = md["schemas"][0]["fields"]
    assert [(f["name"], f["type"]) for f in fields] == [
        ("id", "long"),
        ("val", "string"),
    ]
    snaps = md["snapshots"]
    assert snaps[0]["manifest-list"].startswith("file://")
    # manifest list is valid avro
    _s, entries = read_avro_file(
        snaps[0]["manifest-list"].replace("file://", "")
    )
    assert entries[0]["added_files_count"] == 1


def test_hadoop_catalog_upsert_compact_lifecycle(spark, hadoop_cat):
    """The full produce -> read -> compact loop where EVERY commit is a
    genuine Iceberg metadata version (JSON + Avro), re-read through the
    spec-driven loader on each step."""
    from iceberg_compaction_spark.compaction import Compaction
    from iceberg_compaction_spark.config import CompactionConfig
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    changes = spark.createDataFrame(
        [(3, "v3-new", "U"), (0, "x", "D"), (42, "v42", "U")],
        ["id", "val", "op"],
    )
    m2 = upsert(spark, hadoop_cat, "t", changes, keys=["id"], op_col="op")
    assert m2.snapshot_id == 2

    got = {
        r["id"]: r["val"]
        for r in read_table_mor(
            spark, hadoop_cat.load_table("t")
        ).collect()
    }
    assert got[3] == "v3-new" and got[42] == "v42" and 0 not in got
    assert len(got) == 10

    # compact through the catalog CAS; deletes materialize away
    c = Compaction(spark=spark, config=CompactionConfig.full())
    cur = hadoop_cat.load_table("t")
    plans = c.plan(cur)
    results, _ = c.execute_plans(cur, plans)

    def attempt():
        live = hadoop_cat.load_table("t")
        new = c.commit_manager.rewrite_files(live, results)
        return hadoop_cat.commit_table("t", live.snapshot_id, new)

    final = c.commit_manager.commit_with_retry(attempt)
    assert final.snapshot_id == 3
    live = hadoop_cat.load_table("t")
    assert all(not t.deletes for t in live.data_files)
    got2 = {
        r["id"]: r["val"]
        for r in read_table_mor(spark, live).collect()
    }
    assert got2 == got
    assert hadoop_cat.table_history("t") == [1, 2, 3]


def test_hadoop_catalog_cas_conflict_and_expire(hadoop_cat):
    from iceberg_compaction_spark.commit import CommitConflict

    cur = hadoop_cat.load_table("t")
    nxt = Manifest.from_dict(cur.to_dict())
    nxt.snapshot_id = cur.snapshot_id + 1
    hadoop_cat.commit_table("t", cur.snapshot_id, nxt)

    # stale expected head -> retryable conflict, nothing written
    again = Manifest.from_dict(cur.to_dict())
    again.snapshot_id = cur.snapshot_id + 1
    with pytest.raises(CommitConflict):
        hadoop_cat.commit_table("t", cur.snapshot_id, again)

    assert hadoop_cat.table_history("t") == [1, 2]
    assert hadoop_cat.expire_snapshots("t", keep_last=1) == [1]
    assert hadoop_cat.table_history("t") == [2]
    # time travel to the expired version now fails
    from iceberg_compaction_spark.sources.catalog import TableNotFound

    with pytest.raises(TableNotFound):
        hadoop_cat.load_table_at("t", 1)


def test_sv_serde_roundtrip_all_types():
    import datetime as dt

    from iceberg_compaction_spark.sources.iceberg_meta import (
        sv_decode,
        sv_encode,
    )

    cases = [
        (True, "boolean"), (False, "boolean"),
        (-2147483648, "int"), (42, "int"),
        (-(2**62), "long"), (2**62, "long"),
        (1.5, "float"), (-3.140625, "float"),  # f32-exact values
        (2.718281828459045, "double"),
        (dt.date(1992, 1, 2), "date"), (dt.date(1969, 12, 31), "date"),
        (dt.datetime(2020, 5, 17, 12, 34, 56, 789012), "timestamp"),
        ("", "string"), ("héllo wörld", "string"),
    ]
    for v, t in cases:
        assert sv_decode(sv_encode(v, t), t) == v, (v, t)
    # spec widths
    assert len(sv_encode(1, "int")) == 4
    assert len(sv_encode(1, "long")) == 8
    assert len(sv_encode(dt.date(2020, 1, 1), "date")) == 4
    # unsupported types refuse politely
    assert sv_encode("x", "decimal(10,2)") is None


def test_hadoop_catalog_bounds_roundtrip_and_prune(tmp_path):
    """Bounds written into REAL Avro manifests come back typed through
    load_iceberg_table, and the pruning evaluator consumes them."""
    import duckdb

    from iceberg_compaction_spark.plans import pruning as pr
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )

    wh = str(tmp_path / "wh")
    d = str(tmp_path / "stage")
    os.makedirs(d)
    con = duckdb.connect()
    for i in range(4):
        con.execute(
            f"""COPY (SELECT * FROM '{SF0001}/lineitem.parquet'
                 ORDER BY l_orderkey LIMIT 1500 OFFSET {i * 1500})
                TO '{d}/p{i}.parquet' (FORMAT PARQUET)"""
        )
    cat = IcebergHadoopCatalog(wh)
    m0 = Manifest.from_parquet_dir(d)
    cat.create_table("t", m0)
    loaded = load_iceberg_table(cat._table_dir("t"))
    assert len(loaded.data_files) == 4
    by_src = {t.data_file_path: t for t in m0.data_files}
    for t in loaded.data_files:
        src = by_src[t.data_file_path]
        assert t.column_bounds["l_orderkey"] == src.column_bounds["l_orderkey"]
        # date bounds survive Appendix-D binary round-trip typed
        assert t.column_bounds["l_shipdate"] == src.column_bounds["l_shipdate"]
        assert t.null_counts["l_orderkey"] == 0
    keys = sorted(
        t.column_bounds["l_orderkey"][0] for t in loaded.data_files
    )
    preds = [pr.ColumnPredicate("l_orderkey", "lt", keys[1])]
    alive = pr.prune_tasks(loaded.data_files, preds)
    assert 1 <= len(alive) < 4


# --- round 6: real-metadata catalog over a non-POSIX FileIO backend ----------


def test_hadoop_catalog_over_memory_backend(tmp_path):
    """The real-metadata catalog (JSON + Avro wire format) must run over
    the object-store FileIO: create -> commit -> load -> expire with a
    mem:// warehouse, data files staying local parquet (the mixed
    layout of a metadata-on-object-store deployment)."""
    from iceberg_compaction_spark.commit import CommitConflict
    from iceberg_compaction_spark.plans.datamodel import FileScanTask
    from iceberg_compaction_spark.sources.fileio import MemoryFileIO
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    MemoryFileIO.clear()
    data = str(tmp_path / "base.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(10), type=pa.int64()),
                "val": [f"v{i}" for i in range(10)],
            }
        ),
        data,
    )
    cat = IcebergHadoopCatalog(warehouse="mem://realwh")
    m0 = Manifest(
        table_root="mem://realwh/t",
        sequence_number=1,
        data_files=[
            FileScanTask(
                data_file_path=data,
                length=os.path.getsize(data),
                record_count=10,
                sequence_number=1,
            )
        ],
    )
    cat.create_table("t", m0)
    m = cat.load_table("t")
    assert m.snapshot_id == 1
    assert [t.data_file_path for t in m.data_files] == [data]
    assert m.data_files[0].record_count == 10

    # commit a new snapshot through the CAS, with the operation marker
    # round-tripping through the REAL snapshot summary field
    new = Manifest.from_dict(m.to_dict())
    new.snapshot_id = 2
    new.operation = "replace"
    cat.commit_table("t", 1, new)
    got = cat.load_table("t")
    assert got.snapshot_id == 2
    assert got.operation == "replace"

    # stale CAS loses
    stale = Manifest.from_dict(m.to_dict())
    stale.snapshot_id = 2
    try:
        cat.commit_table("t", 1, stale)
        raise AssertionError("expected CommitConflict")
    except CommitConflict:
        pass

    assert cat.table_history("t") == [1, 2]
    assert cat.expire_snapshots("t", keep_last=1) == [1]
    assert cat.table_history("t") == [2]
    MemoryFileIO.clear()


def test_v3_dv_roundtrip_through_real_metadata(spark, tmp_path):
    """Round 8 (VERDICT r7 #6): a v3 table whose MAINTENANCE consolidated
    parquet position deletes into a puffin deletion vector exports to
    real Iceberg metadata and reloads with identical MOR semantics —
    one DV blob per data file in one puffin file, the delete manifest
    entry stamped file_format=PUFFIN (reference reader contract:
    datafusion_processor.rs:632-653)."""
    from iceberg_compaction_spark.compaction import rewrite_position_deletes
    from iceberg_compaction_spark.operators.mor import rewrite_file_group
    from iceberg_compaction_spark.plans.datamodel import (
        POSITION_DELETE as _POS,
    )
    from iceberg_compaction_spark.plans.datamodel import FileGroup
    from iceberg_compaction_spark.sources.puffin import (
        is_puffin_file,
        read_puffin_dvs,
    )

    root = str(tmp_path / "tbl")
    os.makedirs(root + "/deletes")
    for f in range(2):
        ids = list(range(f * 100, (f + 1) * 100))
        pq.write_table(
            pa.table({
                "id": pa.array(ids, type=pa.int64()),
                "val": [f"v{i}" for i in ids],
            }),
            f"{root}/data{f}.parquet",
        )
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    m.format_version = 3
    d0 = m.data_files[0].data_file_path
    d1 = m.data_files[1].data_file_path
    dpath = f"{root}/deletes/pd.parquet"
    pq.write_table(
        pa.table({
            "sys_hidden_file_path": [d0, d0, d1],
            "sys_hidden_pos": pa.array([0, 7, 99], type=pa.int64()),
        }),
        dpath,
    )
    dfile = DeleteFile(
        path=dpath, content=_POS, file_size_in_bytes=os.path.getsize(dpath),
        record_count=3, sequence_number=2,
    )
    for t in m.data_files:
        t.deletes = [dfile]

    new, stats = rewrite_position_deletes(spark, m)
    assert stats.output_delete_files == 1
    dv_path = [
        d for t in new.data_files for d in t.deletes if d.content == _POS
    ][0].path
    assert is_puffin_file(dv_path)

    fields = [
        {"id": 1, "name": "id", "type": "long", "required": True},
        {"id": 2, "name": "val", "type": "string"},
    ]
    export_iceberg_metadata(new, root, fields)
    loaded = load_iceberg_table(root)
    assert loaded.format_version == 3

    # spec shape: the delete manifest entry carries PUFFIN
    md = json.load(open(os.path.join(root, "metadata", "v1.metadata.json")))
    _s, mf_entries = read_avro_file(
        md["snapshots"][0]["manifest-list"].replace("file://", "")
    )
    del_mf = [e for e in mf_entries if e["content"] == 1]
    assert len(del_mf) == 1
    _s, del_entries = read_avro_file(
        del_mf[0]["manifest_path"].replace("file://", "")
    )
    assert [e["data_file"]["file_format"] for e in del_entries] == ["PUFFIN"]

    # one Roaring blob per data file, byte-identical positions
    blobs = read_puffin_dvs(dv_path)
    assert sorted(blobs[d0]) == [0, 7] and sorted(blobs[d1]) == [99]

    # reload reproduces the maintenance table's MOR rows exactly, on
    # BOTH read paths (engine scan and the Python DataSource)
    def _surv(man):
        g = FileGroup.from_tasks(man.data_files)
        g.format_version = man.format_version
        return sorted(r["id"] for r in rewrite_file_group(spark, g).collect())

    expect = sorted(set(range(200)) - {0, 7, 199})
    assert _surv(new) == expect
    assert _surv(loaded) == expect

    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.datasource import register

    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("dvt", loaded)
    register(spark)
    ds = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "dvt")
        .load()
    )
    assert sorted(r["id"] for r in ds.collect()) == expect


def test_hadoop_catalog_remove_orphan_files(spark, hadoop_cat, tmp_path):
    """Round 9: remove-orphan-files over the real-metadata layout —
    unreferenced parquet under the table root goes, referenced data and
    the metadata/ tree (Avro manifests, v<N>.metadata.json) stay."""
    m = hadoop_cat.load_table("t")
    root = m.table_root
    orphan = os.path.join(root.replace("file://", ""), "orphan.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1], type=pa.int64())}), orphan
    )
    removed = hadoop_cat.remove_orphan_files("t", older_than_s=0)
    assert [os.path.basename(p) for p in removed] == ["orphan.parquet"]
    # live data intact, metadata tree untouched, table still loads
    after = hadoop_cat.load_table("t")
    assert {t.data_file_path for t in after.data_files} == {
        t.data_file_path for t in m.data_files
    }
    assert hadoop_cat.table_history("t") == [1]


def test_hadoop_catalog_full_maintenance_service(spark, hadoop_cat):
    """maintain() (the cron-able table service) runs end-to-end over the
    real-metadata catalog: DML -> compaction -> expire -> orphan sweep,
    with the final state reloading via the spec wire format."""
    from iceberg_compaction_spark.service import MaintenancePolicy, maintain
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    upsert(
        spark, hadoop_cat, "t",
        spark.createDataFrame([(3, "new3"), (42, "v42")], ["id", "val"]),
        keys=["id"],
    )
    report = maintain(
        spark,
        hadoop_cat,
        "t",
        MaintenancePolicy(keep_snapshots=1, orphan_older_than_s=0),
    )
    assert report.expired_snapshots
    final = hadoop_cat.load_table("t")
    got = {
        r["id"]: r["val"] for r in read_table_mor(spark, final).collect()
    }
    assert got[3] == "new3" and got[42] == "v42" and len(got) == 11


def test_expire_snapshots_cleans_orphaned_avro(spark, tmp_path):
    """Round 11: expiring a version on the hadoop layout also removes
    its manifest list + manifest Avro files when no retained version
    references them — metadata/ would otherwise grow forever under
    routine expiration (remove_orphan_files only walks data parquet).
    Retained versions' Avro stays and the table still reads."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(6), type=pa.int64()),
                "val": [f"v{i}" for i in range(6)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    for i in range(2):
        upsert(
            spark,
            cat,
            "h",
            spark.createDataFrame([(i, f"u{i}")], ["id", "val"]),
            keys=["id"],
        )
    mdir = os.path.join(str(tmp_path / "wh"), "h", "metadata")
    before = set(glob.glob(os.path.join(mdir, "*.avro")))
    assert len(before) >= 3  # one list + manifests per version
    expired = cat.expire_snapshots("h", keep_last=1)
    assert expired == [1, 2]
    after = set(glob.glob(os.path.join(mdir, "*.avro")))
    assert after < before  # expired versions' Avro went away
    # the retained head still resolves through its manifest list
    got = {
        r["id"]: r["val"]
        for r in read_table_mor(spark, cat.load_table("h")).collect()
    }
    assert got[0] == "u0" and got[1] == "u1" and len(got) == 6
    head_refs = cat._avro_refs("h", 3)[0]
    assert head_refs and all(os.path.exists(p) for p in head_refs)
    assert after == {os.path.abspath(p) for p in head_refs} or after == head_refs


def test_branch_commit_hint_points_external_readers_at_main(spark, tmp_path):
    """Round-11 review: a branch commit must leave version-hint.text on
    the PUBLISHED main — a conforming external reader resolving the
    Hadoop layout's hint must never land on the unpublished audit
    snapshot; and the branch version's embedded refs map carries EVERY
    ref (tags included), not just {main, target}."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
        load_iceberg_table,
    )
    from iceberg_compaction_spark.sources.ingest import (
        read_table_mor,
        upsert,
    )

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(5), type=pa.int64()),
                "val": [f"v{i}" for i in range(5)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    cat.create_tag("h", "rel-1")
    cat.create_branch("h", "audit")
    upsert(
        spark,
        cat,
        "h",
        spark.createDataFrame([(70, "staged")], ["id", "val"]),
        keys=["id"],
        to_branch="audit",
    )
    tdir = str(tmp_path / "wh" / "h")
    hint = open(os.path.join(tdir, "metadata", "version-hint.text")).read()
    assert hint.strip() == "1"  # published main, not the v2 allocation
    # the external hint-following read resolves MAIN's state
    ext = load_iceberg_table(tdir)
    got = {r["id"] for r in read_table_mor(spark, ext).collect()}
    assert 70 not in got and len(got) == 5
    # branch version file: every ref present in the embedded map
    md = _json.loads(
        open(os.path.join(tdir, "metadata", "v2.metadata.json")).read()
    )
    assert set(md["refs"]) == {"main", "audit", "rel-1"}
    assert md["refs"]["rel-1"]["type"] == "tag"
    assert md["refs"]["main"]["snapshot-id"] == 1
    assert md["refs"]["audit"]["snapshot-id"] == 2

    # pinned-main commit moves the hint to the new main
    upsert(
        spark,
        cat,
        "h",
        spark.createDataFrame([(80, "pub")], ["id", "val"]),
        keys=["id"],
    )
    hint2 = open(
        os.path.join(tdir, "metadata", "version-hint.text")
    ).read()
    assert hint2.strip() == "3"


def test_avro_cleanup_fails_closed_on_unreadable_retained_refs(
    spark, tmp_path
):
    """Round-11 review: if a RETAINED version's manifest list cannot be
    enumerated, expiration must remove NO Avro that pass — a partial
    reference set must never drive deletion."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )
    from iceberg_compaction_spark.sources.ingest import upsert

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(4), type=pa.int64()),
                "val": [f"v{i}" for i in range(4)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    for i in range(2):
        upsert(
            spark,
            cat,
            "h",
            spark.createDataFrame([(i, f"u{i}")], ["id", "val"]),
            keys=["id"],
        )
    mdir = os.path.join(str(tmp_path / "wh"), "h", "metadata")
    # corrupt the HEAD (retained) version's manifest list
    head_ml = [
        p for p in glob.glob(os.path.join(mdir, "snap-3-*.avro"))
    ]
    assert head_ml
    with open(head_ml[0], "wb") as f:
        f.write(b"not avro")
    before = set(glob.glob(os.path.join(mdir, "*.avro")))
    expired = cat.expire_snapshots("h", keep_last=1)
    # fail CLOSED entirely: removing the version files anyway would
    # destroy the only reference map for their Avro (permanent orphan)
    assert expired == []
    assert cat.table_history("h") == [1, 2, 3]
    after = set(glob.glob(os.path.join(mdir, "*.avro")))
    assert after == before  # NO Avro removed either


def test_avro_cleanup_fails_closed_on_unreadable_expired_refs(
    spark, tmp_path
):
    """ADVICE r11: an EXPIRED version with an unreadable manifest list
    also fails closed — pre-fix its version file + manifest list were
    removed while its unenumerable child manifests leaked permanently
    (and, since manifests can be shared, other versions' Avro deletion
    could have unlinked files it still referenced)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )
    from iceberg_compaction_spark.sources.ingest import upsert

    root = str(tmp_path / "base")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(4), type=pa.int64()),
                "val": [f"v{i}" for i in range(4)],
            }
        ),
        os.path.join(root, "b.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("h", Manifest.from_parquet_dir(root, sequence_number=1))
    for i in range(2):
        upsert(
            spark,
            cat,
            "h",
            spark.createDataFrame([(i, f"u{i}")], ["id", "val"]),
            keys=["id"],
        )
    mdir = os.path.join(str(tmp_path / "wh"), "h", "metadata")
    # corrupt an EXPIRED-to-be version's manifest list (v1, with
    # keep_last=1 both v1 and v2 are eligible)
    v1_ml = glob.glob(os.path.join(mdir, "snap-1-*.avro"))
    assert v1_ml
    with open(v1_ml[0], "wb") as f:
        f.write(b"not avro")
    before = set(glob.glob(os.path.join(mdir, "*.avro")))
    expired = cat.expire_snapshots("h", keep_last=1)
    assert expired == []
    assert cat.table_history("h") == [1, 2, 3]
    after = set(glob.glob(os.path.join(mdir, "*.avro")))
    assert after == before  # nothing removed, nothing leaked
