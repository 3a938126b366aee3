"""Metadata tables (sources/metadata_tables.py): files / delete_files /
partitions / snapshots / history / refs, plus the DataSource's
``option("metadata", ...)`` read path.  The oracle gate covers the
values (meta_files / meta_partitions / meta_snapshots); these tests pin
the surfaces the oracles can't see: delete-file rows, spec-evolution
partition naming, refs, and the read-only guards."""

import os

import pytest

from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    DeleteFile,
    FileScanTask,
)
from iceberg_compaction_spark.sources import metadata_tables as mt
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.manifest import Manifest

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _manifest_with_deletes(tmp_path):
    dv = DeleteFile(
        path=str(tmp_path / "dv.puffin"),
        content=POSITION_DELETE,
        file_size_in_bytes=64,
        record_count=3,
        sequence_number=4,
    )
    eq = DeleteFile(
        path=str(tmp_path / "eq.parquet"),
        content=EQUALITY_DELETE,
        file_size_in_bytes=128,
        record_count=2,
        sequence_number=5,
    )
    tasks = [
        FileScanTask(
            data_file_path=str(tmp_path / "a.parquet"),
            length=1000,
            record_count=10,
            sequence_number=1,
            partition=("en",),
            deletes=[dv, eq],
        ),
        FileScanTask(
            data_file_path=str(tmp_path / "b.parquet"),
            length=2000,
            record_count=20,
            sequence_number=2,
            partition=("en",),
            deletes=[eq],  # shared delete file: must dedup by path
        ),
        FileScanTask(
            data_file_path=str(tmp_path / "c.parquet"),
            length=3000,
            record_count=30,
            sequence_number=2,
            partition=("fr",),
        ),
    ]
    return Manifest(
        table_root=str(tmp_path),
        snapshot_id=1,
        sequence_number=2,
        operation="append",
        partition_spec=[
            {"source": "lang", "transform": "identity", "name": "lang"}
        ],
        data_files=tasks,
    )


def test_files_rows_data_and_deduped_deletes(tmp_path):
    rows = mt.files_rows(_manifest_with_deletes(tmp_path))
    data = [r for r in rows if r[0] == mt.CONTENT_DATA]
    dels = [r for r in rows if r[0] != mt.CONTENT_DATA]
    assert len(data) == 3 and len(dels) == 2  # eq shared -> one row
    by_path = {r[1]: r for r in rows}
    dv = by_path[str(tmp_path / "dv.puffin")]
    assert dv[0] == mt.CONTENT_POSITION_DELETES and dv[2] == "PUFFIN"
    eq = by_path[str(tmp_path / "eq.parquet")]
    assert eq[0] == mt.CONTENT_EQUALITY_DELETES and eq[5] == 2
    a = by_path[str(tmp_path / "a.parquet")]
    assert a[4] == {"lang": "en"} and a[8] == 2  # delete_file_count
    c = by_path[str(tmp_path / "c.parquet")]
    assert c[8] == 0 and c[4] == {"lang": "fr"}


def test_partitions_rows_aggregate(tmp_path):
    rows = {tuple(sorted((r[0] or {}).items())): r
            for r in mt.partitions_rows(_manifest_with_deletes(tmp_path))}
    en = rows[(("lang", "en"),)]
    # 2 files, 30 records, 3000 bytes, 2 DISTINCT delete files
    assert en[2:] == (2, 30, 3000, 2)
    fr = rows[(("lang", "fr"),)]
    assert fr[2:] == (1, 30, 3000, 0)


def test_old_spec_file_gets_positional_names(tmp_path):
    m = _manifest_with_deletes(tmp_path)
    # a file written under an older, two-field spec: arity mismatch
    m.data_files.append(
        FileScanTask(
            data_file_path=str(tmp_path / "old.parquet"),
            length=10,
            record_count=1,
            partition=("en", "2024"),
            spec_id=0,
        )
    )
    rows = {r[1]: r for r in mt.files_rows(m)}
    assert rows[str(tmp_path / "old.parquet")][4] == {"p0": "en", "p1": "2024"}


def _two_snapshot_catalog(tmp_path):
    m = _manifest_with_deletes(tmp_path)
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", m)
    m2 = Manifest.from_dict(cat.load_table("t").to_dict())
    m2.snapshot_id = 2
    m2.sequence_number = 3
    m2.operation = "replace"
    m2.data_files = m2.data_files[:1]
    cat.commit_table("t", 1, m2)
    return cat


def test_snapshots_history_refs_rows(tmp_path):
    cat = _two_snapshot_catalog(tmp_path)
    snaps = {r[0]: r for r in mt.snapshots_rows(cat, "t")}
    assert snaps[1][2] == "append" and snaps[1][4] == 3
    assert snaps[1][5] == 2  # distinct delete files
    assert snaps[2][2] == "replace" and snaps[2][4] == 1
    assert snaps[1][6] == 60 and snaps[2][6] == 10  # total_records
    hist = mt.history_rows(cat, "t")
    assert hist == [(1, None, True, False), (2, 1, True, True)]
    cat.create_tag("t", "audited", 1)
    cat.create_branch("t", "main2")
    refs = mt.refs_rows(cat, "t")
    assert ("audited", "tag", 1, None, None, None) in refs
    assert ("main2", "branch", 2, None, None, None) in refs


def test_metadata_rows_snapshot_id_time_travel(tmp_path):
    cat = _two_snapshot_catalog(tmp_path)
    assert len(mt.metadata_rows(cat, "t", "files")) == 1
    assert len(mt.metadata_rows(cat, "t", "files", snapshot_id=1)) == 3
    assert len(mt.metadata_rows(cat, "t", "delete_files", snapshot_id=1)) == 2
    with pytest.raises(ValueError, match="unknown metadata table"):
        mt.metadata_rows(cat, "t", "nope")


def test_dataframes_and_datasource_metadata_read(spark, tmp_path):
    from iceberg_compaction_spark.sources.datasource import register

    cat = _two_snapshot_catalog(tmp_path)
    m1 = cat.load_table_at("t", 1)
    assert mt.files_df(spark, m1).count() == 5
    assert mt.partitions_df(spark, m1).count() == 2
    assert mt.snapshots_df(spark, cat, "t").count() == 2
    assert mt.history_df(spark, cat, "t").count() == 2
    assert mt.refs_df(spark, cat, "t").count() == 0

    register(spark)
    base = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
    )
    snaps = base.option("metadata", "snapshots").load()
    got = {r["snapshot_id"]: r for r in snaps.collect()}
    assert got[2]["operation"] == "replace" and got[2]["data_file_count"] == 1
    files_v1 = (
        base.option("metadata", "files").option("snapshot_id", "1").load()
    )
    assert files_v1.count() == 3
    assert (
        files_v1.filter("partition['lang'] = 'en'")
        .agg({"record_count": "sum"})
        .first()[0]
        == 30
    )
    with pytest.raises(Exception, match="read-only"):
        mt.files_df(spark, m1).write.format("iceberg-table").options(
            warehouse=cat.warehouse, table="t", metadata="files"
        ).mode("append").save()


def test_history_is_lineage_aware_on_wap_table(spark, tmp_path):
    """Round 10: the history metadata table marks unpublished branch
    snapshots is_current_ancestor=False and follows the pinned main as
    current; after fast-forward the published lineage flips true."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.ingest import upsert
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    pq.write_table(
        pa.table({
            "id": pa.array(range(10), type=pa.int64()),
            "val": [f"v{i}" for i in range(10)],
        }),
        os.path.join(root, "b.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    cat.create_branch("t", "audit")
    m2 = upsert(
        spark, cat, "t",
        spark.createDataFrame([(1, "a1")], ["id", "val"]),
        keys=["id"], to_branch="audit",
    )
    rows = {r[0]: r for r in mt.history_rows(cat, "t")}
    assert rows[1][2] is True and rows[1][3] is True  # main head
    assert rows[m2.snapshot_id][2] is False  # unpublished branch snap
    assert rows[m2.snapshot_id][1] == 1  # parent stamp

    cat.fast_forward("t", "main", m2.snapshot_id)
    rows = {r[0]: r for r in mt.history_rows(cat, "t")}
    assert rows[m2.snapshot_id][2] is True and rows[m2.snapshot_id][3] is True
    assert rows[1][2] is True and rows[1][3] is False


def test_manifests_rows_group_by_commit_and_content(tmp_path):
    """tbl$manifests (round 11): the head snapshot's files grouped by
    (adding snapshot, data/deletes) with counts, sequence range and
    partition summaries."""
    import json

    cat = _two_snapshot_catalog(tmp_path)
    # snapshot 1: 3 data files + 2 distinct delete files, all added by 1
    rows1 = mt.manifests_rows(cat, "t", snapshot_id=1)
    by = {(r[0], r[2]): r for r in rows1}
    assert set(by) == {(0, 1), (1, 1)}
    data = by[(0, 1)]
    assert data[3] == 3 and data[4] == 60  # files, rows
    assert (data[5], data[6]) == (1, 2)    # seq range of the data files
    summ = json.loads(data[7])
    assert summ[0]["lower_bound"] == "en" and not summ[0]["contains_null"]
    dels = by[(1, 1)]
    assert dels[3] == 2 and dels[4] == 5   # dv(3) + eq(2) records

    # head (snapshot 2, replace keeping one file): groups still credit
    # the ADDING snapshot (1), not the current one
    rows2 = mt.manifests_rows(cat, "t")
    by2 = {(r[0], r[2]): r for r in rows2}
    assert by2[(0, 1)][3] == 1 and by2[(0, 1)][4] == 10


def test_entries_rows_status_against_parent(tmp_path):
    """tbl$entries (round 11): ADDED/EXISTING/DELETED status against
    the parent snapshot, with the ADDING snapshot id on live rows and
    the REMOVING snapshot id on deleted rows."""
    cat = _two_snapshot_catalog(tmp_path)
    # snapshot 1 has no parent: everything ADDED at 1
    e1 = mt.entries_rows(cat, "t", snapshot_id=1)
    assert {r[0] for r in e1} == {1}
    assert {r[1] for r in e1} == {1}
    assert len(e1) == 5  # 3 data + 2 distinct delete files

    # head: file a + its deletes EXISTING (added at 1); b, c DELETED by 2
    e2 = mt.entries_rows(cat, "t")
    by_path = {r[4]: r for r in e2}
    a = by_path[str(tmp_path / "a.parquet")]
    assert a[0] == 0 and a[1] == 1 and a[5] == 10
    for gone in ("b.parquet", "c.parquet"):
        r = by_path[str(tmp_path / gone)]
        assert r[0] == 2 and r[1] == 2  # deleted BY snapshot 2
    assert by_path[str(tmp_path / "eq.parquet")][0] == 0
    dv = by_path[str(tmp_path / "dv.puffin")]
    assert dv[0] == 0 and dv[3] == mt.CONTENT_POSITION_DELETES


def test_manifests_entries_through_datasource_option(spark, tmp_path):
    from iceberg_compaction_spark.sources.datasource import register

    cat = _two_snapshot_catalog(tmp_path)
    register(spark)

    def read(kind, **opts):
        r = (
            spark.read.format("iceberg-table")
            .option("warehouse", cat.warehouse)
            .option("table", "t")
            .option("metadata", kind)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    mdf = read("manifests", snapshot_id="1")
    assert mdf.count() == 2
    assert set(mdf.columns) >= {"content", "added_snapshot_id",
                                "added_rows_count"}
    edf = read("entries")
    got = {r["file_path"]: r["status"] for r in edf.collect()}
    assert got[str(tmp_path / "b.parquet")] == 2
    assert got[str(tmp_path / "a.parquet")] == 0


def test_position_deletes_df_parquet_and_puffin(spark, tmp_path):
    """position_deletes metadata table (round 11): the actual delete
    rows, distributed — parquet delete files AND executor-decoded
    puffin deletion vectors list together, stamped with their delete
    file and sequence number."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources import puffin as pf

    data = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"id": list(range(10))}), data)
    pdel = str(tmp_path / "del.parquet")
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [data, data],
                "sys_hidden_pos": pa.array([1, 3], type=pa.int64()),
            }
        ),
        pdel,
    )
    puf = str(tmp_path / "dv.puffin")
    pf.write_puffin_dvs(puf, {data: [5, 7]})
    task = FileScanTask(
        data_file_path=data,
        length=100,
        record_count=10,
        sequence_number=1,
        deletes=[
            DeleteFile(
                path=pdel,
                content=POSITION_DELETE,
                file_size_in_bytes=100,
                record_count=2,
                sequence_number=2,
            ),
            DeleteFile(
                path=puf,
                content=POSITION_DELETE,
                file_size_in_bytes=100,
                record_count=2,
                sequence_number=3,
            ),
        ],
    )
    m = Manifest(
        table_root=str(tmp_path),
        snapshot_id=1,
        sequence_number=3,
        data_files=[task],
    )
    df = mt.position_deletes_df(spark, m)
    rows = {(r["pos"], r["sequence_number"]) for r in df.collect()}
    assert rows == {(1, 2), (3, 2), (5, 3), (7, 3)}
    by_src = {
        r["pos"]: r["delete_file_path"].split("/")[-1]
        for r in df.collect()
    }
    assert by_src[1] == "del.parquet" and by_src[5] == "dv.puffin"
    assert {r["file_path"].split("/")[-1] for r in df.collect()} == {
        "d.parquet"
    }

    # empty: a snapshot with no position deletes yields an empty frame
    empty = mt.position_deletes_df(
        spark,
        Manifest(
            table_root=str(tmp_path),
            snapshot_id=1,
            sequence_number=1,
            data_files=[
                FileScanTask(
                    data_file_path=data,
                    length=100,
                    record_count=10,
                    sequence_number=1,
                )
            ],
        ),
    )
    assert empty.count() == 0 and "pos" in empty.columns


def test_all_relations_through_datasource_option(spark, tmp_path):
    from iceberg_compaction_spark.sources.datasource import register

    cat = _two_snapshot_catalog(tmp_path)
    register(spark)
    df = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
        .option("metadata", "all_files")
        .load()
    )
    assert df.columns[0] == "reference_snapshot_id"
    per_snap = {
        r["reference_snapshot_id"]
        for r in df.select("reference_snapshot_id").distinct().collect()
    }
    assert per_snap == {1, 2}


def test_metadata_log_entries_rows_and_datasource(spark, tmp_path):
    """``metadata_log_entries`` (round 12; Iceberg's
    ``tbl$metadata_log_entries``): one row per retained version file —
    physical path, declared head/schema/sequence — served both as rows
    and through the DataSource option; rows disappear with expiration
    like Iceberg's."""
    from iceberg_compaction_spark.sources.datasource import register

    cat = _two_snapshot_catalog(tmp_path)
    rows = mt.metadata_log_rows(cat, "t")
    assert [r[2] for r in rows] == [1, 2]          # latest_snapshot_id
    assert [r[4] for r in rows] == [2, 3]          # latest_sequence_number
    assert all(r[1].endswith(f"v{r[2]}.metadata.json") for r in rows)
    assert all(os.path.exists(r[1]) for r in rows)  # genuine files
    assert rows[0][0] > 0 and rows[1][0] >= rows[0][0]  # stamped times

    register(spark)
    df = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
        .option("metadata", "metadata_log_entries")
        .load()
    )
    assert df.count() == 2
    assert df.schema["latest_sequence_number"].dataType.typeName() == "long"

    # expiration drops the expired version's log row (file gone)
    cat.expire_snapshots("t", keep_last=1)
    after = mt.metadata_log_rows(cat, "t")
    assert [r[2] for r in after] == [2]


def test_metadata_log_entries_on_hadoop_tier(spark, tmp_path):
    """The full-fidelity tier serves the same relation over its real
    v<N>.metadata.json trail with per-snapshot commit timestamps."""
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
    upsert(
        spark, cat, "h",
        spark.createDataFrame([(0, "u0")], ["id", "val"]),
        keys=["id"],
    )
    rows = mt.metadata_log_rows(cat, "h")
    assert [r[2] for r in rows] == [1, 2]
    assert all(r[1].endswith(f"v{r[2]}.metadata.json") for r in rows)
    assert all(os.path.exists(r[1]) for r in rows)
    assert all(r[0] > 0 for r in rows)  # real timestamp-ms per version
