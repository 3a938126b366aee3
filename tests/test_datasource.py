"""Python DataSource 'iceberg-table' (sources/datasource.py): batch MOR
reads and streaming append consumption through Spark's own
read/readStream machinery."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.datasource import register
from iceberg_compaction_spark.sources.ingest import upsert
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def cat(tmp_path, spark):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    ids = list(range(20))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": [f"v{i}" for i in ids],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    register(spark)
    return cat


def _batch(spark, cat, **opts):
    r = (
        spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_plain(spark, cat):
    df = _batch(spark, cat)
    assert df.schema.simpleString() == "struct<id:bigint,val:string>"
    assert sorted(r["id"] for r in df.collect()) == list(range(20))


def test_batch_read_applies_mor_deletes(spark, cat):
    delta = spark.createDataFrame(
        [(3, "three"), (99, "ninetynine")], ["id", "val"]
    )
    upsert(spark, cat, "t", delta, keys=["id"])
    got = {r["id"]: r["val"] for r in _batch(spark, cat).collect()}
    assert got[3] == "three"  # old row eq-deleted, new row read
    assert got[99] == "ninetynine"
    assert len(got) == 21


def test_batch_time_travel_option(spark, cat):
    delta = spark.createDataFrame([(99, "x")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta, keys=["id"])
    old = _batch(spark, cat, snapshot_id="1")
    assert old.count() == 20
    new = _batch(spark, cat, snapshot_id=str(m2.snapshot_id))
    assert new.count() == 21


def _stream_rows(spark, cat, base, **opts):
    base = str(base)
    reader = (
        spark.readStream.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    out = os.path.join(base, "sink")
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    files = (
        [n for n in os.listdir(out) if n.endswith(".parquet")]
        if os.path.isdir(out)
        else []
    )
    if not files:
        return []
    return spark.read.parquet(out).collect()


def test_stream_emits_appends_only_from_start_offset(spark, cat, tmp_path):
    # default start = current head: the base file is NOT replayed
    root = cat.load_table("t").table_root
    # first micro-batch: nothing new
    assert _stream_rows(spark, cat, tmp_path) == []

    # commit an append: new file + manifest version
    ids = list(range(100, 105))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": [f"v{i}" for i in ids],
            }
        ),
        os.path.join(root, "extra.parquet"),
    )
    cur = cat.load_table("t")
    m2 = Manifest.from_parquet_dir(root, sequence_number=2)
    m2.snapshot_id = cur.snapshot_id + 1
    cat.commit_table("t", cur.snapshot_id, m2)

    rows = _stream_rows(spark, cat, tmp_path)  # resumes from checkpoint
    assert sorted(r["id"] for r in rows) == ids


def test_stream_earliest_replays_initial_snapshot_appends(spark, cat, tmp_path):
    rows = _stream_rows(spark, cat, tmp_path, starting_snapshot="earliest")
    # earliest starts BEFORE snapshot 1, but snapshot 1 has no
    # predecessor diff inside the window, so nothing emits until the
    # next commit — document the semantics: changes BETWEEN snapshots
    assert rows == []


def test_stream_overwrite_commit_raises_unless_skipped(spark, cat, tmp_path):
    assert _stream_rows(spark, cat, tmp_path) == []
    delta = spark.createDataFrame([(3, "changed")], ["id", "val"])
    upsert(spark, cat, "t", delta, keys=["id"])

    with pytest.raises(Exception, match="changes existing rows"):
        _stream_rows(spark, cat, tmp_path)

    rows = _stream_rows(
        spark,
        cat,
        str(tmp_path / "2"),
        skip_overwrites="true",
        starting_snapshot="1",  # window must include the upsert commit
    )
    # the upsert's added data file still emits
    assert [(r["id"], r["val"]) for r in rows] == [(3, "changed")]


def test_write_append_roundtrip(spark, cat):
    delta = spark.createDataFrame(
        [(200, "w200"), (201, "w201")], "id long, val string"
    )
    (
        delta.write.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
        .mode("append")
        .save()
    )
    m = cat.load_table("t")
    assert m.snapshot_id == 2
    assert m.sequence_number == 2
    added = [t for t in m.data_files if "append-" in t.data_file_path]
    assert added and sum(t.record_count for t in added) == 2
    assert all(t.column_bounds for t in added)  # stats collected
    got = {r["id"]: r["val"] for r in _batch(spark, cat).collect()}
    assert got[200] == "w200" and got[201] == "w201"
    assert len(got) == 22


def test_write_then_stream_sees_the_commit(spark, cat, tmp_path):
    assert _stream_rows(spark, cat, tmp_path) == []
    spark.createDataFrame([(300, "s")], "id long, val string").write.format(
        "iceberg-table"
    ).option("warehouse", cat.warehouse).option("table", "t").mode(
        "append"
    ).save()
    rows = _stream_rows(spark, cat, tmp_path)
    assert [(r["id"], r["val"]) for r in rows] == [(300, "s")]


def test_write_overwrite_replaces_table(spark, cat):
    spark.createDataFrame([(1, "only")], "id long, val string").write.format(
        "iceberg-table"
    ).option("warehouse", cat.warehouse).option("table", "t").mode(
        "overwrite"
    ).save()
    df = _batch(spark, cat)
    assert [(r["id"], r["val"]) for r in df.collect()] == [(1, "only")]


def test_stream_write_sink_commits_per_batch(spark, cat, tmp_path):
    """rate-limited streaming INTO the table: each micro-batch lands as
    one CAS-committed snapshot, and the batch-id property makes replays
    idempotent."""
    import pyspark.sql.functions as SF

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    pq.write_table(
        pa.table(
            {
                "id": pa.array([500, 501], type=pa.int64()),
                "val": ["s500", "s501"],
            }
        ),
        os.path.join(src_dir, "in0.parquet"),
    )
    before = cat.load_table("t").snapshot_id
    q = (
        spark.readStream.schema("id long, val string")
        .parquet(src_dir)
        .writeStream.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    m = cat.load_table("t")
    assert m.snapshot_id == before + 1
    assert m.properties.get("streaming.last-batch-id") == 0
    got = {r["id"]: r["val"] for r in _batch(spark, cat).collect()}
    assert got[500] == "s500" and got[501] == "s501"

    # restart with the same checkpoint and no new input: no new snapshot
    q2 = (
        spark.readStream.schema("id long, val string")
        .parquet(src_dir)
        .writeStream.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert cat.load_table("t").snapshot_id == m.snapshot_id


def test_batch_read_masks_positions_across_row_groups(spark, tmp_path):
    """Position masks must track ABSOLUTE row indices across streamed
    row-group batches, not per-batch indices."""
    from iceberg_compaction_spark.plans.datamodel import (
        POSITION_DELETE,
        DeleteFile,
    )

    root = str(tmp_path / "tbl2")
    os.makedirs(root)
    ids = list(range(100))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": [f"v{i}" for i in ids],
            }
        ),
        os.path.join(root, "multi.parquet"),
        row_group_size=17,  # forces several batches
    )
    data_path = os.path.join(root, "multi.parquet")
    # delete rows in the first, a middle, and the last row group
    positions = [0, 16, 17, 50, 99]
    dpath = os.path.join(root, "pos.parquet")
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [data_path] * len(positions),
                "sys_hidden_pos": pa.array(positions, type=pa.int64()),
            }
        ),
        dpath,
    )
    m = Manifest.from_parquet_dir(root, pattern_suffix="multi.parquet")
    m.data_files[0].deletes = [
        DeleteFile(
            path=dpath,
            content=POSITION_DELETE,
            file_size_in_bytes=os.path.getsize(dpath),
            record_count=len(positions),
            sequence_number=2,
        )
    ]
    cat = FileCatalog(warehouse=str(tmp_path / "wh2"))
    cat.create_table("t2", m)
    register(spark)
    got = sorted(
        r["id"]
        for r in spark.read.format("iceberg-table")
        .option("warehouse", cat.warehouse)
        .option("table", "t2")
        .load()
        .collect()
    )
    assert got == [i for i in ids if i not in positions]
