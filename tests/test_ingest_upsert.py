"""Upsert/CDC write path -> MOR read -> compaction lifecycle: the
engine producing AND consuming merge-on-read state (the reference only
consumes; its docs assume RisingWave/Flink producing the delete files)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.ingest import read_table_mor, upsert
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def table(tmp_path):
    root = str(tmp_path / "tbl")
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
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


def _rows(spark, cat):
    df = read_table_mor(spark, cat.load_table("t"))
    return {r["id"]: r["val"] for r in df.collect()}


def test_upsert_replaces_and_inserts(spark, table):
    changes = spark.createDataFrame(
        [(3, "v3-new"), (42, "v42")], ["id", "val"]
    )
    m = upsert(spark, table, "t", changes, keys=["id"])
    assert m.snapshot_id == 2
    got = _rows(spark, table)
    assert got[3] == "v3-new"  # replaced
    assert got[42] == "v42"  # inserted
    assert got[4] == "v4"  # untouched
    assert len(got) == 11


def test_upsert_with_deletes_then_compact_materializes(spark, table):
    changes = spark.createDataFrame(
        [(0, "x", "D"), (5, "v5-new", "U"), (99, "v99", "I")],
        ["id", "val", "op"],
    )
    upsert(spark, table, "t", changes, keys=["id"], op_col="op")
    got = _rows(spark, table)
    assert 0 not in got  # deleted
    assert got[5] == "v5-new" and got[99] == "v99"
    assert len(got) == 10

    # compaction materializes the same visible rows and drops deletes
    c = Compaction(spark=spark, config=CompactionConfig.full())
    final, stats = c.compact_catalog(table, "t")
    assert all(not t.deletes for t in final.data_files)
    materialized = {
        r["id"]: r["val"]
        for r in spark.read.parquet(*final.paths()).collect()
    }
    assert materialized == got


def test_sequential_upserts_last_wins(spark, table):
    upsert(
        spark, table, "t",
        spark.createDataFrame([(1, "first")], ["id", "val"]), keys=["id"],
    )
    upsert(
        spark, table, "t",
        spark.createDataFrame([(1, "second")], ["id", "val"]), keys=["id"],
    )
    got = _rows(spark, table)
    assert got[1] == "second"
    assert len(got) == 10


def test_upsert_rejects_ambiguous_batch(spark, table):
    dup = spark.createDataFrame([(1, "a"), (1, "b")], ["id", "val"])
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert(spark, table, "t", dup, keys=["id"])
