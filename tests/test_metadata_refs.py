"""Metadata tables (sources/metadata_tables.py) and catalog refs
(tags/branches + ref-aware snapshot expiry)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.sources import metadata_tables as mt
from iceberg_compaction_spark.sources.catalog import FileCatalog, TableNotFound
from iceberg_compaction_spark.sources.ingest import upsert
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def cat(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for f in range(3):
        ids = range(f * 10, f * 10 + 10)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, f"data{f}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


# ---- metadata tables -------------------------------------------------------


def test_files_table(spark, cat):
    df = mt.files_df(spark, cat.load_table("t")).filter(
        f"content = {mt.CONTENT_DATA}"
    )
    rows = df.collect()
    assert len(rows) == 3
    assert {r["record_count"] for r in rows} == {10}
    assert all(r["position_delete_count"] == 0 for r in rows)
    assert all(r["column_bounds"] for r in rows)  # footer stats captured


def test_delete_files_table_after_upsert(spark, cat):
    delta = spark.createDataFrame([(1, "new")], ["id", "val"])
    upsert(spark, cat, "t", delta, keys=["id"])
    rows = mt.files_df(spark, cat.load_table("t")).filter(
        f"content != {mt.CONTENT_DATA}"
    ).collect()
    eqs = [r for r in rows if r["content"] == mt.CONTENT_EQUALITY_DELETES]
    assert eqs
    assert eqs[0]["applies_to_files"] == 3  # attaches to every lower-seq file
    assert "id" in eqs[0]["equality_ids"]


def test_partitions_and_snapshots_and_history(spark, cat):
    delta = spark.createDataFrame([(99, "x")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta, keys=["id"])

    parts = mt.partitions_df(spark, cat.load_table("t")).collect()
    assert sum(r["file_count"] for r in parts) == 4  # 3 base + 1 upsert

    snaps = {r["snapshot_id"]: r for r in mt.snapshots_df(spark, cat, "t").collect()}
    assert set(snaps) == {1, m2.snapshot_id}
    assert snaps[m2.snapshot_id]["total_records"] > snaps[1]["total_records"]
    assert snaps[1]["format_version"] == 2

    hist = {r["snapshot_id"]: r["is_current"] for r in mt.history_df(spark, cat, "t").collect()}
    assert hist == {1: False, m2.snapshot_id: True}


# ---- refs ------------------------------------------------------------------


def test_tag_pins_snapshot_through_expiry(spark, cat):
    for i in range(3):
        delta = spark.createDataFrame([(100 + i, f"u{i}")], ["id", "val"])
        upsert(spark, cat, "t", delta, keys=["id"])
    cat.create_tag("t", "audit-v1", snapshot_id=1)

    expired = cat.expire_snapshots("t", keep_last=1)
    assert 1 not in expired  # tagged snapshot survives
    assert cat.load_table_ref("t", "audit-v1").snapshot_id == 1
    # untagged old snapshots are gone
    with pytest.raises(TableNotFound):
        cat.load_table_at("t", 2)


def test_tag_is_immutable_branch_moves(spark, cat):
    cat.create_tag("t", "rel", snapshot_id=1)
    with pytest.raises(ValueError):
        cat.create_tag("t", "rel", snapshot_id=1)
    with pytest.raises(ValueError):
        cat.fast_forward("t", "rel", 1)

    delta = spark.createDataFrame([(200, "b")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta, keys=["id"])
    cat.create_branch("t", "prod", snapshot_id=1)
    assert cat.load_table_ref("t", "prod").snapshot_id == 1

    # write-audit-publish: head moved to m2; prod still serves 1 until
    # the audited fast-forward
    cat.fast_forward("t", "prod", m2.snapshot_id)
    assert cat.load_table_ref("t", "prod").snapshot_id == m2.snapshot_id
    with pytest.raises(ValueError):
        cat.fast_forward("t", "prod", 1)  # backwards


def test_drop_ref_and_missing_refs(cat):
    cat.create_tag("t", "x", snapshot_id=1)
    cat.drop_ref("t", "x")
    assert cat.list_refs("t") == {}
    with pytest.raises(KeyError):
        cat.drop_ref("t", "x")
    with pytest.raises(KeyError):
        cat.load_table_ref("t", "nope")
    with pytest.raises(TableNotFound):
        cat.create_tag("t", "y", snapshot_id=77)
