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


def _commit_noop(cat, name="t", props=None):
    cur = cat.load_table(name)
    nxt = Manifest.from_dict(cur.to_dict())
    nxt.snapshot_id = cur.next_snapshot()
    if props:
        nxt.properties.update(props)
    return cat.commit_table(name, cur.snapshot_id, nxt)


def test_expire_honors_table_retention_properties(cat):
    """Iceberg's property-driven retention (round 11):
    history.expire.min-snapshots-to-keep raises the keep floor above an
    operator's keep_last; history.expire.max-snapshot-age-ms gates
    eligibility by age (both gates must agree — properties only ever
    make expiration more conservative than the explicit keep_last)."""
    import time as _t

    _commit_noop(
        cat, props={"history.expire.min-snapshots-to-keep": "3"}
    )
    for _ in range(3):
        _commit_noop(cat)
    # keep_last=1 would normally leave only v5; the property keeps 3
    expired = cat.expire_snapshots("t", keep_last=1)
    assert expired == [1, 2]
    assert cat.table_history("t") == [3, 4, 5]

    # an age gate far in the future: nothing is old enough to expire
    _commit_noop(
        cat, props={"history.expire.max-snapshot-age-ms": str(10**12)}
    )
    assert cat.expire_snapshots("t", keep_last=1) == []
    # age gate of ~0: age no longer protects, min-keep still does
    _t.sleep(0.01)
    _commit_noop(
        cat, props={"history.expire.max-snapshot-age-ms": "1"}
    )
    _t.sleep(0.01)
    expired2 = cat.expire_snapshots("t", keep_last=1)
    assert cat.table_history("t")[-3:] == [5, 6, 7]
    assert len(cat.table_history("t")) == 3 and expired2 == [3, 4]


def test_all_relations_union_history(tmp_path, cat):
    """all_files / all_entries / all_manifests (round 11): the
    per-snapshot relation unioned over every retained snapshot, each
    row stamped with reference_snapshot_id."""
    _commit_noop(cat)
    af = mt.metadata_rows(cat, "t", "all_files")
    assert {r[0] for r in af} == {1, 2}
    assert len(af) == 6  # 3 files x 2 snapshots
    ae = mt.metadata_rows(cat, "t", "all_entries")
    # snapshot 1: all ADDED; snapshot 2 (same file set): all EXISTING
    assert {(r[0], r[1]) for r in ae} == {(1, 1), (2, 0)}
    am = mt.metadata_rows(cat, "t", "all_manifests")
    assert {r[0] for r in am} == {1, 2}
    assert mt.metadata_schema("all_files").fieldNames()[0] == (
        "reference_snapshot_id"
    )


def test_all_relations_reject_snapshot_scoping(cat):
    """Round-11 review: all_* kinds are history-wide — a snapshot_id/ref
    scope must be rejected loudly, not silently ignored."""
    with pytest.raises(ValueError, match="history-wide"):
        mt.metadata_rows(cat, "t", "all_files", snapshot_id=1)
