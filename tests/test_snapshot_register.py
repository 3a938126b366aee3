"""snapshot_table / register_table procedures + the gc.enabled guard.

Iceberg parity: ``snapshot_table`` is the zero-copy fork (new table,
same data files, ``gc.enabled=false``), ``register_table`` adopts an
existing table by its metadata file, and ``gc.enabled=false`` makes
every garbage-collecting maintenance entry point refuse — the fork's
initial files belong to the source table.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.sources.catalog import (
    FileCatalog,
    TableAlreadyExists,
    register_table,
    snapshot_table,
)
from iceberg_compaction_spark.sources.ingest import read_table_mor, upsert
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def cat(tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root)
    ids = list(range(100))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "val": pa.array([f"v{i}" for i in ids]),
            }
        ),
        os.path.join(root, "f0.parquet"),
    )
    c = FileCatalog(warehouse=str(tmp_path / "wh"))
    c.create_table("src", Manifest.from_parquet_dir(root))
    return c


def test_snapshot_table_zero_copy_fork(spark, cat):
    fork = snapshot_table(cat, "src", "fork")
    # same rows, same underlying files (no data copied)
    src = cat.load_table("src")
    assert [t.data_file_path for t in fork.data_files] == [
        t.data_file_path for t in src.data_files
    ]
    assert read_table_mor(spark, fork).count() == 100
    # fork provenance + gc stamp
    assert fork.properties["gc.enabled"] == "false"
    assert fork.properties["snapshot.source-table"] == "src"
    assert fork.table_root != src.table_root


def test_fork_writes_do_not_touch_source(spark, cat):
    snapshot_table(cat, "src", "fork")
    changes = spark.createDataFrame(
        [(5, "CHANGED"), (200, "NEW")], "id long, val string"
    )
    upsert(spark, cat, "fork", changes, keys=["id"])
    forked = read_table_mor(spark, cat.load_table("fork"))
    assert forked.count() == 101
    assert (
        forked.where("id = 5").collect()[0]["val"] == "CHANGED"
    )
    # the source is untouched — same snapshot, same rows
    src = read_table_mor(spark, cat.load_table("src"))
    assert src.count() == 100
    assert src.where("id = 5").collect()[0]["val"] == "v5"
    assert cat.load_table("src").snapshot_id == 1
    # the fork's NEW file landed under the fork's own root
    new_files = [
        t.data_file_path
        for t in cat.load_table("fork").data_files
        if "fork" in t.data_file_path
    ]
    assert new_files


def test_gc_disabled_blocks_destructive_maintenance(spark, cat):
    snapshot_table(cat, "src", "fork")
    changes = spark.createDataFrame([(1, "x")], "id long, val string")
    upsert(spark, cat, "fork", changes, keys=["id"])
    with pytest.raises(ValueError, match="gc.enabled"):
        cat.expire_snapshots("fork", keep_last=1)
    with pytest.raises(ValueError, match="gc.enabled"):
        cat.remove_orphan_files("fork", older_than_s=0)
    # the SOURCE's maintenance still works and must not unlink the
    # shared file the fork references (it is referenced by src itself)
    assert cat.remove_orphan_files("src", older_than_s=0) == []
    assert read_table_mor(spark, cat.load_table("fork")).count() == 100


def test_snapshot_table_name_collision(cat):
    snapshot_table(cat, "src", "fork")
    with pytest.raises(TableAlreadyExists):
        snapshot_table(cat, "src", "fork")


def test_register_table_engine_manifest(spark, cat, tmp_path):
    # adopt the src table's own metadata file into a second catalog
    meta = os.path.join(cat.warehouse, "src", "metadata", "v1.metadata.json")
    cat2 = FileCatalog(warehouse=str(tmp_path / "wh2"))
    adopted = register_table(cat2, "adopted", meta)
    assert read_table_mor(spark, adopted).count() == 100
    assert adopted.properties["gc.enabled"] == "false"
    assert adopted.properties["register.source-metadata"] == meta
    with pytest.raises(ValueError, match="gc.enabled"):
        cat2.expire_snapshots("adopted", keep_last=1)


def test_register_table_real_iceberg_metadata(spark, tmp_path):
    """Cross-tier adoption: a hadoop-tier (real metadata.json + Avro
    manifest list) table registers into an engine-tier catalog."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    root = str(tmp_path / "d")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array(range(50), type=pa.int64())}),
        os.path.join(root, "f0.parquet"),
    )
    hcat = IcebergHadoopCatalog(warehouse=str(tmp_path / "hwh"))
    hcat.create_table("t", Manifest.from_parquet_dir(root))
    meta = os.path.join(
        str(tmp_path / "hwh"), "t", "metadata", "v1.metadata.json"
    )
    assert os.path.exists(meta)
    cat2 = FileCatalog(warehouse=str(tmp_path / "wh2"))
    adopted = register_table(cat2, "t2", meta)
    assert read_table_mor(spark, adopted).count() == 50
    assert adopted.properties["gc.enabled"] == "false"


def test_gc_disabled_blocks_hadoop_metadata_sweep(tmp_path):
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    root = str(tmp_path / "d")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array(range(10), type=pa.int64())}),
        os.path.join(root, "f0.parquet"),
    )
    hcat = IcebergHadoopCatalog(warehouse=str(tmp_path / "hwh"))
    m = Manifest.from_parquet_dir(root)
    m.properties["gc.enabled"] = "false"
    hcat.create_table("t", m)
    with pytest.raises(ValueError, match="gc.enabled"):
        hcat.remove_orphan_metadata("t", older_than_s=0)
    with pytest.raises(ValueError, match="gc.enabled"):
        hcat.expire_snapshots("t", keep_last=1)


def test_snapshot_table_cross_catalog(spark, cat, tmp_path):
    from iceberg_compaction_spark.sources.catalog import snapshot_table

    dev = FileCatalog(warehouse=str(tmp_path / "devwh"))
    fork = snapshot_table(cat, "src", "devfork", dest_catalog=dev)
    assert dev.load_table("devfork").snapshot_id == 1
    assert read_table_mor(spark, fork).count() == 100
    # source catalog does NOT gain the fork; source table untouched
    import pytest as _pytest

    from iceberg_compaction_spark.sources.catalog import TableNotFound

    with _pytest.raises(TableNotFound):
        cat.load_table("devfork")
    assert cat.load_table("src").snapshot_id == 1
    # fork's own root lives under the DEV warehouse
    assert str(tmp_path / "devwh") in fork.table_root


def test_migrate_table_owns_files_gc_enabled(spark, cat, tmp_path):
    """migrate_table: in-place adoption with gc ENABLED — maintenance
    applies immediately (the compact-the-backlog onboarding story)."""
    from iceberg_compaction_spark.compaction import Compaction
    from iceberg_compaction_spark.config import CompactionConfig
    from iceberg_compaction_spark.sources.catalog import migrate_table

    root = str(tmp_path / "legacy")
    os.makedirs(root)
    for i in range(4):
        pq.write_table(
            pa.table(
                {"id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}
            ),
            os.path.join(root, f"part-{i}.parquet"),
        )
    m = migrate_table(cat, "legacy", root)
    assert len(m.data_files) == 4
    assert m.properties.get("gc.enabled") is None  # gc stays enabled
    assert read_table_mor(spark, m).count() == 40
    # the full maintenance tier applies: compact + expire work
    c = Compaction(spark, CompactionConfig.small_files())
    m2, _ = c.compact_catalog(cat, "legacy")
    assert len(m2.data_files) == 1
    assert cat.expire_snapshots("legacy", keep_last=1) == [1]


def test_register_table_forces_gc_off_despite_source_true(spark, cat, tmp_path):
    """Source metadata carrying explicit gc.enabled=true must still
    adopt with GC disabled (review finding: setdefault left GC armed
    on a shared-file adoption)."""
    import json

    meta = os.path.join(
        cat.warehouse, "src", "metadata", "v1.metadata.json"
    )
    d = json.loads(open(meta).read())
    d.setdefault("properties", {})["gc.enabled"] = "true"
    poisoned = str(tmp_path / "poisoned.metadata.json")
    with open(poisoned, "w") as f:
        json.dump(d, f)
    cat2 = FileCatalog(warehouse=str(tmp_path / "wh3"))
    adopted = register_table(cat2, "adopted2", poisoned)
    assert adopted.properties["gc.enabled"] == "false"


def test_snapshot_table_refuses_unrooted_backend(cat):
    """A backend that cannot derive a fork directory must refuse
    rather than share the source's root (review finding)."""
    from iceberg_compaction_spark.sources.catalog import snapshot_table

    class Rootless:
        def load_table(self, name):
            return cat.load_table(name)

        def create_table(self, name, m):  # pragma: no cover
            raise AssertionError("must refuse before creating")

    with pytest.raises(ValueError, match="table_root"):
        snapshot_table(cat, "src", "f2", dest_catalog=Rootless())
