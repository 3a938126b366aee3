"""Table maintenance service: auto-compact + expire + orphan cleanup as
one idempotent pass over a catalog table."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.plans.auto import (
    AutoCompactionConfig,
    AutoPlanReason,
)
from iceberg_compaction_spark.service import MaintenancePolicy, maintain
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def fragmented_catalog(tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root)
    n = 0
    for f in range(8):
        ids = list(range(n, n + 16))
        n += 16
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64())}),
            os.path.join(root, f"part{f}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    return cat


def _policy():
    return MaintenancePolicy(
        auto=AutoCompactionConfig(min_small_files_count=2),
        keep_snapshots=1,
        # no concurrent writers in the test: allow immediate cleanup
        orphan_older_than_s=0,
    )


def test_maintain_full_pass_then_fixed_point(spark, fragmented_catalog):
    cat = fragmented_catalog
    rows_before = spark.read.parquet(*cat.load_table("t").paths()).count()

    r = maintain(spark, cat, "t", _policy())
    assert r.compaction.reason == AutoPlanReason.RECOMMENDED
    assert r.snapshot_after == r.snapshot_before + 1
    assert r.expired_snapshots == [1]
    assert len(r.orphans_removed) == 8  # the original fragments
    live = cat.load_table("t")
    assert spark.read.parquet(*live.paths()).count() == rows_before
    assert len(live.data_files) < 8

    # fixed point: nothing compacts, nothing expires, nothing orphaned
    r2 = maintain(spark, cat, "t", _policy())
    assert r2.snapshot_after == r.snapshot_after
    assert r2.expired_snapshots == []
    assert r2.orphans_removed == []


def test_maintain_retains_history_when_policy_keeps(spark, fragmented_catalog):
    cat = fragmented_catalog
    policy = MaintenancePolicy(
        auto=AutoCompactionConfig(min_small_files_count=2),
        keep_snapshots=5,
        clean_orphans=False,
    )
    r = maintain(spark, cat, "t", policy)
    assert r.expired_snapshots == [] and r.orphans_removed == []
    # both snapshots remain time-travelable
    assert cat.table_history("t") == [1, 2]
    old = cat.load_table_at("t", 1)
    assert all(os.path.exists(p) for p in old.paths())


def test_maintain_consolidates_position_deletes(spark, tmp_path):
    from iceberg_compaction_spark.plans.datamodel import (
        POSITION_DELETE,
        DeleteFile,
    )

    root = str(tmp_path / "data")
    os.makedirs(root + "/deletes")
    for f in range(2):
        ids = list(range(f * 50, f * 50 + 50))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, f"part{f}.parquet"),
        )
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    # four tiny per-commit position-delete files against file 0
    d0 = m.data_files[0].data_file_path
    dels = []
    for i in range(4):
        p = f"{root}/deletes/d{i}.parquet"
        pq.write_table(
            pa.table(
                {
                    "sys_hidden_file_path": [d0],
                    "sys_hidden_pos": pa.array([i], type=pa.int64()),
                }
            ),
            p,
        )
        dels.append(
            DeleteFile(
                path=p,
                content=POSITION_DELETE,
                file_size_in_bytes=os.path.getsize(p),
                record_count=1,
                sequence_number=2,
            )
        )
    m.data_files[0].deletes = dels
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", m)

    policy = MaintenancePolicy(
        auto=AutoCompactionConfig(min_small_files_count=100),  # no compact
        keep_snapshots=1,
        clean_orphans=False,
    )
    r = maintain(spark, cat, "t", policy)
    assert r.delete_rewrite.input_delete_files == 4
    assert r.delete_rewrite.output_delete_files == 1
    assert r.delete_rewrite.positions_kept == 4
    live = cat.load_table("t")
    pos = [
        d
        for t in live.data_files
        for d in t.deletes
        if d.content == POSITION_DELETE
    ]
    assert len(pos) == 1

    # fixed point
    r2 = maintain(spark, cat, "t", policy)
    assert r2.delete_rewrite.output_delete_files == 0
    assert r2.snapshot_after == r.snapshot_after


def test_maintain_converts_equality_deletes_when_enabled(spark, tmp_path):
    from iceberg_compaction_spark.plans.datamodel import (
        EQUALITY_DELETE,
        POSITION_DELETE,
    )
    from iceberg_compaction_spark.sources.ingest import read_table_mor, upsert

    root = str(tmp_path / "data")
    os.makedirs(root)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(30), type=pa.int64()),
                "val": [f"v{i}" for i in range(30)],
            }
        ),
        os.path.join(root, "base.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root, sequence_number=1))
    delta = spark.createDataFrame([(5, "five")], ["id", "val"])
    upsert(spark, cat, "t", delta, keys=["id"])
    before = {
        r["id"]: r["val"]
        for r in read_table_mor(spark, cat.load_table("t")).collect()
    }

    policy = MaintenancePolicy(
        auto=AutoCompactionConfig(min_small_files_count=100),
        keep_snapshots=1,
        clean_orphans=False,
        convert_eq_deletes=True,
    )
    r = maintain(spark, cat, "t", policy)
    assert r.eq_convert.input_equality_files == 1
    live = cat.load_table("t")
    kinds = {d.content for t in live.data_files for d in t.deletes}
    assert EQUALITY_DELETE not in kinds and POSITION_DELETE in kinds
    after = {
        r2["id"]: r2["val"] for r2 in read_table_mor(spark, live).collect()
    }
    assert after == before


def test_maintain_refreshes_statistics(spark, tmp_path):
    """Policy-gated stats refresh rides the maintenance pass AFTER the
    row-set steps; the registered files describe the maintained head."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.operators.stats import read_table_ndv
    from iceberg_compaction_spark.service import (
        MaintenancePolicy,
        maintain,
    )
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "d")
    os.makedirs(root)
    for i in range(4):
        pq.write_table(
            pa.table(
                {"id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}
            ),
            os.path.join(root, f"f{i}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    rep = maintain(
        spark,
        cat,
        "t",
        MaintenancePolicy(
            refresh_column_stats=True, refresh_partition_stats=True
        ),
    )
    assert rep.column_ndv == {"id": 40}
    assert rep.partition_stats_partitions == 1
    head = cat.load_table("t")
    assert head.statistics_files and head.partition_statistics_files
    assert read_table_ndv(head) == {"id": 40.0}


def test_maintain_skips_gc_on_disabled_table(spark, tmp_path):
    """maintain on a gc-disabled fork runs the row-set steps but skips
    expiration/orphan cleanup instead of crashing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.service import (
        MaintenancePolicy,
        maintain,
    )
    from iceberg_compaction_spark.sources.catalog import (
        FileCatalog,
        snapshot_table,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "d")
    os.makedirs(root)
    for i in range(4):
        pq.write_table(
            pa.table(
                {"id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}
            ),
            os.path.join(root, f"f{i}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("src", Manifest.from_parquet_dir(root))
    snapshot_table(cat, "src", "fork")
    rep = maintain(spark, cat, "fork", MaintenancePolicy())
    # the pass completed (no gc ValueError) and gc steps did nothing
    assert rep.expired_snapshots == [] and rep.orphans_removed == []
    assert cat.load_table("fork").properties["gc.enabled"] == "false"
