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
