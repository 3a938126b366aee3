"""Partition-spec evolution: old files keep their layout, rewrites
migrate them to the table's current spec (the Iceberg model: evolving
the spec changes only future writes; compaction is the migration)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.functions.transforms import (
    PartitionField,
    transform_value,
)
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def table_root(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    for f in range(4):
        ids = range(f * 25, f * 25 + 25)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            os.path.join(root, f"data{f}.parquet"),
        )
    return root


def test_spec_serde_roundtrip(table_root):
    m = Manifest.from_parquet_dir(table_root, sequence_number=1)
    assert m.default_spec_id == 0 and m.partition_spec == []
    sid = m.evolve_spec([PartitionField(source="id", transform="bucket[4]")])
    assert sid == 1
    m2 = Manifest.from_dict(m.to_dict())
    assert m2.default_spec_id == 1
    assert m2.spec_fields() == [
        PartitionField(source="id", transform="bucket[4]", name=None)
    ]
    # existing files still record spec 0
    assert all(t.spec_id == 0 for t in m2.data_files)


def test_rewrite_migrates_files_to_current_spec(spark, table_root):
    m = Manifest.from_parquet_dir(table_root, sequence_number=1)
    m.evolve_spec([PartitionField(source="id", transform="bucket[4]")])
    m.save()

    c = Compaction(spark=spark, config=CompactionConfig.full())
    m2, stats = c.compact(m)

    assert all(t.spec_id == 1 for t in m2.data_files)
    # fan-out produced one partition dir per bucket value, with the
    # bucket value recorded as the partition tuple
    parts = {t.partition for t in m2.data_files}
    assert len(parts) > 1
    assert all(len(p) == 1 for p in parts)
    # partition values agree with the driver-side transform twin
    df = spark.read.parquet(*[t.data_file_path for t in m2.data_files])
    assert df.count() == 100
    for t in m2.data_files:
        got = spark.read.parquet(t.data_file_path).collect()
        for r in got:
            assert str(transform_value("bucket[4]", r["id"])) == t.partition[0]


def test_mixed_spec_table_compacts_clean(spark, table_root):
    """A table mid-migration (spec-0 files + spec-1 files) compacts to a
    uniform current-spec layout with rows preserved."""
    m = Manifest.from_parquet_dir(table_root, sequence_number=1)
    m.evolve_spec([PartitionField(source="id", transform="bucket[2]")])
    # pretend two files were already written under the new spec
    m.data_files[0].spec_id = 1
    m.data_files[0].partition = ("0",)
    m.data_files[1].spec_id = 1
    m.data_files[1].partition = ("1",)
    m.save()

    c = Compaction(spark=spark, config=CompactionConfig.full())
    m2, _ = c.compact(m)
    assert all(t.spec_id == 1 for t in m2.data_files)
    total = sum(t.record_count for t in m2.data_files)
    assert total == 100
