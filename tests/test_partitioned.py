"""Partitioned-table compaction (F6 fixture): 30 input files across 5
bucket partitions -> one output file per partition; second run is a
no-op (integration_tests.rs:330-363,457-477 behavior)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.sources.manifest import Manifest

N_BUCKETS = 5
FILES_PER_BUCKET = 6


@pytest.fixture()
def bucketed_table(tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(root)
    src = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    suppkey = src.column("l_suppkey").to_pylist()
    import collections

    by_bucket = collections.defaultdict(list)
    for i, s in enumerate(suppkey):
        by_bucket[s % N_BUCKETS].append(i)

    m = Manifest(table_root=root, snapshot_id=1, sequence_number=1)
    for b in range(N_BUCKETS):
        idxs = by_bucket[b]
        chunk = max(1, len(idxs) // FILES_PER_BUCKET)
        parts = [idxs[i : i + chunk] for i in range(0, len(idxs), chunk)][
            :FILES_PER_BUCKET
        ]
        # fold any remainder into the last file
        rest = idxs[chunk * FILES_PER_BUCKET :]
        if rest:
            parts[-1] = parts[-1] + rest
        for f, rows in enumerate(parts):
            path = os.path.join(root, f"b{b}-f{f}.parquet")
            pq.write_table(src.take(rows), path)
            from iceberg_compaction_spark.plans.datamodel import FileScanTask

            m.data_files.append(
                FileScanTask(
                    data_file_path=path,
                    length=os.path.getsize(path),
                    record_count=len(rows),
                    sequence_number=1,
                    partition=(b,),
                )
            )
    m.save()
    return m


def test_partitioned_compaction_5_outputs_then_fixed_point(spark, bucketed_table):
    m = bucketed_table
    assert len(m.data_files) == N_BUCKETS * FILES_PER_BUCKET

    cfg = CompactionConfig.small_files(min_group_file_count=2)
    c = Compaction(spark=spark, config=cfg)
    plans = c.plan(m)
    assert len(plans) == N_BUCKETS  # one group per partition
    assert all(p.file_group.output_parallelism == 1 for p in plans)

    m2, stats = c.compact(m)
    assert stats.input_files_count == N_BUCKETS * FILES_PER_BUCKET
    assert stats.output_files_count == N_BUCKETS  # 30 -> 5
    assert len(m2.data_files) == N_BUCKETS

    total_rows = sum(t.record_count for t in m.data_files)
    assert sum(t.record_count for t in m2.data_files) == total_rows

    # partition values carry over per group
    # second run: groups of one file are filtered out -> no-op
    m3, stats2 = c.compact(m2)
    assert stats2.input_files_count == 0
    assert m3.snapshot_id == m2.snapshot_id


def test_table_scope_single_plan(spark, bucketed_table):
    from iceberg_compaction_spark.config import FileGroupScope

    cfg = CompactionConfig.small_files(group_scope=FileGroupScope.TABLE)
    plans = Compaction(spark=spark, config=cfg).plan(bucketed_table)
    assert len(plans) == 1
    assert plans[0].file_group.data_file_count == N_BUCKETS * FILES_PER_BUCKET
