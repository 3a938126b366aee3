"""Planning pipeline tests (L1-L9, L11) — behavior mirrors
core/src/file_selection/strategy.rs tests and
core/src/compaction/tests/file_group_scope.rs."""

from iceberg_compaction_spark.config import (
    CompactionPlanningConfig,
    CompactionType,
    FileGroupScope,
)
from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    DeleteFile,
    FileGroup,
    FileScanTask,
    SnapshotStats,
)
from iceberg_compaction_spark.plans.strategy import (
    BinPackGrouping,
    DeleteFileCountFilter,
    MinGroupFileCount,
    MinGroupSize,
    PlanStrategy,
    SizeFilter,
    group_files_by_partition,
    single_grouping,
)

MB = 1024**2


def task(path, size=MB, partition=(), deletes=()):
    return FileScanTask(
        data_file_path=path,
        length=size,
        record_count=10,
        partition=partition,
        deletes=list(deletes),
    )


def test_size_filter_keeps_small(tmp_path):
    tasks = [task("a", 10), task("b", 100), task("c", 50)]
    assert [t.data_file_path for t in SizeFilter(max_bytes=50)(tasks)] == ["a"]
    assert [t.data_file_path for t in SizeFilter(min_bytes=50)(tasks)] == ["b", "c"]


def test_delete_count_filter():
    d = DeleteFile(path="d1", content=POSITION_DELETE)
    tasks = [task("a"), task("b", deletes=[d]), task("c", deletes=[d, d])]
    assert [t.data_file_path for t in DeleteFileCountFilter(2)(tasks)] == ["c"]


def test_group_by_partition():
    tasks = [task("a", partition=(1,)), task("b", partition=(2,)), task("c", partition=(1,))]
    groups = group_files_by_partition(tasks)
    # keys are (spec_id, *partition) — same-looking tuples from different
    # specs must never co-group
    assert {k: [t.data_file_path for t in v] for k, v in groups.items()} == {
        (0, 1): ["a", "c"],
        (0, 2): ["b"],
    }


def test_group_by_partition_splits_specs():
    a, b = task("a", partition=(1,)), task("b", partition=(1,))
    b.spec_id = 1
    groups = group_files_by_partition([a, b])
    assert {k: [t.data_file_path for t in v] for k, v in groups.items()} == {
        (0, 1): ["a"],
        (1, 1): ["b"],
    }


def test_binpack_grouping():
    tasks = [task(f"f{i}", 40 * MB) for i in range(5)]
    groups = BinPackGrouping(100 * MB)(tasks)
    assert sorted(len(g) for g in groups) == [1, 2, 2]


def test_delete_dedup_in_group():
    d1 = DeleteFile(path="pd", content=POSITION_DELETE, file_size_in_bytes=5)
    d2 = DeleteFile(path="ed", content=EQUALITY_DELETE, equality_ids=("id",))
    tasks = [task("a", deletes=[d1, d2]), task("b", deletes=[d1])]
    g = FileGroup.from_tasks(tasks)
    assert [d.path for d in g.position_delete_files] == ["pd"]
    assert [d.path for d in g.equality_delete_files] == ["ed"]
    assert g.input_file_count == 4


def test_group_filters():
    g_small = FileGroup.from_tasks([task("a", 10)])
    g_big = FileGroup.from_tasks([task("b", 100), task("c", 100)])
    assert MinGroupSize(50)([g_small, g_big]) == [g_big]
    assert MinGroupFileCount(2)([g_small, g_big]) == [g_big]


def test_partition_scope_vs_table_scope():
    """Identity-partition fixture (file_group_scope.rs:103-150): 5 files in
    3 partitions -> 3 partition-scoped groups vs 1 table-scoped group."""
    tasks = [
        task("a", partition=(0,)),
        task("b", partition=(0,)),
        task("c", partition=(1,)),
        task("d", partition=(1,)),
        task("e", partition=(2,)),
    ]
    cfg = CompactionPlanningConfig(compaction_type=CompactionType.FULL)
    groups = PlanStrategy.from_full(cfg).run(tasks)
    assert len(groups) == 3

    cfg_table = CompactionPlanningConfig(
        compaction_type=CompactionType.FULL, group_scope=FileGroupScope.TABLE
    )
    groups = PlanStrategy.from_full(cfg_table).run(tasks)
    assert len(groups) == 1
    assert groups[0].data_file_count == 5


def test_small_files_strategy_end_to_end():
    cfg = CompactionPlanningConfig(
        compaction_type=CompactionType.SMALL_FILES,
        small_file_threshold_bytes=32 * MB,
        min_group_file_count=2,
    )
    tasks = [task("big", 100 * MB), task("s1", MB), task("s2", MB), task("s3", MB)]
    groups = PlanStrategy.from_config(cfg).run(tasks)
    assert len(groups) == 1
    assert sorted(t.data_file_path for t in groups[0].data_files) == ["s1", "s2", "s3"]
    assert groups[0].output_parallelism == 1  # 3 MB < target


def test_full_strategy_never_filters():
    cfg = CompactionPlanningConfig(compaction_type=CompactionType.FULL)
    tasks = [task("a", 1), task("b", 500 * MB)]
    groups = PlanStrategy.from_full(cfg).run(tasks)
    assert sum(g.data_file_count for g in groups) == 2


def test_fixed_point_second_run_noop():
    """After compaction produces one big file, a SmallFiles re-plan with
    min_group_file_count=2 yields no plans (integration_tests.rs:457-477)."""
    cfg = CompactionPlanningConfig(
        compaction_type=CompactionType.SMALL_FILES, min_group_file_count=2
    )
    groups = PlanStrategy.from_config(cfg).run([task("compacted", 10 * MB)])
    assert groups == []


def test_snapshot_stats():
    d = DeleteFile(path="d", content=POSITION_DELETE)
    tasks = [
        task("a", 10 * MB),
        task("b", 100 * MB, deletes=[d, d]),
        task("c", 5 * MB, deletes=[d]),
    ]
    s = SnapshotStats.collect(tasks, 32 * MB, 2)
    assert s.total_data_files == 3
    assert s.small_files_count == 2
    assert s.delete_heavy_files_count == 1
    assert s.total_data_bytes == 115 * MB
