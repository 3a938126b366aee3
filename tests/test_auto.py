"""Auto planner (L12) behavior tests — mirrors core/src/compaction/auto.rs:471-652
and config candidate tests (config/mod.rs:669-968)."""

from iceberg_compaction_spark.config import CompactionType
from iceberg_compaction_spark.plans.auto import (
    AutoCompactionConfig,
    AutoCompactionPlanner,
    AutoPlanReason,
)
from iceberg_compaction_spark.plans.datamodel import (
    POSITION_DELETE,
    DeleteFile,
    FileScanTask,
)

MB = 1024**2


def task(path, size, n_deletes=0):
    deletes = [
        DeleteFile(path=f"{path}-d{i}", content=POSITION_DELETE)
        for i in range(n_deletes)
    ]
    return FileScanTask(data_file_path=path, length=size, record_count=1, deletes=deletes)


def cfg(**kw):
    kw.setdefault("min_delete_file_count_threshold", 2)
    kw.setdefault("min_delete_heavy_files_count", 2)
    kw.setdefault("min_small_files_count", 3)
    return AutoCompactionConfig(**kw)


def test_no_snapshot():
    r = AutoCompactionPlanner(cfg()).plan_report(None)
    assert r.reason == AutoPlanReason.NO_SNAPSHOT and not r.plans


def test_no_candidate_when_below_thresholds():
    tasks = [task("a", 100 * MB), task("b", 100 * MB)]
    r = AutoCompactionPlanner(cfg()).plan_report(tasks)
    assert r.reason == AutoPlanReason.NO_CANDIDATE


def test_single_file_never_candidate():
    tasks = [task("a", MB)]
    r = AutoCompactionPlanner(cfg()).plan_report(tasks)
    assert r.reason == AutoPlanReason.NO_CANDIDATE


def test_small_files_selected():
    tasks = [task(f"s{i}", MB) for i in range(4)]
    r = AutoCompactionPlanner(cfg()).plan_report(tasks)
    assert r.reason == AutoPlanReason.RECOMMENDED
    assert r.selected_strategy == CompactionType.SMALL_FILES
    assert r.plans and r.rewrite_ratio == 1.0


def test_delete_plan_preferred_over_small_files():
    tasks = [task(f"s{i}", MB, n_deletes=2) for i in range(4)]
    r = AutoCompactionPlanner(cfg()).plan_report(tasks)
    assert r.selected_strategy == CompactionType.FILES_WITH_DELETES
    assert r.reason == AutoPlanReason.RECOMMENDED


def test_budget_cap():
    # 6 partitions of small files -> 6 plans, capped at 2
    tasks = []
    for p in range(6):
        for i in range(3):
            t = task(f"p{p}f{i}", MB)
            t.partition = (p,)
            tasks.append(t)
    c = cfg(min_small_files_count=3, max_auto_plans_per_run=2)
    r = AutoCompactionPlanner(c).plan_report(tasks)
    assert r.reason == AutoPlanReason.BUDGET_CAPPED
    assert len(r.plans) == 2
    assert 0 < r.rewrite_ratio < 1


def test_zero_threshold_disables_candidate():
    tasks = [task(f"s{i}", MB, n_deletes=5) for i in range(5)]
    c = cfg(min_delete_heavy_files_count=0, min_small_files_count=0)
    r = AutoCompactionPlanner(c).plan_report(tasks)
    assert r.reason == AutoPlanReason.NO_CANDIDATE


def test_auto_compaction_end_to_end(spark, tmp_path):
    """Entry point 3: auto-select SMALL_FILES on a fragmented table,
    compact 8 -> 1, then report NO_CANDIDATE at the fixed point."""
    import glob
    import os
    import shutil

    from iceberg_compaction_spark.compaction import AutoCompaction
    from iceberg_compaction_spark.config import CompactionType
    from iceberg_compaction_spark.plans.auto import AutoPlanReason
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "tbl")
    os.makedirs(root)
    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartition(8).write.mode("overwrite").parquet(root + "/frag")
    for i, p in enumerate(sorted(glob.glob(root + "/frag/*.parquet"))):
        os.rename(p, f"{root}/d{i}.parquet")
    shutil.rmtree(root + "/frag")
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    m.save()

    auto = AutoCompaction(spark=spark)
    m2, stats, report = auto.compact(m)
    assert report.reason == AutoPlanReason.RECOMMENDED
    assert report.selected_strategy == CompactionType.SMALL_FILES
    assert 0 < report.rewrite_ratio <= 1.0
    assert stats.input_files_count == 8
    assert stats.output_files_count == 1
    assert sum(t.record_count for t in m2.data_files) == src.count()

    m3, stats2, report2 = auto.compact(m2)
    assert report2.reason == AutoPlanReason.NO_CANDIDATE
    assert stats2.input_files_count == 0
    assert m3.snapshot_id == m2.snapshot_id
