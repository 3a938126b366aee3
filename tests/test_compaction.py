"""End-to-end compaction lifecycle (§3.1): manifest -> plan -> rewrite ->
commit -> validate, mirroring the reference's in-crate e2e tests
(core/src/compaction/mod.rs:1358-2675) on the local-parquet backend."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.commit import (
    CommitConflict,
    CommitManager,
    InconsistentPlansError,
    RewriteResult,
    validate_consistency,
)
from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import (
    CommitRetryConfig,
    CompactionConfig,
    CompactionType,
)
from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    CompactionPlan,
    DeleteFile,
    FileGroup,
    FileScanTask,
)
from iceberg_compaction_spark.sources.manifest import Manifest


@pytest.fixture()
def table(tmp_path):
    """A fragmented table: 4 small data files + pos/eq deletes."""
    root = tmp_path / "tbl"
    root.mkdir()
    n = 0
    for f in range(4):
        ids = list(range(n, n + 25))
        n += 25
        pq.write_table(
            pa.table({"id": pa.array(ids, type=pa.int64()),
                      "name": [f"name{i}" for i in ids]}),
            str(root / f"data{f}.parquet"),
        )
    # position delete: first row of data0
    pos = str(root / "deletes" / "pos.parquet")
    os.makedirs(os.path.dirname(pos))
    pq.write_table(
        pa.table({"sys_hidden_file_path": [str(root / "data0.parquet")],
                  "sys_hidden_pos": pa.array([0], type=pa.int64())}),
        pos,
    )
    # equality delete: ids 30, 31 with newer seq
    eq = str(root / "deletes" / "eq.parquet")
    pq.write_table(
        pa.table({"id": pa.array([30, 31], type=pa.int64()),
                  "sys_hidden_seq_num": pa.array([5, 5], type=pa.int64())}),
        eq,
    )

    m = Manifest.from_parquet_dir(str(root), sequence_number=1)
    pos_f = DeleteFile(path=pos, content=POSITION_DELETE,
                       file_size_in_bytes=os.path.getsize(pos), sequence_number=5)
    eq_f = DeleteFile(path=eq, content=EQUALITY_DELETE,
                      file_size_in_bytes=os.path.getsize(eq),
                      sequence_number=5, equality_ids=("id",))
    for t in m.data_files:
        t.deletes = [pos_f, eq_f]
    m.save()
    return m


def test_full_compaction_end_to_end(spark, table):
    cfg = CompactionConfig.full()
    cfg.enable_validate_compaction = True
    c = Compaction(spark=spark, config=cfg)
    new_manifest, stats = c.compact(table)

    # 100 rows - 1 pos-delete - 2 eq-deletes = 97 surviving rows
    rows = sum(t.record_count for t in new_manifest.data_files)
    assert rows == 97
    assert stats.input_files_count == 4 + 2  # 4 data + 2 delete files
    assert stats.output_files_count == len(new_manifest.data_files)
    assert new_manifest.snapshot_id == table.snapshot_id + 1
    # old files no longer referenced
    old = set(table.paths())
    assert not (old & set(new_manifest.paths()))
    # new files pinned to starting sequence number (T1)
    assert all(t.sequence_number == 1 for t in new_manifest.data_files)
    # survivors correct
    df = spark.read.parquet(*new_manifest.paths())
    ids = sorted(r["id"] for r in df.collect())
    assert ids == sorted(set(range(100)) - {0, 30, 31})
    # manifest persisted
    reloaded = Manifest.load(new_manifest.manifest_path())
    assert reloaded.snapshot_id == new_manifest.snapshot_id


def test_small_files_compaction_selects_all_small(spark, table):
    cfg = CompactionConfig.small_files(min_group_file_count=2)
    c = Compaction(spark=spark, config=cfg)
    plans = c.plan(table)
    assert len(plans) == 1
    assert plans[0].file_group.data_file_count == 4


def test_plan_driven_workflow(spark, table):
    """Entry point 2: caller drives plan -> rewrite -> commit separately."""
    c = Compaction(spark=spark, config=CompactionConfig.full())
    plans = c.plan(table)
    results = [c.rewrite(p) for p in plans]
    new = c.commit(table, results)
    assert sum(t.record_count for t in new.data_files) == 97


def test_commit_consistency_validation(table):
    g = FileGroup(data_files=[])
    r1 = RewriteResult(plan=CompactionPlan(file_group=g, snapshot_id=1), added_files=[])
    r2 = RewriteResult(plan=CompactionPlan(file_group=g, snapshot_id=2), added_files=[])
    with pytest.raises(InconsistentPlansError):
        validate_consistency([r1, r2])


def test_commit_conflict_on_stale_snapshot(table):
    cm = CommitManager()
    g = FileGroup(data_files=[])
    stale = RewriteResult(
        plan=CompactionPlan(file_group=g, snapshot_id=table.snapshot_id + 7),
        added_files=[],
    )
    with pytest.raises(CommitConflict):
        cm.rewrite_files(table, [stale])


def test_commit_conflict_on_missing_file(table):
    cm = CommitManager()
    ghost = FileScanTask(data_file_path="/nope.parquet", length=1)
    r = RewriteResult(
        plan=CompactionPlan(
            file_group=FileGroup(data_files=[ghost]), snapshot_id=table.snapshot_id
        ),
        added_files=[],
    )
    with pytest.raises(CommitConflict):
        cm.rewrite_files(table, [r])


def test_commit_retry_succeeds_after_conflicts():
    cm = CommitManager(retry=CommitRetryConfig(max_retries=3, initial_backoff_s=0.001))
    attempts = {"n": 0}

    def flaky():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise CommitConflict("try again")
        return Manifest(table_root="/tmp/x", snapshot_id=9)

    out = cm.commit_with_retry(flaky)
    assert out.snapshot_id == 9
    assert attempts["n"] == 3


def test_commit_retry_exhausts():
    cm = CommitManager(retry=CommitRetryConfig(max_retries=2, initial_backoff_s=0.001))

    def always_fail():
        raise CommitConflict("nope")

    with pytest.raises(CommitConflict):
        cm.commit_with_retry(always_fail)


def test_concurrent_commit_loses_cleanly(spark, table):
    """Two compactions planned from the same snapshot: the first commit
    wins, the second must fail the pin check against the RELOADED
    on-disk manifest instead of silently clobbering (lost update)."""
    from iceberg_compaction_spark.commit import CommitConflict
    from iceberg_compaction_spark.config import CommitRetryConfig

    cfg = CompactionConfig.full()
    cfg.retry = CommitRetryConfig(max_retries=1, initial_backoff_s=0.01, max_backoff_s=0.02)
    c1 = Compaction(spark=spark, config=cfg)
    c2 = Compaction(spark=spark, config=cfg)

    plans1 = c1.plan(table)
    plans2 = c2.plan(table)
    r1 = [c1.rewrite(p) for p in plans1]
    r2 = [c2.rewrite(p) for p in plans2]

    m2 = c1.commit(table, r1)
    assert m2.snapshot_id == table.snapshot_id + 1
    with pytest.raises(CommitConflict):
        c2.commit(table, r2)
    # the winner's manifest is still what's on disk
    from iceberg_compaction_spark.sources.manifest import Manifest

    assert Manifest.load(table.manifest_path()).snapshot_id == m2.snapshot_id


def test_non_overlapping_concurrent_commits_both_succeed(spark, table):
    """Two plans from the SAME starting snapshot touching DISJOINT file
    sets: both commits must land (the second sees a bumped snapshot id
    but all its rewritten files still live) — matching the reference,
    which only requires the starting snapshot to exist + schema match +
    file existence (compaction/mod.rs:968-1000).  Under the old
    snapshot-id equality check the second commit could never succeed
    and the retry loop was dead code."""
    cfg = CompactionConfig.full()
    c = Compaction(spark=spark, config=cfg)

    tasks = list(table.data_files)
    mk = lambda ts: CompactionPlan(  # noqa: E731
        file_group=FileGroup.from_tasks(ts),
        snapshot_id=table.snapshot_id,
        starting_sequence_number=table.sequence_number,
        schema_id=table.schema_id,
    )
    p1, p2 = mk(tasks[:2]), mk(tasks[2:])
    r1, r2 = c.rewrite(p1), c.rewrite(p2)

    m1 = c.commit(table, [r1])
    assert m1.snapshot_id == table.snapshot_id + 1
    m2 = c.commit(table, [r2])  # pinned to the ORIGINAL snapshot — succeeds
    assert m2.snapshot_id == table.snapshot_id + 2
    # all survivors present exactly once: 100 - 1 pos - 2 eq = 97
    assert sum(t.record_count for t in m2.data_files) == 97
    ids = sorted(r["id"] for r in spark.read.parquet(*m2.paths()).collect())
    assert ids == sorted(set(range(100)) - {0, 30, 31})


def test_two_writer_race_exactly_one_wins(spark, table):
    """Both writers rewrite ALL files and commit simultaneously: the
    commit mutex serializes load->validate->save, so exactly one lands
    and the other fails T4 (its inputs were swapped out) — never a
    silent lost update."""
    import threading

    cfg = CompactionConfig.full()
    cfg.retry = CommitRetryConfig(
        max_retries=1, initial_backoff_s=0.01, max_backoff_s=0.02
    )
    cs = [Compaction(spark=spark, config=cfg) for _ in range(2)]
    results = [[c.rewrite(p) for p in c.plan(table)] for c in cs]

    outcomes: list = [None, None]

    def run(i):
        try:
            outcomes[i] = cs[i].commit(table, results[i])
        except CommitConflict as e:
            outcomes[i] = e

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    wins = [o for o in outcomes if isinstance(o, Manifest)]
    losses = [o for o in outcomes if isinstance(o, CommitConflict)]
    assert len(wins) == 1 and len(losses) == 1, outcomes
    assert Manifest.load(table.manifest_path()).snapshot_id == wins[0].snapshot_id


def test_manifest_lock_breaks_stale_and_times_out(tmp_path):
    from iceberg_compaction_spark.sources.manifest import (
        ManifestLockTimeout,
        manifest_lock,
    )

    path = str(tmp_path / "_manifest.json")
    lock = f"{path}.lock"

    # stale lock (older than timeout) is broken and acquired
    with open(lock, "w") as f:
        f.write("999999")
    os.utime(lock, (0, 0))
    with manifest_lock(path, timeout_s=0.2):
        assert os.path.exists(lock)
    assert not os.path.exists(lock)

    # fresh lock held by someone else -> timeout
    with open(lock, "w") as f:
        f.write("1")
    with pytest.raises(ManifestLockTimeout):
        with manifest_lock(path, timeout_s=0.2, poll_s=0.02):
            pass
    os.unlink(lock)


def test_manifest_lock_detects_mid_commit_theft(tmp_path):
    """A holder whose lock inode vanishes (a stale-break race stole it)
    must see still_held() == False before its final rename — the inode
    self-check from the lock's best-effort protocol."""
    from iceberg_compaction_spark.sources.manifest import manifest_lock

    path = str(tmp_path / "_manifest.json")
    lock = f"{path}.lock"

    with manifest_lock(path) as still_held:
        assert still_held()
        os.unlink(lock)  # breaker steals our lock
        assert not still_held()
        # a DIFFERENT writer's lock in the slot is also not ours
        with open(lock, "w") as f:
            f.write("other")
        assert not still_held()


def test_compaction_config_retry_plumbed():
    from iceberg_compaction_spark.config import CommitRetryConfig

    cfg = CompactionConfig.full()
    cfg.retry = CommitRetryConfig(max_retries=7)
    c = Compaction(spark=None, config=cfg)
    assert c.commit_manager.retry.max_retries == 7


def test_v3_table_compaction_end_to_end(spark, table):
    """A format-v3 table compacts through the same lifecycle with
    reader-side position-delete application; survivors identical and the
    version survives the commit."""
    table.format_version = 3
    table.save()
    t = Manifest.load(table.manifest_path())
    assert t.format_version == 3

    c = Compaction(spark=spark, config=CompactionConfig.full())
    new_manifest, _ = c.compact(t)
    assert new_manifest.format_version == 3
    assert sum(x.record_count for x in new_manifest.data_files) == 97
    ids = sorted(
        r["id"] for r in spark.read.parquet(*new_manifest.paths()).collect()
    )
    assert ids == sorted(set(range(100)) - {0, 30, 31})


def test_where_scoped_compaction(spark, tmp_path):
    """Iceberg rewrite_data_files(where => ...): only files whose
    footer stats may match the predicate are rewritten; out-of-scope
    files stay byte-identical (VERDICT-style plan scoping, round 12)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.plans.pruning import (
        ColumnPredicate,
        parse_where,
    )
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "d")
    os.makedirs(root)
    # 6 small files: ids 0..59, two per id-range band
    for i in range(6):
        pq.write_table(
            pa.table(
                {"id": pa.array(range(i * 10, i * 10 + 10), type=pa.int64())}
            ),
            os.path.join(root, f"f{i}.parquet"),
        )
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    c = Compaction(spark, CompactionConfig.small_files())

    # scope: only the first half (ids < 30 = files f0,f1,f2 by bounds)
    m2, stats = c.compact_catalog(cat, "t", where="id < 30")
    assert stats.input_files_count == 3
    paths = [t.data_file_path for t in m2.data_files]
    # the three out-of-scope originals survive untouched
    kept = [p for p in paths if os.path.basename(p).startswith("f")]
    assert sorted(os.path.basename(p) for p in kept) == [
        "f3.parquet",
        "f4.parquet",
        "f5.parquet",
    ]
    assert len(paths) == 4  # 3 kept + 1 rewritten
    from iceberg_compaction_spark.sources.ingest import read_table_mor

    assert read_table_mor(spark, m2).count() == 60

    # ColumnPredicate objects work identically; no-match scope = no-op
    m3, stats3 = c.compact_catalog(
        cat, "t", where=[ColumnPredicate(col="id", op="gt", value=10_000)]
    )
    assert stats3.input_files_count == 0
    assert m3.snapshot_id == m2.snapshot_id  # nothing committed

    # parser surface
    preds = parse_where("id <= 5 AND id IS NOT NULL")
    assert [(p.op) for p in preds] == ["le", "not_null"]
    with pytest.raises(ValueError, match="unsupported"):
        parse_where("id < 5 OR id > 7")
