"""S3 split_n_vecs (balanced deterministic input splits) and T2
overwrite_files — pure-Python, no Spark session needed."""

import random

import pytest

from iceberg_compaction_spark.commit import CommitConflict, CommitManager
from iceberg_compaction_spark.plans.datamodel import FileScanTask
from iceberg_compaction_spark.sources.manifest import Manifest
from iceberg_compaction_spark.sources.scan import split_n_vecs


def task(i: int, length: int) -> FileScanTask:
    return FileScanTask(data_file_path=f"/t/f{i}.parquet", length=length)


def test_split_balances_by_length():
    tasks = [task(i, ln) for i, ln in enumerate([800, 100, 100, 100, 100])]
    groups = split_n_vecs(tasks, 2)
    totals = sorted(sum(t.length for t in g) for g in groups)
    # greedy min-heap in arrival order: the 800 takes one group, the
    # four 100s stack on the other (no FFD pre-sort — matches reference)
    assert totals == [400, 800]
    assert sum(len(g) for g in groups) == len(tasks)


def test_split_more_groups_than_tasks():
    tasks = [task(0, 10)]
    groups = split_n_vecs(tasks, 4)
    assert len(groups) == 4
    assert sorted(len(g) for g in groups) == [0, 0, 0, 1]


def test_split_invalid_n():
    with pytest.raises(ValueError):
        split_n_vecs([], 0)


def test_split_deterministic_under_repetition():
    """The reference stress-tests 10k iterations for byte-stable output
    (iceberg_file_task_scan.rs:704-797); same contract here."""
    rng = random.Random(7)
    tasks = [task(i, rng.randrange(1, 1_000_000)) for i in range(200)]
    first = split_n_vecs(list(tasks), 8)
    sig = [[t.data_file_path for t in g] for g in first]
    for _ in range(1000):
        again = split_n_vecs(list(tasks), 8)
        assert [[t.data_file_path for t in g] for g in again] == sig


def test_split_even_lengths_spread_round_robin():
    tasks = [task(i, 50) for i in range(8)]
    groups = split_n_vecs(tasks, 4)
    assert all(len(g) == 2 for g in groups)


# --- T2 overwrite_files ----------------------------------------------------


def manifest_with(paths_sizes: dict[str, int]) -> Manifest:
    return Manifest(
        table_root="/t",
        snapshot_id=5,
        sequence_number=3,
        data_files=[
            FileScanTask(data_file_path=p, length=s, sequence_number=2)
            for p, s in paths_sizes.items()
        ],
    )


def test_overwrite_swaps_and_bumps_snapshot():
    m = manifest_with({"/t/a.parquet": 10, "/t/b.parquet": 20})
    new_file = FileScanTask(data_file_path="/t/new.parquet", length=30)
    m2 = CommitManager().overwrite_files(
        m,
        added_files=[new_file],
        rewritten_files=[m.data_files[0]],
        pin_sequence_number=2,
    )
    assert m2.snapshot_id == 6
    paths = {t.data_file_path for t in m2.data_files}
    assert paths == {"/t/b.parquet", "/t/new.parquet"}
    assert m2.by_path()["/t/new.parquet"].sequence_number == 2


def test_overwrite_checks_file_existence():
    m = manifest_with({"/t/a.parquet": 10})
    ghost = FileScanTask(data_file_path="/t/ghost.parquet", length=1)
    with pytest.raises(CommitConflict):
        CommitManager().overwrite_files(m, added_files=[], rewritten_files=[ghost])


def test_rewrite_commit_rejects_schema_evolution():
    from iceberg_compaction_spark.commit import RewriteResult, SchemaMismatchError
    from iceberg_compaction_spark.plans.datamodel import CompactionPlan, FileGroup

    m = manifest_with({"/t/a.parquet": 10})
    plan = CompactionPlan(
        file_group=FileGroup.from_tasks(list(m.data_files)),
        snapshot_id=m.snapshot_id,
        schema_id=m.schema_id,
    )
    m.schema_id += 1  # concurrent schema evolution
    res = RewriteResult(
        plan=plan,
        added_files=[FileScanTask(data_file_path="/t/n.parquet", length=9)],
    )
    with pytest.raises(SchemaMismatchError):
        CommitManager().rewrite_files(m, [res])


def test_rewrite_commit_adopts_additive_schema_evolution():
    """Add-column evolution between plan and commit: every planned
    column still exists, so the commit ADOPTS the new schema id (the
    rewritten old-schema files stay valid; Iceberg's add-column never
    rewrites data).  Drop-column stays a SchemaMismatchError."""
    from iceberg_compaction_spark.commit import RewriteResult, SchemaMismatchError
    from iceberg_compaction_spark.plans.datamodel import CompactionPlan, FileGroup

    m = manifest_with({"/t/a.parquet": 10})
    m.properties["schema.columns"] = ["id", "name"]
    plan = CompactionPlan(
        file_group=FileGroup.from_tasks(list(m.data_files)),
        snapshot_id=m.snapshot_id,
        schema_id=m.schema_id,
        schema_columns=("id", "name"),
    )
    res = RewriteResult(
        plan=plan,
        added_files=[FileScanTask(data_file_path="/t/n.parquet", length=9)],
    )

    # additive: a column was ADDED concurrently
    m.schema_id += 1
    m.properties["schema.columns"] = ["id", "name", "added_col"]
    new = CommitManager().rewrite_files(m, [res])
    assert new.schema_id == m.schema_id  # adopted, not rejected
    assert {t.data_file_path for t in new.data_files} == {"/t/n.parquet"}

    # destructive: a planned column is GONE -> still a conflict
    m.schema_id += 1
    m.properties["schema.columns"] = ["id", "added_col"]
    with pytest.raises(SchemaMismatchError):
        CommitManager().rewrite_files(m, [res])


def test_overwrite_preserves_properties_and_merges_new():
    m = manifest_with({"/t/a.parquet": 10})
    m.properties["owner"] = "pipeline"
    m2 = CommitManager().overwrite_files(
        m,
        added_files=[],
        rewritten_files=[],
        snapshot_properties={"compaction.trigger": "manual"},
    )
    assert m2.properties == {"owner": "pipeline", "compaction.trigger": "manual"}


def test_read_data_files_fails_loudly_on_unmapped_path(spark, tmp_path):
    """seq_by_path must cover every input file: a silent default-0 seq
    would make unmapped rows older than every equality delete (invisible
    over-deletion), so the lookup raises instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.sources.scan import read_data_files

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], type=pa.int64())}), p1)
    pq.write_table(pa.table({"id": pa.array([3, 4], type=pa.int64())}), p2)

    # two distinct seqs so the single-seq literal shortcut doesn't apply;
    # p2 deliberately missing from the map
    df = read_data_files(
        spark, [p1, p2], need_seq_num=True,
        seq_by_path={p1: 3, "/elsewhere.parquet": 5},
    )
    with pytest.raises(Exception, match="missing from seq_by_path"):
        df.collect()

    # fully-covered map still works
    ok = read_data_files(
        spark, [p1, p2], need_seq_num=True, seq_by_path={p1: 3, p2: 5}
    )
    seqs = {r["id"]: r["sys_hidden_seq_num"] for r in ok.collect()}
    assert seqs == {1: 3, 2: 3, 3: 5, 4: 5}


def test_snapshot_properties_reserved_keys_excluded():
    """Mirrors mod.rs:2620-2656: auto-computed summary keys and
    partitions.* rollups are NOT carried into the next snapshot; custom
    keys are; caller-supplied properties win."""
    from iceberg_compaction_spark.commit import (
        KNOWN_SNAPSHOT_SUMMARY_KEYS,
        custom_snapshot_properties,
    )

    props = {k: "100" for k in KNOWN_SNAPSHOT_SUMMARY_KEYS}
    props["partitions.date=2024-01-01"] = "added-data-files=1"
    props["pipeline-id"] = "pipe-42"
    props["bobsled.source-table"] = "events_raw"

    custom = custom_snapshot_properties(props)
    assert custom == {
        "pipeline-id": "pipe-42",
        "bobsled.source-table": "events_raw",
    }

    # through a commit: reserved keys dropped, custom preserved, caller wins
    m = manifest_with({"/t/a.parquet": 10})
    m.properties = dict(props)
    m2 = CommitManager().overwrite_files(
        m,
        added_files=[],
        rewritten_files=[],
        snapshot_properties={"pipeline-id": "pipe-43"},
    )
    assert m2.properties == {
        "pipeline-id": "pipe-43",
        "bobsled.source-table": "events_raw",
    }


def test_overwrite_pinned_reattaches_newer_equality_deletes():
    from iceberg_compaction_spark.plans.datamodel import (
        EQUALITY_DELETE,
        POSITION_DELETE,
        DeleteFile,
    )

    m = manifest_with({"/t/a.parquet": 10, "/t/b.parquet": 20})
    newer_eq = DeleteFile(
        path="/t/eq.parquet", content=EQUALITY_DELETE,
        file_size_in_bytes=1, sequence_number=3, equality_ids=("id",),
    )
    older_eq = DeleteFile(
        path="/t/eq-old.parquet", content=EQUALITY_DELETE,
        file_size_in_bytes=1, sequence_number=1, equality_ids=("id",),
    )
    pos = DeleteFile(
        path="/t/pos.parquet", content=POSITION_DELETE,
        file_size_in_bytes=1, sequence_number=3,
    )
    m.data_files[0].deletes = [newer_eq, older_eq, pos]
    new_file = FileScanTask(data_file_path="/t/new.parquet", length=30)
    m2 = CommitManager().overwrite_files(
        m,
        added_files=[new_file],
        rewritten_files=[m.data_files[0]],
        pin_sequence_number=2,
    )
    got = m2.by_path()["/t/new.parquet"].deletes
    # only the eq delete NEWER than the pin transfers; older eq deletes
    # were already applied by the rewrite, pos deletes address dead paths
    assert [d.path for d in got] == ["/t/eq.parquet"]


def test_path_normalization_sql_python_parity(spark):
    """The Spark-expression and Python path canonicalizations must agree
    byte-for-byte on every scheme shape — both sides of every path join
    depend on it (file:// vs plain POSIX, s3a/s3n vs s3, duplicate
    slashes in keys)."""
    from pyspark.sql import functions as F

    from iceberg_compaction_spark.sources.scan import (
        _normalize_path,
        normalize_path_str,
    )

    uris = [
        "file:///data/t/a.parquet",
        "file:/data/t/a.parquet",
        "/data/t/a.parquet",
        "s3a://bucket/wh/t/a.parquet",
        "s3://bucket/wh/t/a.parquet",
        "s3n://bucket/wh//t///a.parquet",
        "s3a://bucket//double//slash.parquet",
    ]
    df = spark.createDataFrame([(u,) for u in uris], ["p"])
    got = [
        r["n"] for r in df.select(_normalize_path(F.col("p")).alias("n")).collect()
    ]
    want = [normalize_path_str(u) for u in uris]
    assert got == want
    # scheme folding: all three s3 connectors canonicalize identically
    assert normalize_path_str("s3a://b/k.parquet") == normalize_path_str(
        "s3n://b/k.parquet"
    ) == "s3://b/k.parquet"
