"""convert_equality_deletes (compaction.py): equality -> position
delete conversion with identical MOR semantics."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import convert_equality_deletes
from iceberg_compaction_spark.operators.mor import rewrite_file_group
from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    DeleteFile,
    FileGroup,
)
from iceberg_compaction_spark.sources.manifest import Manifest


def _table(tmp_path, n_files=2, rows_per=50):
    root = str(tmp_path / "tbl")
    os.makedirs(root + "/deletes")
    for f in range(n_files):
        ids = list(range(f * rows_per, (f + 1) * rows_per))
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(ids, type=pa.int64()),
                    "val": [f"v{i}" for i in ids],
                }
            ),
            f"{root}/data{f}.parquet",
        )
    return root, Manifest.from_parquet_dir(root, sequence_number=1)


def _eq_delete(root, name, ids, seq=2, baked_seq=None):
    path = f"{root}/deletes/{name}.parquet"
    cols = {"id": pa.array(ids, type=pa.int64())}
    if baked_seq is not None:
        cols["sys_hidden_seq_num"] = pa.array(
            [baked_seq] * len(ids), type=pa.int64()
        )
    pq.write_table(pa.table(cols), path)
    return DeleteFile(
        path=path,
        content=EQUALITY_DELETE,
        file_size_in_bytes=os.path.getsize(path),
        record_count=len(ids),
        sequence_number=seq,
        equality_ids=("id",),
    )


def _survivors(spark, m):
    g = FileGroup.from_tasks(m.data_files)
    g.format_version = m.format_version
    return sorted(r["id"] for r in rewrite_file_group(spark, g).collect())


def test_convert_preserves_survivors_and_drops_eq_files(spark, tmp_path):
    root, m = _table(tmp_path)
    d = _eq_delete(root, "eq", [3, 7, 60], seq=2)
    for t in m.data_files:
        t.deletes = [d]

    before = _survivors(spark, m)
    assert 3 not in before and 60 not in before

    new, stats = convert_equality_deletes(spark, m)
    assert stats.input_equality_files == 1
    assert stats.output_position_files == 1
    assert stats.positions_written == 3

    kinds = {
        d.content for t in new.data_files for d in t.deletes
    }
    assert kinds == {POSITION_DELETE}
    assert _survivors(spark, new) == before


def test_convert_respects_sequence_rule(spark, tmp_path):
    """A delete at the same sequence as a data file must NOT convert
    against it (strictly-lower rule) — the newer data file's row with a
    deleted key stays live before AND after conversion."""
    root, m = _table(tmp_path)
    # file 0 is old (seq 1); file 1 is new (seq 3, after the delete)
    m.data_files[0].sequence_number = 1
    m.data_files[1].sequence_number = 3
    d = _eq_delete(root, "eq", [3, 60], seq=2)
    for t in m.data_files:
        t.deletes = [d]

    before = _survivors(spark, m)
    assert 3 not in before  # seq 1 < 2: deleted
    assert 60 in before  # seq 3 >= 2: survives

    new, stats = convert_equality_deletes(spark, m)
    assert stats.positions_written == 1  # only id=3 converted
    assert _survivors(spark, new) == before


def test_convert_noop_without_eq_deletes(spark, tmp_path):
    root, m = _table(tmp_path)
    new, stats = convert_equality_deletes(spark, m)
    assert stats.input_equality_files == 0
    assert [t.deletes for t in new.data_files] == [[], []]


def test_convert_then_reads_skip_the_join(spark, tmp_path):
    """After conversion the MOR plan has no equality anti-join left —
    the whole point: every subsequent read is a scan-side mask."""
    root, m = _table(tmp_path)
    d = _eq_delete(root, "eq", [5], seq=2)
    for t in m.data_files:
        t.deletes = [d]
    new, _ = convert_equality_deletes(spark, m)
    g = FileGroup.from_tasks(new.data_files)
    g.format_version = new.format_version
    plan = (
        rewrite_file_group(spark, g)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = [
        ln for ln in plan.splitlines() if "Join LeftAnti" in ln
    ]
    # one anti-join for the position mask path at most (v2), none on keys
    assert not [ln for ln in joins if "__eqd" in ln]


def test_convert_after_upsert_roundtrip(spark, tmp_path):
    """End-to-end with the real CDC writer: upsert bakes per-row
    sequence numbers into its delete file; conversion must honor them
    and leave read_table_mor output unchanged."""
    from iceberg_compaction_spark.sources.catalog import FileCatalog
    from iceberg_compaction_spark.sources.ingest import read_table_mor, upsert

    root, m = _table(tmp_path)
    cat = FileCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", m)
    delta = spark.createDataFrame([(3, "new3"), (200, "v200")], ["id", "val"])
    m2 = upsert(spark, cat, "t", delta, keys=["id"])

    before = {
        r["id"]: r["val"] for r in read_table_mor(spark, m2).collect()
    }
    assert before[3] == "new3"

    new, stats = convert_equality_deletes(spark, m2)
    assert stats.input_equality_files == 1
    after = {r["id"]: r["val"] for r in read_table_mor(spark, new).collect()}
    assert after == before


def test_convert_groups_same_key_files_with_distinct_sequences(spark, tmp_path):
    """Many delete files with the same key set convert in ONE grouped
    join, but each file's own sequence still gates which data files it
    converts against."""
    root, m = _table(tmp_path)
    m.data_files[0].sequence_number = 1
    m.data_files[1].sequence_number = 3  # newer than delete "old"
    d_old = _eq_delete(root, "old", [3, 60], seq=2)  # hits file0 only
    d_new = _eq_delete(root, "new", [61], seq=4)  # hits both files
    for t in m.data_files:
        t.deletes = [d_old, d_new]

    before = _survivors(spark, m)
    assert 3 not in before and 60 in before and 61 not in before

    new, stats = convert_equality_deletes(spark, m)
    # converted: (file0, id 3) from d_old; (file1, id 61) from d_new
    assert stats.positions_written == 2
    assert _survivors(spark, new) == before


def test_convert_invariance_randomized(spark, tmp_path):
    """Randomized layouts: any mix of delete key sets, sequences and
    attachment patterns must convert with identical survivors."""
    import random

    rnd = random.Random(20260814)
    root, m = _table(tmp_path, n_files=3, rows_per=30)
    for i, t in enumerate(m.data_files):
        t.sequence_number = rnd.choice([1, 2, 3])
    dels = []
    for i in range(4):
        ids = rnd.sample(range(0, 90), rnd.randint(1, 6))
        dels.append(
            _eq_delete(root, f"r{i}", ids, seq=rnd.choice([2, 3, 4]))
        )
    for t in m.data_files:
        t.deletes = rnd.sample(dels, rnd.randint(0, len(dels)))

    before = _survivors(spark, m)
    new, _ = convert_equality_deletes(spark, m)
    assert _survivors(spark, new) == before
    kinds = {d.content for t in new.data_files for d in t.deletes}
    assert EQUALITY_DELETE not in kinds


# --- round 7: v3 tables emit deletion vectors --------------------------------


def test_v3_convert_emits_puffin_dv(spark, tmp_path):
    """On a format-v3 table, convert_equality_deletes writes the
    converted positions as a puffin DELETION VECTOR (not v2-style
    parquet), survivors invariant, and the scan applies it reader-side
    (VERDICT r6 #2)."""
    from iceberg_compaction_spark.sources.puffin import (
        is_puffin_file,
        read_puffin_dvs,
    )

    root, m = _table(tmp_path)
    m.format_version = 3
    d = _eq_delete(root, "e", [3, 7, 60], seq=2)
    for t in m.data_files:
        t.deletes.append(d)
    before = _survivors(spark, m)
    assert 3 not in before and 60 not in before

    new, stats = convert_equality_deletes(spark, m)
    assert stats.output_position_files == 1
    assert stats.positions_written == 3
    out = [
        x
        for t in new.data_files
        for x in t.deletes
        if x.content == POSITION_DELETE
    ]
    assert out and all(is_puffin_file(x.path) for x in out)
    assert not any(
        x.content == EQUALITY_DELETE for t in new.data_files for x in t.deletes
    )
    dvs = read_puffin_dvs(out[0].path)
    assert sum(len(v) for v in dvs.values()) == 3
    assert _survivors(spark, new) == before
