"""rewrite_position_deletes (compaction.py): the delete-side compaction
action — consolidate small position-delete files, drop dangling refs,
preserve MOR semantics exactly."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import rewrite_position_deletes
from iceberg_compaction_spark.plans.datamodel import (
    POSITION_DELETE,
    DeleteFile,
    FileGroup,
)
from iceberg_compaction_spark.operators.mor import rewrite_file_group
from iceberg_compaction_spark.sources.manifest import Manifest


def _table(tmp_path, n_files=3, rows_per=100):
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
    m = Manifest.from_parquet_dir(root, sequence_number=1)
    return root, m


def _pos_delete(root, name, entries, seq=2):
    path = f"{root}/deletes/{name}.parquet"
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [p for p, _ in entries],
                "sys_hidden_pos": pa.array(
                    [i for _, i in entries], type=pa.int64()
                ),
            }
        ),
        path,
    )
    return DeleteFile(
        path=path,
        content=POSITION_DELETE,
        file_size_in_bytes=os.path.getsize(path),
        record_count=len(entries),
        sequence_number=seq,
    )


def _survivors(spark, m):
    g = FileGroup.from_tasks(m.data_files)
    g.format_version = m.format_version
    return sorted(
        r["id"] for r in rewrite_file_group(spark, g).collect()
    )


def test_consolidates_dedupes_and_drops_dangling(spark, tmp_path):
    root, m = _table(tmp_path)
    d0 = m.data_files[0].data_file_path
    d1 = m.data_files[1].data_file_path
    # three small delete files, overlapping positions, plus a dangling
    # reference to a file that is not in the snapshot
    f1 = _pos_delete(root, "a", [(d0, 0), (d0, 1)])
    f2 = _pos_delete(root, "b", [(d0, 1), (d1, 5)], seq=3)
    f3 = _pos_delete(
        root, "c", [(f"{root}/ghost.parquet", 7), (d1, 6)], seq=4
    )
    m.data_files[0].deletes = [f1, f2]
    m.data_files[1].deletes = [f2, f3]

    before = _survivors(spark, m)
    new, stats = rewrite_position_deletes(spark, m)

    assert stats.input_delete_files == 3
    assert stats.output_delete_files == 1
    assert stats.positions_kept == 4  # (d0,0)(d0,1)(d1,5)(d1,6)
    assert stats.dangling_positions_dropped == 1

    # attachments: the merged file attaches exactly to referenced files
    att = {
        t.data_file_path: [
            d for d in t.deletes if d.content == POSITION_DELETE
        ]
        for t in new.data_files
    }
    assert len(att[d0]) == 1 and len(att[d1]) == 1
    assert att[d0][0].path == att[d1][0].path
    assert not att[new.data_files[2].data_file_path]
    assert att[d0][0].sequence_number == 4  # max of inputs

    # MOR survivors identical
    assert _survivors(spark, new) == before
    # merged file is sorted by (path, pos) for run-friendly application
    t = pq.read_table(att[d0][0].path)
    pairs = list(
        zip(
            t.column("sys_hidden_file_path").to_pylist(),
            t.column("sys_hidden_pos").to_pylist(),
        )
    )
    assert pairs == sorted(pairs)


def test_noop_when_nothing_to_merge(spark, tmp_path):
    root, m = _table(tmp_path)
    d0 = m.data_files[0].data_file_path
    f1 = _pos_delete(root, "only", [(d0, 0)])
    m.data_files[0].deletes = [f1]
    new, stats = rewrite_position_deletes(spark, m)
    assert stats.input_delete_files == 1
    assert stats.output_delete_files == 0
    assert [d.path for d in new.data_files[0].deletes] == [f1.path]


def test_rerun_is_fixed_point(spark, tmp_path):
    root, m = _table(tmp_path)
    d0 = m.data_files[0].data_file_path
    d1 = m.data_files[1].data_file_path
    m.data_files[0].deletes = [_pos_delete(root, "a", [(d0, 3)])]
    m.data_files[1].deletes = [_pos_delete(root, "b", [(d1, 4)])]
    new, stats = rewrite_position_deletes(spark, m)
    assert stats.output_delete_files == 1
    again, stats2 = rewrite_position_deletes(spark, new)
    assert stats2.input_delete_files == 1  # already consolidated: no-op
    assert stats2.output_delete_files == 0


# --- round 7: v3 tables emit deletion vectors --------------------------------


def test_v3_consolidates_into_puffin_dv(spark, tmp_path):
    """On a format-v3 table the action's OUTPUT is a puffin deletion-
    vector file (one Roaring blob per data file), with parquet position
    deletes AND pre-existing per-commit DVs merged in; MOR survivors
    are invariant (VERDICT r6 #2)."""
    from iceberg_compaction_spark.sources.puffin import (
        is_puffin_file,
        read_puffin_dvs,
        write_puffin_dvs,
    )

    root, m = _table(tmp_path)
    m.format_version = 3
    d0 = m.data_files[0].data_file_path
    d1 = m.data_files[1].data_file_path
    # a parquet position-delete trail + an existing DV from a prior commit
    f1 = _pos_delete(root, "a", [(d0, 0), (d0, 1)])
    f2 = _pos_delete(root, "b", [(d0, 1), (d1, 5)], seq=3)
    dv_prior = f"{root}/deletes/prior.puffin"
    write_puffin_dvs(dv_prior, {d1: [6, 7]})
    fdv = DeleteFile(
        path=dv_prior,
        content=POSITION_DELETE,
        file_size_in_bytes=os.path.getsize(dv_prior),
        record_count=2,
        sequence_number=4,
    )
    m.data_files[0].deletes = [f1, f2]
    m.data_files[1].deletes = [f2, fdv]

    before = _survivors(spark, m)
    new, stats = rewrite_position_deletes(spark, m)

    assert stats.input_delete_files == 3
    assert stats.output_delete_files == 1
    assert stats.positions_kept == 5  # (d0,0)(d0,1)(d1,5)(d1,6)(d1,7)

    att = {
        t.data_file_path: [
            d for d in t.deletes if d.content == POSITION_DELETE
        ]
        for t in new.data_files
    }
    out_path = att[d0][0].path
    assert is_puffin_file(out_path)
    assert att[d1][0].path == out_path
    dvs = read_puffin_dvs(out_path)
    assert sorted(dvs[d0]) == [0, 1]
    assert sorted(dvs[d1]) == [5, 6, 7]
    assert _survivors(spark, new) == before

    # fixed point: one DV file, nothing further to merge
    again, stats2 = rewrite_position_deletes(spark, new)
    assert stats2.output_delete_files == 0


def test_v3_single_parquet_trail_still_converts(spark, tmp_path):
    """Even ONE parquet position-delete file on a v3 table converts to
    the DV representation (the spec's reader-side form)."""
    from iceberg_compaction_spark.sources.puffin import is_puffin_file

    root, m = _table(tmp_path)
    m.format_version = 3
    d0 = m.data_files[0].data_file_path
    m.data_files[0].deletes = [_pos_delete(root, "only", [(d0, 2)])]
    new, stats = rewrite_position_deletes(spark, m)
    assert stats.output_delete_files == 1
    (d,) = new.data_files[0].deletes
    assert is_puffin_file(d.path)
    assert _survivors(spark, new) == _survivors(spark, m)
