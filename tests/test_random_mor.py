"""Randomized MOR workloads (reference: integration-tests generator.rs
520-600 interleaves inserts with position/equality deletes at random).

A seeded generator builds a multi-file table plus random position- and
equality-delete files; expected survivors are computed independently in
pure Python; the engine's full compaction must produce exactly them.
"""

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.compaction import Compaction
from iceberg_compaction_spark.config import CompactionConfig
from iceberg_compaction_spark.plans.datamodel import (
    EQUALITY_DELETE,
    POSITION_DELETE,
    DeleteFile,
    FileScanTask,
)
from iceberg_compaction_spark.sources.manifest import Manifest

N_FILES = 4
ROWS_PER_FILE = 200


def build_workload(root: str, seed: int):
    rng = random.Random(seed)
    # data files: (id, val); ids unique across the table, seq per file
    files = []  # (path, rows: list[(id, val)], seq)
    next_id = 0
    for f in range(N_FILES):
        rows = []
        for _ in range(ROWS_PER_FILE):
            rows.append((next_id, rng.randrange(1000)))
            next_id += 1
        seq = rng.choice([1, 3, 5])
        path = os.path.join(root, f"data{f}.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "val": pa.array([r[1] for r in rows], type=pa.int64()),
                }
            ),
            path,
        )
        files.append((path, rows, seq))

    # position deletes: random (file, pos) pairs, some duplicated
    pos_pairs = set()
    for _ in range(rng.randrange(50, 150)):
        f = rng.randrange(N_FILES)
        pos_pairs.add((files[f][0], rng.randrange(ROWS_PER_FILE)))
    pos_path = os.path.join(root, "pos_del.parquet")
    pairs = sorted(pos_pairs) * 2  # duplicates must be harmless
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [p for p, _ in pairs],
                "sys_hidden_pos": pa.array([i for _, i in pairs], type=pa.int64()),
            }
        ),
        pos_path,
    )

    # equality deletes on id, each with its own sequence number
    eq_rows = []  # (id, del_seq)
    for _ in range(rng.randrange(100, 300)):
        eq_rows.append((rng.randrange(next_id), rng.choice([2, 4, 6])))
    eq_path = os.path.join(root, "eq_del.parquet")
    pq.write_table(
        pa.table(
            {
                "id": pa.array([i for i, _ in eq_rows], type=pa.int64()),
                "sys_hidden_seq_num": pa.array(
                    [s for _, s in eq_rows], type=pa.int64()
                ),
            }
        ),
        eq_path,
    )

    # expected survivors, computed independently
    max_del_seq = {}
    for i, s in eq_rows:
        max_del_seq[i] = max(max_del_seq.get(i, 0), s)
    survivors = set()
    for path, rows, seq in files:
        for pos, (rid, _val) in enumerate(rows):
            if (path, pos) in pos_pairs:
                continue
            if rid in max_del_seq and seq < max_del_seq[rid]:
                continue
            survivors.add(rid)

    # manifest with attached delete files
    pos_f = DeleteFile(
        path=pos_path,
        content=POSITION_DELETE,
        file_size_in_bytes=os.path.getsize(pos_path),
    )
    eq_f = DeleteFile(
        path=eq_path,
        content=EQUALITY_DELETE,
        file_size_in_bytes=os.path.getsize(eq_path),
        equality_ids=("id",),
    )
    m = Manifest(table_root=root, snapshot_id=1, sequence_number=6)
    for path, rows, seq in files:
        m.data_files.append(
            FileScanTask(
                data_file_path=path,
                length=os.path.getsize(path),
                record_count=len(rows),
                sequence_number=seq,
                deletes=[pos_f, eq_f],
            )
        )
    m.save()
    return m, survivors


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_workload_full_compaction(spark, tmp_path, seed):
    root = str(tmp_path / f"tbl{seed}")
    os.makedirs(root)
    m, survivors = build_workload(root, seed)

    cfg = CompactionConfig.full()
    cfg.enable_validate_compaction = True  # A1 self-check on the same run
    c = Compaction(spark=spark, config=cfg)
    m2, stats = c.compact(m)

    assert stats.input_files_count > N_FILES  # data + delete files
    got = {
        r["id"]
        for r in spark.read.parquet(
            *[t.data_file_path for t in m2.data_files]
        ).collect()
    }
    assert got == survivors
    assert sum(t.record_count for t in m2.data_files) == len(survivors)
