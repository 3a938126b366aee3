"""Puffin deletion-vector files (Iceberg v3): Roaring codec round-trips,
container-format edge cases, and the MOR reader-side DV path consuming
puffin bitmaps on both the driver (small) and executor (large) routes."""

import dataclasses
import io
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.sources import puffin as pf


def test_roaring64_round_trip_shapes():
    cases = [
        [],
        [0],
        [5, 7, 9, 70000, 70001],  # two 16-bit containers
        list(range(10_000)),  # bitset container (card > 4096)
        [2**33 + 5, 2**33 + 6, 17],  # multiple 32-bit high keys
        list(range(0, 200_000, 3)),  # several containers, mixed kinds
    ]
    for positions in cases:
        got = pf.roaring64_deserialize(pf.roaring64_serialize(positions))
        assert got == sorted(set(positions)), positions[:5]


def test_roaring32_run_container_read():
    """Hand-crafted run-container serialization (cookie 12347): the
    reader must expand runs even though the writer never emits them."""
    # one container, key 0, one run [10, 13] (start 10, length 3)
    cookie = pf._SERIAL_COOKIE_RUN | ((1 - 1) << 16)
    buf = io.BytesIO()
    buf.write(struct.pack("<I", cookie))
    buf.write(bytes([0b1]))  # run flag for container 0
    buf.write(struct.pack("<HH", 0, 4 - 1))  # key 0, cardinality 4
    buf.write(struct.pack("<H", 1))  # 1 run
    buf.write(struct.pack("<HH", 10, 3))  # start 10, len 3 -> 10..13
    buf.seek(0)
    assert pf._read_roaring32(buf) == [10, 11, 12, 13]


def test_dv_blob_crc_and_round_trip():
    blob = pf.dv_blob_serialize([1, 2, 100])
    assert pf.dv_blob_deserialize(blob) == [1, 2, 100]
    corrupted = blob[:10] + bytes([blob[10] ^ 0xFF]) + blob[11:]
    with pytest.raises(ValueError):
        pf.dv_blob_deserialize(corrupted)


def test_puffin_file_round_trip(tmp_path):
    path = str(tmp_path / "dv.puffin")
    dvs = {
        "/data/a.parquet": [0, 5, 6],
        "/data/b.parquet": list(range(5000)),
    }
    pf.write_puffin_dvs(path, dvs, properties={"created-by": "test"})
    assert pf.is_puffin_file(path)
    footer = pf.read_puffin_footer(path)
    assert len(footer["blobs"]) == 2
    assert footer["blobs"][0]["properties"]["cardinality"] == "3"
    got = pf.read_puffin_dvs(path)
    assert got["/data/a.parquet"] == [0, 5, 6]
    assert got["/data/b.parquet"] == list(range(5000))


@pytest.fixture()
def v3_puffin_group(tmp_path):
    """A v3 file group whose position deletes are a REAL puffin DV file;
    a (path, pos) parquet twin exists for cross-checking."""
    from iceberg_compaction_spark.plans.datamodel import (
        POSITION_DELETE,
        DeleteFile,
        FileGroup,
        FileScanTask,
    )

    d1 = str(tmp_path / "d1.parquet")
    d2 = str(tmp_path / "d2.parquet")
    pq.write_table(
        pa.table({"id": pa.array(range(100), type=pa.int64())}), d1
    )
    pq.write_table(
        pa.table({"id": pa.array(range(100, 200), type=pa.int64())}), d2
    )
    deleted = {d1: [0, 7, 99], d2: [1, 50]}
    puf = str(tmp_path / "deletes.puffin")
    pf.write_puffin_dvs(puf, deleted)
    twin = str(tmp_path / "deletes.parquet")
    pq.write_table(
        pa.table(
            {
                "sys_hidden_file_path": [
                    p for p, ps in deleted.items() for _ in ps
                ],
                "sys_hidden_pos": pa.array(
                    [i for ps in deleted.values() for i in ps],
                    type=pa.int64(),
                ),
            }
        ),
        twin,
    )

    def group(delete_path):
        return FileGroup(
            data_files=[
                FileScanTask(
                    data_file_path=d1, length=500, record_count=100,
                    sequence_number=1,
                ),
                FileScanTask(
                    data_file_path=d2, length=500, record_count=100,
                    sequence_number=1,
                ),
            ],
            position_delete_files=[
                DeleteFile(
                    path=delete_path,
                    content=POSITION_DELETE,
                    file_size_in_bytes=100,
                )
            ],
            format_version=3,
        )

    expected = sorted(
        set(range(200)) - {0, 7, 99} - {101, 150}
    )
    return group(puf), group(twin), expected


def test_mor_v3_puffin_small_path(spark, v3_puffin_group):
    from iceberg_compaction_spark.operators.mor import rewrite_file_group

    puffin_g, parquet_g, expected = v3_puffin_group
    got_puffin = sorted(
        r["id"] for r in rewrite_file_group(spark, puffin_g).collect()
    )
    got_parquet = sorted(
        r["id"] for r in rewrite_file_group(spark, parquet_g).collect()
    )
    assert got_puffin == got_parquet == expected


def test_mor_v3_puffin_large_path_executor_decode(
    spark, v3_puffin_group, monkeypatch
):
    """Above the driver threshold the bitmaps decode on executors: the
    driver-side expansion (read_puffin_dvs) must never run, only the
    footer enumeration; survivors identical."""
    from iceberg_compaction_spark.operators.mor import rewrite_file_group
    from iceberg_compaction_spark.sources import scan as sc

    puffin_g, _parquet_g, expected = v3_puffin_group
    monkeypatch.setattr(sc, "DV_DRIVER_MAX_BYTES", 0)

    def boom(*a, **k):
        raise AssertionError(
            "driver-side puffin DV expansion above the size threshold"
        )

    monkeypatch.setattr(pf, "read_puffin_dvs", boom)
    df = rewrite_file_group(spark, puffin_g)
    assert sorted(r["id"] for r in df.collect()) == expected
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
