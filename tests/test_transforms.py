"""Iceberg partition transforms: spec golden vectors, column/driver
parity, and the transform-aware fan-out writer (the reference's
bucket(5) integration shape, integration_tests.rs:344-351)."""

import datetime
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.functions.transforms import (
    PartitionField,
    murmur3_32,
    murmur3_32_long_vec,
    transform_column,
    transform_value,
    with_partition_columns,
)

EPOCH = datetime.date(1970, 1, 1)


def test_murmur3_iceberg_spec_golden_vectors():
    """Appendix B of the Iceberg spec publishes bucket hash values."""
    assert murmur3_32((34).to_bytes(8, "little", signed=True)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    d = (datetime.date(2017, 11, 16) - EPOCH).days
    assert murmur3_32(d.to_bytes(8, "little", signed=True)) == -653330422
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8, tzinfo=datetime.timezone.utc)
    us = int(ts.timestamp() * 1_000_000)
    assert murmur3_32(us.to_bytes(8, "little", signed=True)) == -2047944441
    assert murmur3_32(bytes([0, 1, 2, 3])) == -188683207


def test_vectorized_murmur3_matches_scalar():
    rng = np.random.default_rng(7)
    vals = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
    vec = murmur3_32_long_vec(vals)
    for v, h in zip(vals[:50], vec[:50]):
        assert murmur3_32(int(v).to_bytes(8, "little", signed=True)) == h
    # and the full batch agrees on a checksum
    assert int(vec.astype(np.int64).sum()) == sum(
        murmur3_32(int(v).to_bytes(8, "little", signed=True)) for v in vals
    )


def test_transform_value_driver_side():
    assert transform_value("bucket[16]", 34) == (2017239379 & 0x7FFFFFFF) % 16
    assert transform_value("bucket[16]", "iceberg") == (1210000089 & 0x7FFFFFFF) % 16
    assert transform_value("truncate[10]", 17) == 10
    assert transform_value("truncate[10]", -3) == -10  # floors, not toward 0
    assert transform_value("truncate[3]", "iceberg") == "ice"
    d = datetime.date(2017, 11, 16)
    assert transform_value("day", d) == 17486
    assert transform_value("year", d) == 47
    assert transform_value("month", d) == 47 * 12 + 10
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    assert transform_value("hour", ts) == 419686
    assert transform_value("bucket[4]", None) is None


def test_column_matches_driver_side(spark):
    rows = [
        (1, 34, "iceberg", datetime.date(2017, 11, 16)),
        (2, -7, "spark", datetime.date(1969, 12, 31)),
        (3, 0, "", datetime.date(2024, 2, 29)),
        (4, None, None, None),
        (5, 2**40 + 3, "partition", datetime.date(1970, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id long, v long, s string, d date")
    out, names = with_partition_columns(
        df,
        [
            PartitionField("v", "bucket[8]"),
            PartitionField("s", "bucket[8]"),
            PartitionField("s", "truncate[3]", name="s_tr"),
            PartitionField("v", "truncate[10]", name="v_tr"),
            PartitionField("d", "day"),
            PartitionField("d", "month"),
            PartitionField("d", "year"),
        ],
    )
    assert names == ["v_bucket", "s_bucket", "s_tr", "v_tr", "d_day", "d_month", "d_year"]
    for r in out.collect():
        for col, tr, src in [
            ("v_bucket", "bucket[8]", "v"),
            ("s_bucket", "bucket[8]", "s"),
            ("s_tr", "truncate[3]", "s"),
            ("v_tr", "truncate[10]", "v"),
            ("d_day", "day", "d"),
            ("d_month", "month", "d"),
            ("d_year", "year", "d"),
        ]:
            assert r[col] == transform_value(tr, r[src]), (r["id"], col)


def test_timestamp_bucket_and_hour_column(spark):
    ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
    df = spark.createDataFrame([(ts,)], "t timestamp")
    out, _ = with_partition_columns(
        df, [PartitionField("t", "bucket[16]"), PartitionField("t", "hour")]
    )
    r = out.collect()[0]
    assert r["t_bucket"] == (-2047944441 & 0x7FFFFFFF) % 16
    assert r["t_hour"] == 419686


def test_bucket5_fanout_writer_30_inputs_5_outputs(spark, tmp_path):
    """The reference's bucket(5) integration shape: a fragmented table
    compacted through the transform-aware fan-out writer lands exactly
    one file per bucket, with every row in its Iceberg-bucket."""
    from iceberg_compaction_spark.config import WriterConfig
    from iceberg_compaction_spark.sources.writer import write_sized_parquet

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    out = str(tmp_path / "fanout")
    tasks = write_sized_parquet(
        li.repartition(30),  # fragmented input
        out,
        WriterConfig(),
        output_parallelism=1,
        partition_spec=[PartitionField("l_suppkey", "bucket[5]")],
    )
    # exactly the 5 bucket dirs (fan-out runs on __part_-prefixed
    # DERIVED copies so identity source columns survive in data files)
    dirs = sorted(
        d
        for d in os.listdir(out)
        if d.startswith("__part_l_suppkey_bucket=")
    )
    assert len(dirs) == 5, dirs
    assert len(tasks) == 5
    assert {t.partition for t in tasks} == {(str(b),) for b in range(5)}
    # spot-check routing: every row of bucket 3's file hashes to bucket 3
    f3 = [t for t in tasks if t.partition == ("3",)][0]
    for r in spark.read.parquet(f3.data_file_path).select("l_suppkey").collect():
        assert transform_value("bucket[5]", r["l_suppkey"]) == 3
    # no rows lost, derived column not in the data files
    total = sum(t.record_count for t in tasks)
    assert total == li.count()
    assert "l_suppkey_bucket" not in spark.read.parquet(f3.data_file_path).columns


def test_transform_array_matches_transform_value():
    """The Arrow-vectorized write-path twin is bit-identical to the
    scalar planner twin on every transform kind, nulls included."""
    import datetime

    import pyarrow as pa

    from iceberg_compaction_spark.functions.transforms import (
        transform_array,
        transform_value,
    )

    cases = [
        ("identity", pa.array([1, None, -3], type=pa.int64())),
        ("truncate[10]", pa.array([-7, 13, None, 25], type=pa.int64())),
        ("truncate[3]", pa.array(["hello", None, "ab"])),
        ("bucket[16]", pa.array([1, 2, None, 99, -5], type=pa.int64())),
        ("bucket[8]", pa.array(["a", "bc", None])),
        ("year", pa.array([datetime.date(2024, 3, 1), None])),
        ("month", pa.array([datetime.date(1969, 12, 31), None])),
        ("day", pa.array([datetime.date(2024, 3, 1), None])),
        (
            "hour",
            pa.array(
                [datetime.datetime(2024, 3, 1, 7, 30), None],
                type=pa.timestamp("us"),
            ),
        ),
        (
            # pre-epoch: hour must floor to -1, not truncate to 0, or
            # the write path records a different partition cell than the
            # planner's pruning computes (silent missing rows)
            "hour",
            pa.array(
                [
                    datetime.datetime(1969, 12, 31, 23, 30),
                    datetime.datetime(1969, 12, 31, 0, 0),
                    datetime.datetime(1970, 1, 1, 0, 0),
                    None,
                ],
                type=pa.timestamp("us"),
            ),
        ),
    ]
    for tr, arr in cases:
        got = transform_array(tr, arr).to_pylist()
        want = [
            None if v is None else transform_value(tr, v)
            for v in arr.to_pylist()
        ]
        assert got == want, (tr, got, want)


def test_transform_array_random_parity():
    """Property: vectorized == scalar on random values for every
    transform (the write path and the planner must never disagree on a
    partition cell)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_compaction_spark.functions.transforms import (
        transform_array,
        transform_value,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.integers(-(2**62), 2**62)),
            min_size=1,
            max_size=30,
        ),
        st.sampled_from(
            ["identity", "bucket[16]", "bucket[7]", "truncate[10]",
             "truncate[3]"]
        ),
    )
    def check_ints(vals, tr):
        arr = pa.array(vals, type=pa.int64())
        got = transform_array(tr, arr).to_pylist()
        want = [
            None if v is None else transform_value(tr, v) for v in vals
        ]
        assert got == want

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.one_of(st.none(), st.text(max_size=12)),
            min_size=1,
            max_size=20,
        ),
        st.sampled_from(["bucket[8]", "truncate[4]"]),
    )
    def check_strs(vals, tr):
        arr = pa.array(vals, type=pa.string())
        got = transform_array(tr, arr).to_pylist()
        want = [
            None if v is None else transform_value(tr, v) for v in vals
        ]
        assert got == want

    check_ints()
    check_strs()
