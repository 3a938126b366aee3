"""Theta-sketch NDV statistics (Iceberg compute_table_stats parity).

The interop tests are the point: the murmur hash, the update-hash
pipeline, and the EXACT-mode compact serialization are validated
BYTE-FOR-BYTE against the apache datasketches-java library the Spark
distribution bundles (plus guava's murmur3_128) — not against
hand-derived goldens.  The end-to-end tests then prove the
StatisticsFile lifecycle: distributed build, puffin write, metadata
registration on both catalog tiers, read-back, replace-on-reanalyze,
and orphan/expire safety.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from iceberg_compaction_spark.operators.stats import (
    THETA_BLOB_TYPE,
    compute_table_stats,
    read_table_ndv,
    theta_sketch_columns,
)
from iceberg_compaction_spark.sources.catalog import FileCatalog
from iceberg_compaction_spark.sources.ingest import read_table_mor
from iceberg_compaction_spark.sources.manifest import Manifest
from iceberg_compaction_spark.sources.puffin import (
    read_puffin_blobs,
    read_puffin_footer,
    write_puffin,
)
from iceberg_compaction_spark.sources.theta import (
    DEFAULT_UPDATE_SEED,
    THETA_MAX,
    ThetaSketch,
    compute_seed_hash,
    hash_ints_vec,
    hash_longs_vec,
    hash_update,
    murmur3_x64_128,
    single_value_bytes,
)


# ---------------------------------------------------------------------------
# murmur3 x64 128 — parity with the JVM implementations Spark ships
# ---------------------------------------------------------------------------


def test_murmur_parity_with_datasketches_java(spark):
    jvm = spark.sparkContext._gateway.jvm
    for n in [1, 2, 3, 7, 8, 9, 15, 16, 17, 31, 32, 33, 100, 1000]:
        data = bytes([(i * 37 + 11) % 256 for i in range(n)])
        for seed in (0, DEFAULT_UPDATE_SEED):
            java = [
                x & 0xFFFFFFFFFFFFFFFF
                for x in jvm.org.apache.datasketches.hash.MurmurHash3.hash(
                    bytearray(data), seed
                )
            ]
            assert list(murmur3_x64_128(data, seed)) == java, (n, seed)


def test_murmur_parity_with_guava(spark):
    jvm = spark.sparkContext._gateway.jvm
    for payload in [b"foo", b"hell", b"The quick brown fox", bytes(16)]:
        hc = jvm.com.google.common.hash.Hashing.murmur3_128(0).hashBytes(
            bytearray(payload)
        )
        assert struct.unpack("<QQ", bytes(hc.asBytes())) == murmur3_x64_128(
            payload, 0
        )


def test_seed_hash_matches_java(spark):
    jvm = spark.sparkContext._gateway.jvm
    java = (
        jvm.org.apache.datasketches.thetacommon.ThetaUtil.computeSeedHash(
            DEFAULT_UPDATE_SEED
        )
        & 0xFFFF
    )
    assert compute_seed_hash(DEFAULT_UPDATE_SEED) == java


def test_vectorized_hash_equals_scalar():
    longs = np.array(
        [0, 1, -1, 9001, 2**62, -(2**62), 123456789, 2**63 - 1],
        dtype=np.int64,
    )
    assert list(hash_longs_vec(longs)) == [
        hash_update(struct.pack("<q", int(v))) for v in longs
    ]
    ints = np.array([0, 1, -1, 2**31 - 1, -(2**31), 42], dtype=np.int32)
    assert list(hash_ints_vec(ints)) == [
        hash_update(struct.pack("<i", int(v))) for v in ints
    ]


def test_single_value_serialization_shapes():
    assert single_value_bytes(7, "int") == b"\x07\x00\x00\x00"
    assert single_value_bytes(7, "long") == b"\x07" + b"\x00" * 7
    assert single_value_bytes("héllo", "string") == "héllo".encode("utf-8")
    assert single_value_bytes(True, "boolean") == b"\x01"
    assert len(single_value_bytes(1.5, "double")) == 8
    assert len(single_value_bytes(1.5, "float")) == 4
    with pytest.raises(ValueError):
        single_value_bytes({}, "struct")


# ---------------------------------------------------------------------------
# compact sketch serialization — byte parity + cross-reads with Java
# ---------------------------------------------------------------------------


def _java_sketch_bytes(spark, values):
    jvm = spark.sparkContext._gateway.jvm
    sk = jvm.org.apache.datasketches.theta.UpdateSketch.builder().build()
    for v in values:
        sk.update(v)
    return bytes(sk.compact(True, None).toByteArray())


def _my_sketch(values, lg_k=12):
    hs = [hash_update(struct.pack("<q", v)) for v in values]
    return ThetaSketch(lg_k=lg_k).update_hashes(hs)


def test_exact_mode_bytes_identical_to_java(spark):
    values = list(range(100))
    assert _my_sketch(values).serialize() == _java_sketch_bytes(
        spark, values
    )


def test_empty_and_single_sketch_roundtrip():
    empty = ThetaSketch()
    assert empty.estimate() == 0.0
    rt = ThetaSketch.deserialize(empty.serialize())
    assert rt.estimate() == 0.0 and rt.is_exact()
    one = _my_sketch([42])
    rt1 = ThetaSketch.deserialize(one.serialize())
    assert rt1.estimate() == 1.0 and rt1.hashes == one.hashes


def test_string_updates_match_java_bytebuffer_path(spark):
    """Iceberg feeds the sketch single-value serialized bytes
    (update(ByteBuffer)); UTF-8 string updates must match that path."""
    jvm = spark.sparkContext._gateway.jvm
    words = ["alpha", "beta", "gamma", "héllo", ""]
    sk = jvm.org.apache.datasketches.theta.UpdateSketch.builder().build()
    for w in words:
        if w:  # empty byte arrays are no-ops in both implementations
            sk.update(
                jvm.java.nio.ByteBuffer.wrap(bytearray(w.encode("utf-8")))
            )
    mine = ThetaSketch().update_hashes(
        hash_update(single_value_bytes(w, "string")) for w in words if w
    )
    assert mine.serialize() == bytes(sk.compact(True, None).toByteArray())


def test_estimation_mode_cross_reads(spark):
    """Estimation-mode bytes legitimately differ (QuickSelect retains
    k..2k entries; we trim strictly to k) — but each side must read the
    other's sketch and agree on the estimate."""
    jvm = spark.sparkContext._gateway.jvm
    n = 100_000
    mine = ThetaSketch(lg_k=12).update_hashes(
        hash_longs_vec(np.arange(n, dtype=np.int64))
    )
    assert not mine.is_exact()
    assert abs(mine.estimate() - n) / n < 0.05
    mem = jvm.org.apache.datasketches.memory.Memory.wrap(mine.serialize())
    heap = jvm.org.apache.datasketches.theta.Sketches.heapifySketch(mem)
    assert heap.getEstimate() == pytest.approx(mine.estimate())
    java = ThetaSketch.deserialize(
        _java_sketch_bytes(spark, range(n))
    )
    assert abs(java.estimate() - n) / n < 0.05
    # union of the two sketches over the SAME underlying set stays ~n
    u = java.union(mine)
    assert abs(u.estimate() - n) / n < 0.05


def test_union_of_disjoint_partials():
    a = ThetaSketch(lg_k=10).update_hashes(
        hash_longs_vec(np.arange(0, 30_000, dtype=np.int64))
    )
    b = ThetaSketch(lg_k=10).update_hashes(
        hash_longs_vec(np.arange(30_000, 60_000, dtype=np.int64))
    )
    u = a.union(b)
    assert abs(u.estimate() - 60_000) / 60_000 < 0.10
    assert u.theta <= min(a.theta, b.theta)
    assert len(u.hashes) <= u.k


def test_deserialize_rejects_wrong_seed_hash():
    sk = _my_sketch([1, 2, 3])
    blob = bytearray(sk.serialize())
    blob[6] ^= 0xFF
    with pytest.raises(ValueError, match="seedHash"):
        ThetaSketch.deserialize(bytes(blob))


# ---------------------------------------------------------------------------
# distributed build
# ---------------------------------------------------------------------------


def test_theta_sketch_columns_exact_and_estimated(spark):
    n = 50_000
    df = spark.range(n).selectExpr(
        "id AS big",
        "CAST(id % 97 AS INT) AS small",
        "CONCAT('user-', CAST(id % 1000 AS STRING)) AS name",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 50 END AS with_nulls",
    )
    sketches = theta_sketch_columns(
        df, ["big", "small", "name", "with_nulls"], lg_k=12
    )
    # small-NDV columns land in EXACT mode: estimates are exact counts
    assert sketches["small"].is_exact()
    assert sketches["small"].estimate() == 97.0
    assert sketches["name"].estimate() == 1000.0
    # nulls excluded; id%50 with id%10==0 nulled removes the five
    # multiples of 10 from the value set: 50 - 5 = 45 distinct
    assert sketches["with_nulls"].estimate() == 45.0
    # the wide column estimates within theta error bounds
    assert abs(sketches["big"].estimate() - n) / n < 0.05


def test_theta_sketch_columns_matches_single_node_build(spark):
    """The distributed (map-side combine + top-k) build must produce
    the IDENTICAL sketch to a single-pass driver build — k smallest
    distinct hashes is order- and partitioning-independent."""
    n = 30_000
    df = spark.range(n).selectExpr("id AS v").repartition(7)
    dist = theta_sketch_columns(df, ["v"], lg_k=10)["v"]
    local = ThetaSketch(lg_k=10).update_hashes(
        hash_longs_vec(np.arange(n, dtype=np.int64))
    )
    assert dist.serialize() == local.serialize()


def test_theta_sketch_columns_rejects_unsupported(spark):
    df = spark.range(3).selectExpr("array(id) AS a")
    with pytest.raises(ValueError, match="unsupported"):
        theta_sketch_columns(df, ["a"])


# ---------------------------------------------------------------------------
# puffin StatisticsFile + catalog registration lifecycle
# ---------------------------------------------------------------------------


def _table(tmp_path, rows=2000):
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    ids = list(range(rows))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, type=pa.int64()),
                "grp": pa.array([i % 13 for i in ids], type=pa.int64()),
                "name": pa.array([f"n{i % 200}" for i in ids]),
            }
        ),
        os.path.join(root, "part0.parquet"),
    )
    cat = FileCatalog(warehouse=str(tmp_path / "warehouse"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    return cat


def test_compute_table_stats_end_to_end(spark, tmp_path):
    cat = _table(tmp_path)
    before = read_table_mor(spark, cat.load_table("t")).count()
    manifest, ndv = compute_table_stats(spark, cat, "t")
    assert ndv == {"id": 2000, "grp": 13, "name": 200}
    # registration landed on the new head and is row-preserving
    head = cat.load_table("t")
    assert head.operation == "replace"
    assert read_table_mor(spark, head).count() == before
    [entry] = head.statistics_files
    # spec readers select statistics by CURRENT snapshot-id, so the
    # entry is stamped with the registration commit's own snapshot
    # (ADVICE r12); the analyzed id stays in STATS_SNAPSHOT_PROP
    assert entry["snapshot-id"] == head.snapshot_id
    assert head.properties["stats.snapshot-id"] == str(
        manifest.snapshot_id - 1
    )
    path = entry["statistics-path"]
    assert os.path.exists(path)
    assert entry["file-size-in-bytes"] == os.path.getsize(path)
    # puffin content: one theta blob per column, spec footer shape
    footer = read_puffin_footer(path)
    assert {b["type"] for b in footer["blobs"]} == {THETA_BLOB_TYPE}
    assert len(footer["blobs"]) == 3
    blobs = read_puffin_blobs(path, THETA_BLOB_TYPE)
    for meta, data in blobs:
        sk = ThetaSketch.deserialize(data)
        assert float(meta["properties"]["ndv"]) == pytest.approx(
            sk.estimate(), abs=1
        )
    # read-back resolves estimates
    assert read_table_ndv(head) == {
        "id": 2000.0,
        "grp": 13.0,
        "name": 200.0,
    }


def test_stats_blobs_readable_by_datasketches_java(spark, tmp_path):
    """The registered file's blobs must heapify in the REAL library —
    a Trino/Spark-Iceberg reader could consume this StatisticsFile."""
    cat = _table(tmp_path)
    _, ndv = compute_table_stats(spark, cat, "t")
    [entry] = cat.load_table("t").statistics_files
    jvm = spark.sparkContext._gateway.jvm
    for meta, data in read_puffin_blobs(
        entry["statistics-path"], THETA_BLOB_TYPE
    ):
        mem = jvm.org.apache.datasketches.memory.Memory.wrap(data)
        heap = jvm.org.apache.datasketches.theta.Sketches.heapifySketch(mem)
        assert heap.getEstimate() == pytest.approx(
            float(meta["properties"]["ndv"]), abs=1
        )


def test_reanalyze_replaces_and_prunes_stale(spark, tmp_path):
    cat = _table(tmp_path)
    compute_table_stats(spark, cat, "t", columns=["id"])
    first = cat.load_table("t").statistics_files[0]
    compute_table_stats(spark, cat, "t", columns=["grp"])
    stats = cat.load_table("t").statistics_files
    # two registrations: one per analyzed snapshot, both retained
    assert len(stats) == 2
    assert first in stats
    # expire history down to the head, re-analyze: the stale
    # registrations (expired snapshots) are pruned
    cat.expire_snapshots("t", keep_last=1)
    compute_table_stats(spark, cat, "t", columns=["name"])
    stats = cat.load_table("t").statistics_files
    alive = set(cat.table_history("t"))
    assert all(s["snapshot-id"] in alive for s in stats)
    assert first not in stats


def test_orphan_sweep_keeps_registered_stats(spark, tmp_path):
    cat = _table(tmp_path)
    compute_table_stats(spark, cat, "t")
    [entry] = cat.load_table("t").statistics_files
    registered = entry["statistics-path"]
    # plant an UNREGISTERED stats file (crash leftover)
    stray = os.path.join(os.path.dirname(registered), "dead.stats.puffin")
    write_puffin(
        stray,
        [
            {
                "type": THETA_BLOB_TYPE,
                "fields": [1],
                "data": ThetaSketch().serialize(),
            }
        ],
    )
    removed = cat.remove_orphan_files("t", older_than_s=0)
    assert stray in removed
    assert os.path.exists(registered)
    assert not os.path.exists(stray)


def test_stats_on_hadoop_tier_roundtrip(spark, tmp_path):
    """Full-fidelity tier: the registration must serialize into
    metadata.json's spec `statistics` list and survive reload; the
    metadata orphan sweep must not touch the puffin."""
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    root = str(tmp_path / "data")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array(range(500), type=pa.int64())}),
        os.path.join(root, "f0.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "wh"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    _, ndv = compute_table_stats(spark, cat, "t")
    assert ndv == {"id": 500}
    head = cat.load_table("t")
    [entry] = head.statistics_files
    assert os.path.exists(entry["statistics-path"])
    # raw metadata.json carries the spec field
    import json

    _, md = cat.current_metadata("t")
    assert md["statistics"][0]["statistics-path"] == entry[
        "statistics-path"
    ]
    assert md["statistics"][0]["blob-metadata"][0]["type"] == (
        THETA_BLOB_TYPE
    )
    # sweeps: metadata sweep (avro-only) and data sweep (registered
    # stats referenced) both leave the file alone
    cat.remove_orphan_metadata("t", older_than_s=0)
    cat.remove_orphan_files("t", older_than_s=0)
    assert os.path.exists(entry["statistics-path"])
    assert read_table_ndv(cat.load_table("t"))["id"] == 500.0


# ---------------------------------------------------------------------------
# partition statistics files (Iceberg "Partition Statistics")
# ---------------------------------------------------------------------------


def _partitioned_table(tmp_path, spark):
    """Two-partition table with one shared eq-delete in partition a=1."""
    from iceberg_compaction_spark.plans.datamodel import (
        DeleteFile,
        FileScanTask,
    )

    root = str(tmp_path / "pdata")
    os.makedirs(root)
    tasks = []
    for part in (1, 2):
        p = os.path.join(root, f"a{part}.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(
                        range(part * 100, part * 100 + 50),
                        type=pa.int64(),
                    ),
                    "a": pa.array([part] * 50, type=pa.int64()),
                }
            ),
            p,
        )
        tasks.append(
            FileScanTask(
                data_file_path=p,
                length=os.path.getsize(p),
                file_size_in_bytes=os.path.getsize(p),
                record_count=50,
                sequence_number=1,
                partition=(part,),
            )
        )
    # position-delete file attached to partition 1's data file
    dpath = os.path.join(root, "pd.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array([tasks[0].data_file_path]),
                "pos": pa.array([0], type=pa.int64()),
            }
        ),
        dpath,
    )
    tasks[0].deletes.append(
        DeleteFile(
            path=dpath,
            content=1,
            file_size_in_bytes=os.path.getsize(dpath),
            record_count=1,
            sequence_number=2,
        )
    )
    m = Manifest(
        table_root=root,
        snapshot_id=0,
        sequence_number=2,
        data_files=tasks,
        partition_spec=[
            {"source": "a", "transform": "identity", "name": "a"}
        ],
    )
    cat = FileCatalog(warehouse=str(tmp_path / "pwh"))
    cat.create_table("pt", m)
    return cat


def test_partition_stats_rows_and_roundtrip(spark, tmp_path):
    from iceberg_compaction_spark.operators.stats import (
        compute_partition_stats,
        read_partition_stats,
    )

    cat = _partitioned_table(tmp_path, spark)
    manifest, rows = compute_partition_stats(cat, "pt")
    by_part = {tuple(sorted(r["partition"].items())): r for r in rows}
    p1 = by_part[(("a", "1"),)]
    p2 = by_part[(("a", "2"),)]
    assert p1["data_record_count"] == 50 and p1["data_file_count"] == 1
    assert p1["position_delete_record_count"] == 1
    assert p1["position_delete_file_count"] == 1
    assert p1["total_record_count"] == 49  # exact: no eq deletes
    assert p2["position_delete_file_count"] == 0
    assert p2["total_record_count"] == 50
    # registration + parquet read-back
    head = cat.load_table("pt")
    [entry] = head.partition_statistics_files
    assert entry["snapshot-id"] == 1
    back = read_partition_stats(head)
    assert len(back) == 2
    assert {tuple(r["partition"]) for r in back} == {
        ("a=1",),
        ("a=2",),
    }
    assert sorted(r["total_record_count"] for r in back) == [49, 50]


def test_partition_stats_survive_orphan_sweep(spark, tmp_path):
    """The stats file ends in .parquet — the sweep must keep the
    REGISTERED one (referenced) and collect a planted stray."""
    from iceberg_compaction_spark.operators.stats import (
        compute_partition_stats,
    )

    cat = _partitioned_table(tmp_path, spark)
    compute_partition_stats(cat, "pt")
    [entry] = cat.load_table("pt").partition_statistics_files
    registered = entry["statistics-path"]
    stray = os.path.join(
        os.path.dirname(registered), "dead.pstats.parquet"
    )
    with open(stray, "wb") as f:
        f.write(b"junk")
    removed = cat.remove_orphan_files("pt", older_than_s=0)
    assert stray in removed
    assert os.path.exists(registered)


def test_partition_stats_hadoop_metadata_roundtrip(spark, tmp_path):
    from iceberg_compaction_spark.operators.stats import (
        compute_partition_stats,
        read_partition_stats,
    )
    from iceberg_compaction_spark.sources.iceberg_meta import (
        IcebergHadoopCatalog,
    )

    root = str(tmp_path / "hd")
    os.makedirs(root)
    pq.write_table(
        pa.table({"id": pa.array(range(30), type=pa.int64())}),
        os.path.join(root, "f0.parquet"),
    )
    cat = IcebergHadoopCatalog(warehouse=str(tmp_path / "hwh2"))
    cat.create_table("t", Manifest.from_parquet_dir(root))
    compute_partition_stats(cat, "t")
    _, md = cat.current_metadata("t")
    assert md["partition-statistics"][0]["snapshot-id"] == 1
    back = read_partition_stats(cat.load_table("t"))
    # unpartitioned: one row, empty partition tuple
    assert len(back) == 1 and back[0]["data_record_count"] == 30


def test_partition_stats_cross_partition_delete_file(spark, tmp_path):
    """A position-delete file shared ACROSS partitions (a global
    predicate delete) has an unknown per-partition record split: it
    counts as a file everywhere it applies, contributes no record
    counts, and marks the touched partitions' total_record_count
    unavailable (review finding: the old attribution over-counted and
    could go negative)."""
    from iceberg_compaction_spark.operators.stats import (
        partition_stats_rows,
    )
    from iceberg_compaction_spark.plans.datamodel import DeleteFile

    cat = _partitioned_table(tmp_path, spark)
    m = cat.load_table("pt")
    dpath = os.path.join(m.table_root, "global-pd.parquet")
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    [t.data_file_path for t in m.data_files]
                ),
                "pos": pa.array([1, 1], type=pa.int64()),
            }
        ),
        dpath,
    )
    shared = DeleteFile(
        path=dpath,
        content=1,
        file_size_in_bytes=os.path.getsize(dpath),
        record_count=2,
        sequence_number=3,
    )
    for t in m.data_files:
        t.deletes.append(shared)
    rows = {tuple(sorted(r["partition"].items())): r
            for r in partition_stats_rows(m)}
    p1 = rows[(("a", "1"),)]
    p2 = rows[(("a", "2"),)]
    # single-partition file (p1's own) still counts; the shared one
    # counts as a FILE in both but no records anywhere
    assert p1["position_delete_file_count"] == 2
    assert p1["position_delete_record_count"] == 1  # own file only
    assert p1["total_record_count"] is None
    assert p2["position_delete_file_count"] == 1
    assert p2["position_delete_record_count"] == 0
    assert p2["total_record_count"] is None
    # never negative
    assert all(
        r["position_delete_record_count"] >= 0 for r in rows.values()
    )


def test_timestamp_sketch_is_session_tz_invariant_and_utc_exact(spark):
    """ADVICE r12: TimestampType values arrive in mapInPandas tz-naive
    in the SESSION timezone; hashing their micros unshifted diverges
    from Iceberg's UTC single-value serialization under any non-UTC
    session tz.  Fixed instants must produce the identical sketch under
    any session tz, and that sketch must equal a driver build over the
    true UTC micros (the datasketches/Iceberg wire contract)."""
    import datetime as _dt

    instants = [
        _dt.datetime(2024, 6, 1, 12, 0, i, tzinfo=_dt.timezone.utc)
        for i in range(50)
    ]
    utc_micros = np.array(
        [int(t.timestamp() * 1_000_000) for t in instants], dtype=np.int64
    )
    expected = ThetaSketch(lg_k=10).update_hashes(
        hash_longs_vec(utc_micros)
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        sketches = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = spark.createDataFrame(
                [(t,) for t in instants], "ts timestamp"
            )
            sketches[tz] = theta_sketch_columns(df, ["ts"], lg_k=10)["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    for tz, sk in sketches.items():
        assert sk.serialize() == expected.serialize(), tz


def test_nondefault_lg_k_roundtrips_through_statistics_file(spark, tmp_path):
    """ADVICE r12: a sketch built with non-default k used to round-trip
    with the wrong k (the blob stays byte-identical to java, so lg-k
    rides as a blob property) — read back and union with another
    sketch of the same k without error or mis-trim."""
    cat = _table(tmp_path)
    compute_table_stats(spark, cat, "t", columns=["id"], lg_k=10)
    head = cat.load_table("t")
    [entry] = head.statistics_files
    [bm] = entry["blob-metadata"]
    assert bm["properties"]["lg-k"] == "10"
    from iceberg_compaction_spark.sources.puffin import read_puffin_blobs
    from iceberg_compaction_spark.operators.stats import THETA_BLOB_TYPE

    [(meta, data)] = list(
        read_puffin_blobs(entry["statistics-path"], THETA_BLOB_TYPE)
    )
    sk = ThetaSketch.deserialize(
        data, lg_k=int(meta["properties"]["lg-k"])
    )
    assert sk.lg_k == 10
    other = ThetaSketch(lg_k=10).update_hashes(
        hash_longs_vec(np.arange(5000, dtype=np.int64))
    )
    merged = sk.union(other)
    assert merged.lg_k == 10
    assert len(merged.hashes) <= merged.k
    # mixed-k union is valid theta algebra: trims to min(k)
    small = ThetaSketch(lg_k=8).update_hashes(
        hash_longs_vec(np.arange(3000, dtype=np.int64))
    )
    mixed = merged.union(small)
    assert mixed.lg_k == 8 and len(mixed.hashes) <= mixed.k
