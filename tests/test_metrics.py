"""Metrics registry + compaction instrumentation."""

from iceberg_compaction_spark.metrics import (
    DURATION_MS_BUCKETS,
    PLAN_FILE_COUNT_BUCKETS,
    PLAN_SIZE_BUCKETS,
    CompactionMetrics,
    Histogram,
    MetricsRegistry,
)


def test_bucket_design_targets():
    # metrics.rs:57-72: 1s..~4.5h, 1..4096 files, 1MB..16TB
    assert DURATION_MS_BUCKETS[0] == 1000.0
    assert DURATION_MS_BUCKETS[-1] == 1000.0 * 4**7
    assert PLAN_FILE_COUNT_BUCKETS[-1] == 4096.0
    assert PLAN_SIZE_BUCKETS[0] == 1024.0**2
    assert PLAN_SIZE_BUCKETS[-1] == 1024.0**2 * 4**11


def test_histogram_observe_and_overflow():
    h = Histogram(buckets=[10.0, 100.0])
    for v in (5, 50, 500):
        h.observe(v)
    assert h.counts == [1, 1, 1]
    assert h.n == 3 and h.total == 555


def test_registry_label_identity():
    r = MetricsRegistry()
    a = r.counter("c", table="t1")
    b = r.counter("c", table="t1")
    c = r.counter("c", table="t2")
    a.inc()
    b.inc(2)
    assert a is b and a.value == 3
    assert c.value == 0


def test_compaction_records_metrics(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_compaction_spark.compaction import Compaction
    from iceberg_compaction_spark.config import CompactionConfig
    from iceberg_compaction_spark.sources.manifest import Manifest

    root = str(tmp_path / "t")
    import os

    os.makedirs(root)
    for i in range(3):
        pq.write_table(
            pa.table({"id": list(range(i * 10, i * 10 + 10))}),
            f"{root}/f{i}.parquet",
        )
    m = Manifest.from_parquet_dir(root)
    m.save()
    c = Compaction(spark=spark, config=CompactionConfig.full())
    c.compact(m)
    assert c.metrics.commit_counter.value == 1
    assert c.metrics.input_files_count.value == 3
    assert c.metrics.output_files_count.value >= 1
    assert c.metrics.plan_execution_duration.n == 1
    snap = c.metrics.registry.snapshot()
    assert "iceberg_compaction_commit_counter" in str(snap)
