"""End-to-end: streaming ingestion writes small files, auto compaction
converges them — the engine's purpose exercised as one flow."""

import glob
import os

import pytest
from pyspark.sql import functions as F


def test_stream_ingest_then_auto_compact(spark, tmp_path):
    sink = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # streaming ingest: file-source stream over events, written as many
    # small files (one per trigger x shuffle partition)
    from iceberg_compaction_spark.streaming import pipeline as sp

    stream = sp.read_events_stream(spark, "/root/testdata/sf0.001")
    q = (
        stream.select("user_id", "event_type", "value")
        .repartition(8)  # fragment: 8 small files per trigger
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    produced = glob.glob(f"{sink}/*.parquet")
    assert produced, "streaming sink wrote no files"
    total_rows = spark.read.parquet(sink).count()
    assert total_rows > 0

    # manifest over the ingested files -> auto compaction
    from iceberg_compaction_spark.compaction import AutoCompaction
    from iceberg_compaction_spark.plans.auto import (
        AutoCompactionConfig,
        AutoPlanReason,
    )
    from iceberg_compaction_spark.sources.manifest import Manifest

    m = Manifest.from_parquet_dir(sink, sequence_number=1)
    m.save()
    assert len(m.data_files) == len(produced)

    cfg = AutoCompactionConfig(min_small_files_count=1)
    auto = AutoCompaction(spark=spark, config=cfg)
    m2, stats, report = auto.compact(m)

    if len(produced) == 1:
        # single-file ingest: nothing to compact (total_data_files <= 1)
        assert report.reason == AutoPlanReason.NO_CANDIDATE
        return

    assert report.reason == AutoPlanReason.RECOMMENDED
    assert stats.input_files_count == len(produced)
    assert stats.output_files_count < len(produced)
    assert sum(t.record_count for t in m2.data_files) == total_rows

    # fixed point: a second auto run finds nothing (or produces no plans)
    _m3, stats2, report2 = auto.compact(m2)
    assert stats2.input_files_count == 0
    assert report2.reason in (
        AutoPlanReason.NO_CANDIDATE,
        AutoPlanReason.NO_PLANS_PRODUCED,
    )

    # the compacted data is the same multiset of rows
    before = (
        spark.read.parquet(sink)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    after = (
        spark.read.parquet(*[t.data_file_path for t in m2.data_files])
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert before.exceptAll(after).count() == 0
    assert after.exceptAll(before).count() == 0
