"""Structured Streaming twins vs batch ground truth on sf0.001 events."""

import pytest
from pyspark.sql import functions as F

from iceberg_compaction_spark.streaming import events as ev
from iceberg_compaction_spark.streaming import pipeline as sp

SF = "/root/testdata/sf0.001"


def test_streaming_hourly_matches_batch(spark):
    batch = ev.hourly_rollup(ev.read_events(spark, SF))
    batch_rows = {
        (r["hour_bucket"], r["event_type"]): (r["n_events"], r["sum_value_micro"])
        for r in batch.collect()
    }

    stream = sp.read_events_stream(spark, SF)
    out = sp.run_available_now(sp.streaming_hourly_rollup(stream), spark)
    stream_rows = {}
    for r in out.collect():
        # window_start_s (epoch seconds) -> hour bucket in ns terms
        bucket = r["window_start_s"] // 3600
        stream_rows[(bucket, r["event_type"])] = (
            r["n_events"],
            r["sum_value_micro"],
        )
    batch_keyed = {
        (bucket * 3_600_000_000_000 // 3_600_000_000_000, et): v
        for (bucket, et), v in batch_rows.items()
    }
    assert stream_rows == batch_keyed


def test_streaming_sessionize_session_counts_match_batch(spark):
    events_us = ev.read_events(spark, SF).withColumn("ts", F.expr("ts div 1000"))
    batch = ev.sessionize(events_us, gap=1_800_000_000, ts_unit_per_sec=1_000_000)
    batch_counts = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    stream = sp.read_events_stream(spark, SF)
    out = sp.run_available_now(sp.streaming_sessionize(stream), spark)
    stream_counts = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert stream_counts == batch_counts


def test_stateful_sessionizer_closes_sessions(spark):
    """applyInPandasWithState sessionizer: with the whole file in one
    trigger, every session except each user's open tail is emitted —
    per user: n_batch_sessions - 1."""
    from iceberg_compaction_spark.streaming import stateful as st

    events_us = ev.read_events(spark, SF).withColumn("ts", F.expr("ts div 1000"))
    batch = ev.sessionize(events_us, gap=1_800_000_000, ts_unit_per_sec=1_000_000)
    batch_counts = {
        r["user_id"]: r["n"]
        for r in batch.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    stream = sp.read_events_stream(spark, SF)
    import uuid

    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        st.stateful_sessionize(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name)
    got = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for user, n_batch in batch_counts.items():
        assert got.get(user, 0) == n_batch - 1, (user, n_batch, got.get(user))
    # closed sessions agree with the batch ground truth on their stats
    batch_keyed = {
        (r["user_id"], r["start_ts"]): (r["n_events"], r["sum_value_micro"])
        for r in batch.collect()
    }
    for r in out.collect():
        assert batch_keyed[(r["user_id"], r["start_us"])] == (
            r["n_events"],
            r["sum_value_micro"],
        )
