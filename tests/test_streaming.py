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


def test_streaming_sliding_matches_batch(spark):
    batch_events = ev.read_events(spark, SF)
    from iceberg_compaction_spark.streaming.pipeline import _with_event_time

    batch = (
        _with_event_time(batch_events)
        .groupBy(F.window("event_time", "1 hour", "30 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start_s"),
            "event_type",
            "n_events",
        )
    )
    batch_rows = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }

    stream = sp.read_events_stream(spark, SF)
    out = sp.run_available_now(sp.streaming_sliding_rollup(stream), spark)
    got = {
        (r["window_start_s"], r["event_type"]): r["n_events"]
        for r in out.collect()
    }
    assert got == batch_rows
    # every event lands in exactly window/slide = 2 windows
    n_events = ev.read_events(spark, SF).count()
    assert sum(got.values()) == 2 * n_events


def test_watermark_drops_late_events(spark, tmp_path):
    """Single-file triggers advancing the watermark, then a too-late
    event.  NB: Spark applies the late-event filter with a one-batch
    lag (the filter watermark of batch N is the one computed after
    batch N-1), so the late 0:30 row is delivered two batches after
    the 2:00 event that advanced the watermark past its window.
    Expect: [0:30,1:00) never emits (dropped), on-time windows do."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql.types import LongType, StructField, StructType

    d = str(tmp_path / "late-events")
    os.makedirs(d)
    h = 3_600_000_000_000  # 1h in ns

    def write_file(name, ts_hours, mtime):
        rows = [(int(t * h),) for t in ts_hours]
        schema = StructType([StructField("ts", LongType())])
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    write_file("a", [1.0, 1.0 + 1 / 6, 2.0], now - 400)  # wm -> 1:50
    write_file("b", [2.0 + 1 / 6], now - 300)  # wm -> ~2:00
    write_file("c", [0.5, 3.0], now - 200)  # 0:30 now below filter wm: dropped
    write_file("d", [4.0], now - 100)  # forces emission of closed windows

    schema = StructType([StructField("ts", LongType())])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sp.run_available_now(
        sp.streaming_tumbling_counts(stream), spark, output_mode="append"
    )
    got = {r["window_start_s"]: r["n_events"] for r in out.collect()}
    assert 1800 not in got  # [0:30,1:00): late event dropped, never emitted
    assert got.get(3600) == 2  # 1:00 and 1:10
    assert got.get(7200) == 2  # 2:00 and 2:10
    assert got.get(10800) == 1  # 3:00, emitted once 4:00 closed it


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


def test_stateful_sessionizer_out_of_order_trigger_keeps_session_end(spark, tmp_path):
    """An event arriving in a LATER trigger with a ts older than the
    stored session end must fold into the open session without moving
    its end backwards (moving it back would shrink the session or
    spuriously close it)."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from iceberg_compaction_spark.streaming import stateful as st

    d = str(tmp_path / "ooo-events")
    os.makedirs(d)
    s_ns = 1_000_000_000  # 1s in ns

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
        ]
    )

    def write_file(name, ts_seconds, mtime):
        rows = [(1, int(t * s_ns), 0.0) for t in ts_seconds]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    write_file("a", [1000, 1600], now - 300)  # open session [1000, 1600]
    write_file("b", [1200], now - 200)  # out-of-order: inside the session
    # 1600 + 1800 (gap) + 100 => closes the session; a new tail opens
    write_file("c", [3500], now - 100)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sp.run_available_now(
        st.stateful_sessionize(stream), spark, output_mode="append"
    ).collect()
    assert len(out) == 1, out
    r = out[0]
    assert r["start_us"] == 1000 * 1_000_000
    assert r["end_us"] == 1600 * 1_000_000  # NOT dragged back to 1200s
    assert r["n_events"] == 3


def test_streaming_dedup_drops_cross_trigger_duplicates(spark, tmp_path):
    """A duplicate key arriving in a LATER trigger (within the watermark
    horizon) is dropped; a fresh key in the same trigger passes.  State
    is keyed on (user_id, event_type, hour) — dropDuplicatesWithinWatermark
    holds only keys newer than the watermark."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = str(tmp_path / "dedup-events")
    os.makedirs(d)
    h_ns = 3_600_000_000_000

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_type", StringType()),
        ]
    )

    def write_file(name, rows, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    # Trigger 1: two events, same (user, type, hour) -> one key; plus
    # a distinct key from another user.
    write_file(
        "a",
        [(1, h_ns, "click"), (1, h_ns + 60 * 10**9, "click"), (2, h_ns, "view")],
        now - 300,
    )
    # Trigger 2: ANOTHER duplicate of user 1's key (cross-trigger, in
    # watermark) and one new key in the next hour.
    write_file(
        "b",
        [(1, h_ns + 120 * 10**9, "click"), (1, 2 * h_ns, "click")],
        now - 200,
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sp.run_available_now(
        sp.streaming_dedup(stream), spark, output_mode="append"
    ).collect()
    keys = sorted((r["user_id"], r["event_type"], r["hour_s"]) for r in out)
    assert keys == [
        (1, "click", 3600),
        (1, "click", 7200),
        (2, "view", 3600),
    ]


def test_streaming_interval_join_across_triggers(spark, tmp_path):
    """A click arriving in a LATER trigger joins the view buffered in
    stream-stream join state from an earlier trigger; a click outside
    the 30-minute attribution window never joins."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = str(tmp_path / "attr-events")
    os.makedirs(d)
    s_ns = 1_000_000_000

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_type", StringType()),
        ]
    )

    def write_file(name, rows, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    write_file("a", [(1, 1000 * s_ns, "view"), (2, 1000 * s_ns, "view")], now - 300)
    # user 1 clicks 10 min after the view (in-window, later trigger);
    # user 2 clicks 40 min after (outside the 30-min window)
    write_file(
        "b",
        [(1, 1600 * s_ns, "click"), (2, 3400 * s_ns, "click")],
        now - 200,
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sp.run_available_now(
        sp.streaming_interval_join(stream), spark, output_mode="append"
    ).collect()
    got = [(r["user_id"], r["view_us"], r["click_us"]) for r in out]
    assert got == [(1, 1000 * 10**6, 1600 * 10**6)]


def test_funnel_strict_order_and_greedy_chain(spark):
    """Funnel requires strictly increasing timestamps across steps; the
    greedy earliest chain never misses a completable funnel."""
    rows = [
        # user 1: completes view(10) -> click(20) -> purchase(30)
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view -> no funnel
        (2, 20, "click"), (2, 30, "view"), (2, 40, "purchase"),
        # user 3: greedy view=5; click at 7 precedes a later view(9) —
        # still valid (5 < 7); purchase at 8 is before click? no: 8 > 7 ok
        (3, 5, "view"), (3, 9, "view"), (3, 7, "click"), (3, 8, "purchase"),
        # user 4: purchase equals click ts -> strict order fails
        (4, 1, "view"), (4, 2, "click"), (4, 2, "purchase"),
    ]
    s_us = 1_000_000_000  # ns per value unit so ts div 1000 = v * 1e6... 
    df = spark.createDataFrame(
        [(u, t * s_us, e) for u, t, e in rows], ["user_id", "ts", "event_type"]
    )
    got = {
        r["user_id"]: (r["step0_us"], r["step1_us"], r["step2_us"])
        for r in ev.funnel(df, ["view", "click", "purchase"]).collect()
    }
    m = s_us // 1000  # expected us per unit
    assert got == {
        1: (10 * m, 20 * m, 30 * m),
        3: (5 * m, 7 * m, 8 * m),
    }  # user 2 (wrong order) and user 4 (tie, not strict) excluded


def test_stateful_funnel_completes_across_triggers_once(spark, tmp_path):
    """Funnel steps split across triggers complete via state; a
    completed user never emits twice even when later events re-match."""
    import glob
    import os
    import shutil
    import time

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from iceberg_compaction_spark.streaming import stateful as st

    d = str(tmp_path / "funnel-events")
    os.makedirs(d)
    s_ns = 1_000_000_000

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", LongType()),
            StructField("event_type", StringType()),
        ]
    )

    def write_file(name, rows, mtime):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        src = glob.glob(str(tmp_path / name / "*.parquet"))[0]
        dst = os.path.join(d, name + ".parquet")
        shutil.copy(src, dst)
        os.utime(dst, (mtime, mtime))

    now = time.time()
    write_file("a", [(1, 100 * s_ns, "view"), (1, 200 * s_ns, "click")], now - 300)
    write_file("b", [(1, 300 * s_ns, "purchase")], now - 200)  # completes
    # a second full chain afterwards must NOT re-emit
    write_file(
        "c",
        [(1, 400 * s_ns, "view"), (1, 500 * s_ns, "click"),
         (1, 600 * s_ns, "purchase")],
        now - 100,
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = sp.run_available_now(
        st.stateful_funnel(stream), spark, output_mode="append"
    ).collect()
    assert [(r["user_id"], r["step0_us"], r["step1_us"], r["step2_us"])
            for r in out] == [(1, 100 * 10**6, 200 * 10**6, 300 * 10**6)]


def test_streaming_ohlc_matches_batch(spark):
    """Round 15: the streaming OHLC twin produces byte-identical
    candles to the batch struct-argmin/argmax rollup — including the
    ns-precision tie ordering carried inside the struct."""
    batch = ev.ohlc_rollup(ev.read_events(spark, SF))
    batch_rows = {
        (r["hour_bucket"], r["event_type"]): (
            r["n_events"], r["open_micro"], r["high_micro"],
            r["low_micro"], r["close_micro"],
        )
        for r in batch.collect()
    }

    stream = sp.read_events_stream(spark, SF)
    out = sp.run_available_now(sp.streaming_ohlc_rollup(stream), spark)
    stream_rows = {
        (r["hour_bucket"], r["event_type"]): (
            r["n_events"], r["open_micro"], r["high_micro"],
            r["low_micro"], r["close_micro"],
        )
        for r in out.collect()
    }
    assert stream_rows == batch_rows
