"""Event-stream operators: windowed rollups and sessionization.

The reference engine is batch-only (SURVEY.md §2.9); streaming is part of
the north-star extension surface.  Two forms are provided:

- **batch form** (this file): tumbling-window rollups and
  gaps-and-islands sessionization over the ``events`` table, in pure
  integer nanosecond arithmetic (the testdata carries ns timestamps,
  which Spark reads as int64 via ``nanosAsLong``).  These are
  oracle-checkable and also serve as the ground truth for the streaming
  form.
- **streaming form** (pipeline.py): the same logical ops as a Structured
  Streaming job (readStream -> withWatermark -> window/session_window),
  verified in tests against the batch form.

Scale notes: the hourly rollup is a single hash aggregation with
map-side partial aggregation — the shuffle carries one row per
(window, event_type) per task, not per event.  Sessionization shuffles
once on user_id; the per-user sort happens within partitions
(``Window.partitionBy(user).orderBy(ts)``), so skew is bounded by the
hottest single user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window

NS_PER_HOUR = 3_600_000_000_000
NS_PER_SEC = 1_000_000_000
DEFAULT_SESSION_GAP_NS = 1_800_000_000_000  # 30 min


def normalize_ts_ns(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the ``col`` timestamp column to int64 epoch-nanoseconds.

    The events fixture has shipped ``ts`` as int64-ns, TIMESTAMP(NANOS)
    (readable only via ``nanosAsLong``), and ``timestamp[us]`` (which
    Spark 4 reads as TIMESTAMP_NTZ) across rounds — so the engine
    accepts all of them and canonicalizes at the read boundary.  All
    downstream window/session/join math is exact integer ns arithmetic,
    immune to timezone and float-precision drift, and matches the
    DuckDB oracles' ``epoch_ns(ts)``.

    TIMESTAMP_NTZ is converted with pure wall-clock arithmetic
    (``timestampdiff`` against the NTZ epoch) — no session-timezone
    dependence; TIMESTAMP (ltz) via ``unix_micros``.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return df
    if isinstance(dt, TimestampNTZType):
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    elif isinstance(dt, TimestampType):
        us = F.unix_micros(F.col(col))
    else:
        raise TypeError(f"unsupported timestamp column type for {col!r}: {dt}")
    return df.withColumn(col, (us * F.lit(1000)).cast("long"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table with ``ts`` normalized to int64 epoch-ns.

    ``nanosAsLong`` keeps TIMESTAMP(NANOS) fixtures readable (Spark
    rejects them outright otherwise — PARQUET_TYPE_ILLEGAL); whatever
    physical type the file carries, :func:`normalize_ts_ns` canonicalizes
    it so all window math is exact integer arithmetic.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ts_ns(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _value_micro() -> F.Column:
    # per-row floor to integer micro-units; summing ints is exact and
    # order-independent (double SUM is neither)
    return F.floor(F.col("value") * 1000000).cast("long")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window per event_type: count + exact value sum.

    Output: (hour_bucket, event_type, n_events, sum_value_micro) where
    hour_bucket = floor(ts_ns / 1h) — the window start in hours since
    epoch.
    """
    # integer `div`, NOT floor(double /): ts ~1.7e18 exceeds double's 2^53
    # exact-integer range, so float division could mis-bucket boundary rows
    return (
        events.withColumn(
            "hour_bucket", F.expr(f"ts div {NS_PER_HOUR}").cast("long")
        )
        .withColumn("vmicro", _value_micro())
        .groupBy("hour_bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vmicro").alias("sum_value_micro"),
        )
    )


def ohlc_rollup(events: DataFrame) -> DataFrame:
    """OHLC candles: per (hour, event_type) the Open (value at the
    earliest event), High, Low, and Close (value at the latest event)
    — the time-series resampling shape under monitoring/market
    pipelines.

    Open/Close are argmin/argmax BY STRUCT AGGREGATE:
    ``min(struct(ts, event_id, vmicro))`` picks the lexicographically
    least (ts, event_id) pair and carries its value along — fully
    map-side combinable, ONE exchange total, no rank window (a window
    formulation would shuffle the whole stream a second time just to
    rank rows whose max/min is all we need).  Ties on ts break by
    event_id, so the result is deterministic and engine-independent.

    Output: (hour_bucket, event_type, n_events, open_micro, high_micro,
    low_micro, close_micro) — integer micro-units throughout.
    """
    e = events.select(
        F.expr(f"ts div {NS_PER_HOUR}").cast("long").alias("hour_bucket"),
        "event_type",
        F.col("ts").alias("__ts"),
        "event_id",
        _value_micro().alias("vmicro"),
    )
    o = F.struct("__ts", "event_id", "vmicro")
    return e.groupBy("hour_bucket", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(o)["vmicro"].cast("long").alias("open_micro"),
        F.max("vmicro").cast("long").alias("high_micro"),
        F.min("vmicro").cast("long").alias("low_micro"),
        F.max(o)["vmicro"].cast("long").alias("close_micro"),
    )


def sliding_rollup(events: DataFrame) -> DataFrame:
    """Sliding window (1 h window, 30 min slide) per event_type.

    Each event lands in exactly window/slide = 2 windows; the fan-out is
    an inline 2-element array explode (narrow, no join).  Window id is
    the start in half-hours since epoch (exact integer math — see
    hourly_rollup for why not float division).

    Output: (win_start_half, event_type, n_events, sum_value_micro).
    """
    half = NS_PER_HOUR // 2
    b0 = F.expr(f"ts div {half}").cast("long")
    return (
        events.withColumn("win_start_half", F.explode(F.array(b0, b0 - 1)))
        .withColumn("vmicro", _value_micro())
        .groupBy("win_start_half", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vmicro").alias("sum_value_micro"),
        )
    )


def sessionize(
    events: DataFrame,
    gap: int = DEFAULT_SESSION_GAP_NS,
    ts_unit_per_sec: int = NS_PER_SEC,
) -> DataFrame:
    """Gaps-and-islands sessionization: a session breaks when the gap to
    the previous event of the same user exceeds ``gap_ns``.

    Output: (user_id, session_idx, n_events, start_ts, end_ts,
    duration_sec, sum_value_micro); session_idx is 1-based per user in
    time order.  ``ts_unit_per_sec`` declares the resolution of ``ts``
    (1e9 for ns, 1e6 for us) and scales duration_sec.
    """
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | ((F.col("ts") - prev) > gap), 1
    ).otherwise(0)
    with_sess = (
        events.withColumn("is_new", is_new)
        .withColumn(
            "session_idx",
            F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("vmicro", _value_micro())
    )
    return with_sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.expr(f"(max(ts) - min(ts)) div {ts_unit_per_sec}")
        .cast("long")
        .alias("duration_sec"),
        F.sum("vmicro").alias("sum_value_micro"),
    )


def sessionize_skew(
    events: DataFrame,
    gap: int = DEFAULT_SESSION_GAP_NS,
    ts_unit_per_sec: int = NS_PER_SEC,
    hot_min_events: int = 100_000,
    bucket_units: int | None = None,
) -> DataFrame:
    """Skew-aware sessionization: identical output to :func:`sessionize`,
    but hot users never serialize one reducer.

    A per-user ORDERED window cannot be randomly salted (session
    boundaries depend on consecutive events of the same user), so the
    hot-key path splits each hot user's timeline by fixed TIME BUCKETS
    instead:

    1. users with >= ``hot_min_events`` events (exact count, one narrow
       aggregate) are split off; cold users run the plain window —
       per-user output is unchanged because sessionization is
       per-user-independent;
    2. hot users sessionize WITHIN (user, bucket) — the heavy window now
       partitions by (user, bucket), so a user with 10^9 events spreads
       over timeline/bucket reducers;
    3. local sessions (tiny summaries: start/end/n/sum) stitch across
       bucket boundaries with a second gaps-and-islands over SESSION
       rows per user.  Within a bucket adjacent local sessions already
       exceed ``gap``, so only boundary sessions can merge — and chains
       across many buckets are exactly what the second pass computes.

    The stitch window partitions by raw user_id, but over session
    summaries, not events: dense hot users (the realistic skew: bots,
    replayed devices) collapse to ~timeline/gap rows.  A pathological
    user whose events are ALL farther apart than ``gap`` keeps
    session-rows == event-rows; that shape needs streaming state, not a
    batch window, and is documented as out of scope here.

    ``bucket_units`` defaults to 1024 x ``gap`` (in ts units): big enough
    that stitch rows are ~0.1% of events for dense users, small enough
    to spread a year-long hot timeline over thousands of reducers.
    """
    bucket = bucket_units or gap * 1024
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("__n"))
    hot_users = F.broadcast(
        counts.where(F.col("__n") >= hot_min_events).select("user_id")
    )
    cold = events.join(hot_users, on="user_id", how="left_anti")
    hot = events.join(hot_users, on="user_id", how="left_semi")

    cold_sessions = sessionize(cold, gap=gap, ts_unit_per_sec=ts_unit_per_sec)

    # --- hot path: local sessionize within (user, time bucket) ---------
    wb = Window.partitionBy("user_id", "__sbucket").orderBy("ts")
    prev = F.lag("ts").over(wb)
    is_new = F.when(prev.isNull() | ((F.col("ts") - prev) > gap), 1).otherwise(0)
    local = (
        hot.withColumn("__sbucket", F.expr(f"ts div {bucket}").cast("long"))
        .withColumn("is_new", is_new)
        .withColumn(
            "__lidx",
            F.sum("is_new").over(
                wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("vmicro", _value_micro())
        .groupBy("user_id", "__sbucket", "__lidx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sum("vmicro").alias("sum_value_micro"),
        )
    )
    # --- stitch: gaps-and-islands over session summaries per user ------
    ws = Window.partitionBy("user_id").orderBy("start_ts")
    prev_end = F.lag("end_ts").over(ws)
    sess_new = F.when(
        prev_end.isNull() | ((F.col("start_ts") - prev_end) > gap), 1
    ).otherwise(0)
    hot_sessions = (
        local.withColumn("__snew", sess_new)
        .withColumn(
            "session_idx",
            F.sum("__snew").over(
                ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("start_ts").alias("start_ts"),
            F.max("end_ts").alias("end_ts"),
            F.sum("sum_value_micro").alias("sum_value_micro"),
        )
    )
    out_cols = [
        "user_id",
        "session_idx",
        "n_events",
        "start_ts",
        "end_ts",
        F.expr(f"(end_ts - start_ts) div {ts_unit_per_sec}")
        .cast("long")
        .alias("duration_sec"),
        "sum_value_micro",
    ]
    return cold_sessions.select(
        "user_id",
        "session_idx",
        "n_events",
        "start_ts",
        "end_ts",
        "duration_sec",
        "sum_value_micro",
    ).unionByName(hot_sessions.select(*out_cols))


def asof_join_last_event(
    events: DataFrame,
    probe_type: str = "purchase",
    build_type: str = "click",
) -> DataFrame:
    """As-of join: for each ``probe_type`` event, the most recent
    ``build_type`` event of the same user at-or-before it.

    Spark has no native ASOF JOIN; the scalable formulation is the
    union + ordered-window running max — ONE shuffle on (user_id), no
    range-join explosion: tag both streams, sort per user by time
    (build rows before probe rows on ties, making the join inclusive),
    carry the latest build timestamp forward, keep probe rows.

    Output: (user_id, purchase_us, click_us nullable, gap_us nullable).
    """
    ts_us = F.expr("ts div 1000")
    tagged = events.where(
        F.col("event_type").isin(probe_type, build_type)
    ).select(
        "user_id",
        ts_us.alias("ts_us"),
        (F.col("event_type") == build_type).cast("int").alias("is_build"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("is_build").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "click_us",
        F.max(F.when(F.col("is_build") == 1, F.col("ts_us"))).over(w),
    )
    return (
        carried.where(F.col("is_build") == 0)
        .select(
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            "click_us",
            (F.col("ts_us") - F.col("click_us")).alias("gap_us"),
        )
    )


def range_join_counts(
    events: DataFrame,
    probe_type: str = "purchase",
    build_type: str = "click",
    window_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Range join: per ``probe_type`` event, count ``build_type`` events
    of the same user in ``(probe_ts - window, probe_ts]``.

    A naive time-inequality join plans as a nested-loop explosion; the
    scale formulation buckets time into window-sized bins and equi-joins
    each probe to its own and previous bin (any in-range build event
    must fall in one of the two), leaving the exact range as a cheap
    residual.  Cost: one shuffle on (user_id, bin), candidate pairs
    bounded by 2x bin occupancy — independent of the table's time span.

    Output: (user_id, purchase_us, n_clicks_30m).
    """
    ts_us = F.expr("ts div 1000")
    probes = events.where(F.col("event_type") == probe_type).select(
        "user_id", ts_us.alias("p_us")
    )
    builds = events.where(F.col("event_type") == build_type).select(
        F.col("user_id").alias("b_user"),
        ts_us.alias("b_us"),
        (ts_us / window_us).cast("long").alias("b_bin"),
    )
    p_bin = (F.col("p_us") / window_us).cast("long")
    cand = probes.withColumn(
        "p_bin", F.explode(F.array(p_bin, p_bin - 1))
    )
    joined = cand.join(
        builds,
        (cand["user_id"] == builds["b_user"]) & (cand["p_bin"] == builds["b_bin"]),
        "left",
    )
    # the exact range check stays INSIDE the aggregation (a WHERE would
    # drop a probe entirely when its only bin-matches are out of range,
    # losing the n=0 row); each in-range build appears in exactly one of
    # the probe's two candidate bins, so nothing double-counts
    in_range = (F.col("b_us") > F.col("p_us") - window_us) & (
        F.col("b_us") <= F.col("p_us")
    )
    return (
        joined.groupBy("user_id", "p_us")
        .agg(F.sum(F.when(in_range, 1).otherwise(0)).alias("n"))
        .select(
            "user_id",
            F.col("p_us").alias("purchase_us"),
            F.col("n").cast("long").alias("n_clicks_30m"),
        )
    )


def top_users_by_activity(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by event count.

    Deliberately NOT a global ``Window.orderBy`` + ``row_number``: an
    unpartitioned window funnels every per-user count through a single
    task.  ``orderBy().limit(k)`` compiles to Spark's TakeOrderedAndProject
    — per-partition top-k then a k*p-row merge on the driver — so the
    plan has no single-partition exchange and survives 10^9 users.
    The rank is then re-derived on the k collected rows (k is tiny).
    """
    counts = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_value_micro()).alias("sum_value_micro"),
    )
    topk = counts.orderBy(F.col("n_events").desc(), F.col("user_id").asc()).limit(k)
    w = Window.orderBy(F.col("n_events").desc(), F.col("user_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select("rank", "user_id", "n_events", "sum_value_micro")
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-sequence funnel (complex-event-processing pattern): for
    each id, the EARLIEST chain of ``steps`` events in strict timestamp
    order — step i+1 must occur strictly after the chosen step-i event.

    Emits one row per id that completes every step:
    ``(id, step0_us, step1_us, ...)`` with microsecond timestamps.

    Earliest-chain greedy is correct for existence: taking the minimal
    timestamp at each step never forecloses a later step (any valid
    chain's step-i time is >= the greedy one, so the greedy prefix
    admits a superset of continuations).

    Scale shape: one filtered aggregate per step, all keyed on
    ``id_col`` — after the first shuffle every join/groupBy reuses the
    same hash partitioning, so a k-step funnel is one real exchange
    plus k narrow passes, never a window over the full event stream.
    """
    us = F.expr(f"{ts_col} div 1000")
    step_frames: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, et in enumerate(steps):
        e = events.where(F.col(type_col) == et).select(
            F.col(id_col), us.alias("__us")
        )
        if prev is not None:
            e = e.join(prev, id_col).where(
                F.col("__us") > F.col(f"step{i - 1}_us")
            )
        cur = e.groupBy(id_col).agg(F.min("__us").alias(f"step{i}_us"))
        step_frames.append(cur)
        prev = cur
    out = step_frames[0]
    for nxt in step_frames[1:]:
        out = out.join(nxt, id_col)
    return out


def anomaly_zscore(
    events: DataFrame, z_milli_threshold: int = 2000
) -> DataFrame:
    """Hourly-count anomaly detection per event type: flag hours whose
    event count deviates from that type's mean by >= ``threshold/1000``
    sample standard deviations.

    Output: (event_type, hour_bucket, n_events, z_milli) for flagged
    hours, z quantized to integer milli-sigmas.

    Numerics are engine-portable by construction: counts aggregate as
    exact integers; mean and variance come from the explicit
    (k, sum, sum-of-squares) moments — ``var = (ss - s*s/k)/(k-1)`` —
    so both engines divide the SAME integer operands in the same order
    (builtin STDDEV implementations differ in accumulation order, which
    flips the floor at quantization).  The per-type moment table is tiny
    (one row per event type) and broadcasts; the event side shuffles
    once, for the hourly groupBy, with map-side partial aggregation.
    """
    hourly = (
        events.withColumn(
            "hour_bucket", F.expr(f"ts div {NS_PER_HOUR}").cast("long")
        )
        .groupBy("event_type", "hour_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    z = F.expr(
        "floor(1000 * (n_events - s / cast(k as double)) /"
        " sqrt(greatest((ss - s * (s / cast(k as double))) /"
        " (k - 1), 1e-12)))"
    ).cast("long")
    return (
        hourly.join(F.broadcast(moments), "event_type")
        .where(F.col("k") >= 2)
        .withColumn("z_milli", z)
        .where(F.abs(F.col("z_milli")) >= z_milli_threshold)
        .select("event_type", "hour_bucket", "n_events", "z_milli")
    )


def scd2_intervals(events: DataFrame) -> DataFrame:
    """Materialize a changelog into SCD-2 validity intervals: each event
    is a state change for its user; the record is valid from its own
    timestamp until the user's next event (open interval = NULL).

    Output: (user_id, event_id, event_type, valid_from_ns, valid_to_ns,
    is_current).  Deterministic total order: (ts, event_id) — event_id is
    unique, so LEAD sees the same sequence in every engine.

    One shuffle on user_id (the window partition key); at 100 TB the
    same hot-user caveat as sessionize applies and the skew-salted
    variant there is the template — SCD2 consumers usually bound this by
    snapshotting only recent partitions.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from_ns"),
        nxt.alias("valid_to_ns"),
        nxt.isNull().alias("is_current"),
    )
