"""Custom stateful streaming operator: per-key sessionizer via
``applyInPandasWithState``.

Where ``session_window`` (pipeline.py) covers declarative sessionization,
this is the escape hatch for session semantics Spark can't express
natively (e.g. value-dependent gaps, session caps, custom merge logic):
arbitrary per-key state maintained by the engine, Arrow-batched into
pandas per trigger.

State per user: (session_start_us, last_ts_us, n_events, sum_value_micro).
An incoming batch closes a session whenever the gap exceeds
``GAP_US``; closed sessions are emitted downstream, the open tail stays
in state.  In a live stream pass ``idle_timeout_ms`` to flush open
sessions after idle time; with the default (no timeout) the tail is
held until more data for the key arrives.  (Processing-time timeouts
combined with ``availableNow`` make Spark loop state-cleanup batches
until the wall-clock timeout fires — pointless for bounded replays, so
the default is NoTimeout.)

Scale notes: state lives in the state store (RocksDB-backed in prod),
partitioned by user_id — the same shuffle as the batch sessionizer; per
trigger, cost is O(events in trigger) + O(touched keys).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_micro", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_micro", LongType()),
    ]
)


def _make_sessionizer(gap_us: int, idle_timeout_ms: int | None):
    """Closure factory (serialized by value to workers)."""

    def sessionize_group(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, sv = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "start_us": [start],
                        "end_us": [last],
                        "n_events": [n],
                        "sum_value_micro": [sv],
                    }
                )
            return

        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n = sv = 0

        # A key's trigger data arrives as an ITERATOR of Arrow-sized
        # pandas chunks in arbitrary order — sorting per chunk would
        # mis-sessionize any key spanning >1 chunk, so gather then sort
        # once.  (Bounded by one key's rows per trigger, the same memory
        # Spark already buffers for the group.)
        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else pd.DataFrame()
        closed: list[tuple[int, int, int, int]] = []
        if len(whole):
            pdf = whole.sort_values("ts_us")
            for ts, vm in zip(pdf["ts_us"].to_numpy(), pdf["vmicro"].to_numpy()):
                ts = int(ts)
                if start is None:
                    start, last, n, sv = ts, ts, 1, int(vm)
                elif ts <= last:
                    # out-of-order arrival (a later trigger delivering an
                    # event older than the stored session end): fold into
                    # the open session WITHOUT moving its end backwards —
                    # `last = ts` here would shrink the session and could
                    # spuriously close it on the next event
                    start = min(start, ts)
                    n += 1
                    sv += int(vm)
                elif ts - last > gap_us:
                    closed.append((start, last, n, sv))
                    start, last, n, sv = ts, ts, 1, int(vm)
                else:
                    last = ts
                    n += 1
                    sv += int(vm)

        if start is not None:
            state.update((start, last, n, sv))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value_micro": [c[3] for c in closed],
                }
            )

    return sessionize_group


def stateful_sessionize(
    stream: DataFrame,
    gap_us: int = GAP_US,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events stream (with int64 ns ``ts`` and double ``value``) ->
    closed-session rows.  ``idle_timeout_ms`` flushes each key's open
    session after that much processing-time idleness (live streams only;
    leave None for bounded/availableNow replays)."""
    from pyspark.sql import functions as F

    prepped = stream.select(
        F.col("user_id"),
        F.expr("ts div 1000").alias("ts_us"),
        F.floor(F.col("value") * 1000000).cast("long").alias("vmicro"),
    )
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(gap_us, idle_timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
