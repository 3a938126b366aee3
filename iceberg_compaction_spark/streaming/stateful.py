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


FUNNEL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step0_us", LongType()),
        StructField("step1_us", LongType()),
        StructField("step2_us", LongType()),
    ]
)

# state: which step we're waiting for next + the greedy chain so far
FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("next_step", LongType()),
        StructField("t0", LongType()),
        StructField("t1", LongType()),
    ]
)


def _make_funnel(steps: tuple[str, ...]):
    """Closure factory for the 3-step streaming funnel state machine."""

    def funnel_group(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            next_step, t0, t1 = state.get
        else:
            next_step, t0, t1 = 0, 0, 0
        if next_step < 0:  # funnel already completed and emitted
            return

        chunks = list(pdfs)
        whole = pd.concat(chunks) if chunks else pd.DataFrame()
        done = None
        if len(whole):
            pdf = whole.sort_values("ts_us")
            for ts, et in zip(pdf["ts_us"].to_numpy(), pdf["event_type"]):
                ts = int(ts)
                # strict order: each step must be AFTER the previous one
                if next_step == 0 and et == steps[0]:
                    t0, next_step = ts, 1
                elif next_step == 1 and et == steps[1] and ts > t0:
                    t1, next_step = ts, 2
                elif next_step == 2 and et == steps[2] and ts > t1:
                    done = (t0, t1, ts)
                    next_step = -1
                    break
        if done is not None:
            state.update((-1, 0, 0))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "step0_us": [done[0]],
                    "step1_us": [done[1]],
                    "step2_us": [done[2]],
                }
            )
        else:
            state.update((next_step, t0, t1))

    return funnel_group


def stateful_funnel(
    stream: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming twin of :func:`events.funnel` as a per-key state
    machine: each user's state holds which step is awaited plus the
    greedy chain so far; a completed funnel emits once and the key goes
    dormant (state flagged done — O(1) state per user forever after).

    Greedy earliest-chain equals the batch funnel when each user's
    events arrive in timestamp order across triggers (single-file
    availableNow replay satisfies this; out-of-order live streams would
    need watermark-delayed evaluation like the sessionizer's caveat).
    """
    from pyspark.sql import functions as F

    if len(steps) != 3:
        raise ValueError("stateful_funnel implements the 3-step machine")
    prepped = stream.select(
        F.col("user_id"),
        F.expr("ts div 1000").alias("ts_us"),
        F.col("event_type"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_funnel(tuple(steps)),
        outputStructType=FUNNEL_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
