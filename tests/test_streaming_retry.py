"""run_available_now's bounded restart on Python-worker spawn failures.

Round 15's one red oracle entry (`stream_update_images`) died with
`[STREAM_FAILED] ... Python worker failed to connect back` — a
SocketTimeout while the streaming DataSource's planner worker imported
pyspark under full-core load.  The connect-back accept timeout is a
hardcoded 10 s in Spark 4.1.2's PythonWorkerFactory, so the engine's
remedy is a bounded restart of the availableNow stream (fresh memory
sink + fresh temp checkpoint per attempt = clean recomputation).

These tests pin the classifier and the retry loop deterministically
(fakes for the writeStream chain) — reproducing the real SocketTimeout
needs a saturated host and would itself be the flake.
"""

from iceberg_compaction_spark.streaming.pipeline import (
    _is_worker_spawn_failure,
    run_available_now,
)


def _spawn_error() -> Exception:
    inner = TimeoutError(
        "java.net.SocketTimeoutException: Timed out while waiting for "
        "the Python worker to connect back"
    )
    outer = RuntimeError(
        "[STREAM_FAILED] Query [id = x] terminated with exception: "
        "Python worker failed to connect back."
    )
    outer.__cause__ = inner
    return outer


class _FakeQuery:
    def __init__(self, fail_times: list[int], table_by_name: dict):
        self._fail = fail_times
        self._tables = table_by_name
        self.stopped = False

    def awaitTermination(self):
        if self._fail and self._fail[0] > 0:
            self._fail[0] -= 1
            raise _spawn_error()

    def stop(self):
        self.stopped = True


class _FakeWriter:
    def __init__(self, fail_counter, tables, started):
        self._fail = fail_counter
        self._tables = tables
        self._started = started
        self._name = None

    def format(self, _):
        return self

    def queryName(self, name):
        self._name = name
        return self

    def outputMode(self, _):
        return self

    def trigger(self, **_):
        return self

    def start(self):
        q = _FakeQuery(self._fail, self._tables)
        self._started.append((self._name, q))
        self._tables[self._name] = f"table:{self._name}"
        return q


class _FakeResult:
    def __init__(self, fail_counter, tables, started):
        self._args = (fail_counter, tables, started)

    @property
    def writeStream(self):
        return _FakeWriter(*self._args)


class _FakeSpark:
    def __init__(self, tables):
        self._tables = tables

    def table(self, name):
        return self._tables[name]


def test_spawn_failure_classifier():
    assert _is_worker_spawn_failure(_spawn_error())
    # signature on the CAUSE only (the outer message is generic)
    outer = RuntimeError("[STREAM_FAILED] query terminated")
    outer.__cause__ = OSError("Failed to open socket to Python daemon: boom")
    assert _is_worker_spawn_failure(outer)
    # ordinary failures must NOT be retried
    assert not _is_worker_spawn_failure(ValueError("schema mismatch"))
    err = RuntimeError("[STREAM_FAILED] analysis error")
    err.__cause__ = KeyError("missing column")
    assert not _is_worker_spawn_failure(err)
    # self-referential chains must not loop forever
    loop = RuntimeError("x")
    loop.__cause__ = loop
    assert not _is_worker_spawn_failure(loop)


def test_retry_recovers_from_transient_spawn_failure():
    tables: dict = {}
    started: list = []
    fail_once = [1]
    result = _FakeResult(fail_once, tables, started)
    out = run_available_now(result, _FakeSpark(tables), output_mode="append")
    assert len(started) == 2, "exactly one restart"
    # the failed attempt's query was stopped; result comes from a FRESH
    # sink table, never the partial first attempt's
    assert started[0][1].stopped
    assert started[0][0] != started[1][0]
    assert out == f"table:{started[1][0]}"


def test_retry_budget_is_bounded():
    tables: dict = {}
    started: list = []
    always_fail = [99]
    result = _FakeResult(always_fail, tables, started)
    try:
        run_available_now(result, _FakeSpark(tables), max_start_retries=2)
    except RuntimeError as e:
        assert "failed to connect back" in str(e)
    else:
        raise AssertionError("expected the spawn failure to propagate")
    assert len(started) == 3, "initial attempt + 2 retries, then raise"


def test_stream_starts_under_synthetic_cpu_load(spark):
    """The round-15 failure mode, reproduced as closely as a test can:
    start the streaming-DataSource CDC query while every core is busy,
    so worker spawn races the connect-back window.  With the bounded
    restart this must complete and match the calm-run result."""
    import multiprocessing
    import os

    from iceberg_compaction_spark import registry

    sf_dir = "/root/testdata/sf0.001"
    calm = sorted(
        tuple(r)
        for r in registry.QUERIES["stream_update_images"](
            spark, sf_dir
        ).collect()
    )
    assert calm, "fixture must produce update pairs"

    def _spin(stop_ns):
        import time as _t

        x = 0
        while _t.monotonic_ns() < stop_ns:
            x += 1
        return x

    n = os.cpu_count() or 8
    stop_ns = __import__("time").monotonic_ns() + 45_000_000_000
    procs = [
        multiprocessing.Process(target=_spin, args=(stop_ns,), daemon=True)
        for _ in range(n)
    ]
    for p in procs:
        p.start()
    try:
        loaded = sorted(
            tuple(r)
            for r in registry.QUERIES["stream_update_images"](
                spark, sf_dir
            ).collect()
        )
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            p.join(timeout=5)
    assert loaded == calm


def test_non_spawn_failure_propagates_immediately():
    tables: dict = {}
    started: list = []

    class _BadQuery(_FakeQuery):
        def awaitTermination(self):
            raise ValueError("bad schema")

    class _BadWriter(_FakeWriter):
        def start(self):
            q = _BadQuery([0], self._tables)
            self._started.append((self._name, q))
            return q

    class _BadResult(_FakeResult):
        @property
        def writeStream(self):
            return _BadWriter(*self._args)

    result = _BadResult([0], tables, started)
    try:
        run_available_now(result, _FakeSpark(tables))
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError to propagate")
    assert len(started) == 1, "no retry for non-infrastructure failures"
