"""Engine metrics: counters + exponential-bucket histograms.

Mirrors the reference's metric surface (core/src/common/metrics.rs:24-52)
with the same bucket design targets — ~1 h durations, ~1 TB per plan,
~4096 files per plan (metrics.rs:57-72) — as a dependency-free Python
registry.  A real deployment would bridge these to Prometheus; the names
and label sets are kept 1:1 so the bridge is mechanical.

Spark-side batch metrics (records/bytes processed) come from
``SparkListener``-free sources: the executor stats the driver already
has (input/output file sizes and record counts from parquet footers),
keeping this pure-Python.
"""

from __future__ import annotations

import math
import threading
from dataclasses import dataclass, field


def exponential_buckets(start: float, factor: float, count: int) -> list[float]:
    return [start * factor**i for i in range(count)]


# bucket design targets (metrics.rs:57-72)
DURATION_MS_BUCKETS = exponential_buckets(1000.0, 4.0, 8)  # 1s .. ~4.5h
PLAN_FILE_COUNT_BUCKETS = exponential_buckets(1.0, 2.0, 13)  # 1 .. 4096
PLAN_SIZE_BUCKETS = exponential_buckets(1024.0 * 1024.0, 4.0, 12)  # 1MB .. 16TB


@dataclass
class Counter:
    """Thread-safe: rewrites update metrics from the plan thread pool."""

    value: float = 0.0

    def __post_init__(self) -> None:
        self._lock = threading.Lock()

    def inc(self, by: float = 1.0) -> None:
        with self._lock:
            self.value += by


@dataclass
class Histogram:
    """Thread-safe (see Counter)."""

    buckets: list[float]
    counts: list[int] = field(default_factory=list)
    total: float = 0.0
    n: int = 0

    def __post_init__(self) -> None:
        if not self.counts:
            self.counts = [0] * (len(self.buckets) + 1)  # +overflow
        self._lock = threading.Lock()

    def observe(self, v: float) -> None:
        i = 0
        while i < len(self.buckets) and v > self.buckets[i]:
            i += 1
        with self._lock:
            self.counts[i] += 1
            self.total += v
            self.n += 1

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else math.nan


class MetricsRegistry:
    """Label-aware registry: ``counter(name, **labels)`` /
    ``histogram(name, buckets, **labels)`` return live instruments."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: dict[tuple, Counter] = {}
        self._histograms: dict[tuple, Histogram] = {}

    def counter(self, name: str, **labels) -> Counter:
        key = (name, tuple(sorted(labels.items())))
        with self._lock:
            return self._counters.setdefault(key, Counter())

    def histogram(self, name: str, buckets: list[float], **labels) -> Histogram:
        key = (name, tuple(sorted(labels.items())))
        with self._lock:
            return self._histograms.setdefault(key, Histogram(list(buckets)))

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": {
                    f"{k[0]}{dict(k[1]) or ''}": c.value
                    for k, c in self._counters.items()
                },
                "histograms": {
                    f"{k[0]}{dict(k[1]) or ''}": {
                        "n": h.n,
                        "mean": h.mean,
                        "counts": h.counts,
                    }
                    for k, h in self._histograms.items()
                },
            }


class CompactionMetrics:
    """The reference's metric set, name-for-name (metrics.rs:24-52)."""

    def __init__(self, registry: MetricsRegistry | None = None, **labels) -> None:
        r = self.registry = registry or MetricsRegistry()
        self.labels = labels
        self.commit_counter = r.counter("iceberg_compaction_commit_counter", **labels)
        self.commit_failed_counter = r.counter(
            "iceberg_compaction_commit_failed_counter", **labels
        )
        self.executor_error_counter = r.counter(
            "iceberg_compaction_executor_error_counter", **labels
        )
        self.duration = r.histogram(
            "iceberg_compaction_duration", DURATION_MS_BUCKETS, **labels
        )
        self.commit_duration = r.histogram(
            "iceberg_compaction_commit_duration", DURATION_MS_BUCKETS, **labels
        )
        self.plan_execution_duration = r.histogram(
            "iceberg_compaction_plan_execution_duration",
            DURATION_MS_BUCKETS,
            **labels,
        )
        self.plan_file_count = r.histogram(
            "iceberg_compaction_plan_file_count", PLAN_FILE_COUNT_BUCKETS, **labels
        )
        self.plan_size_bytes = r.histogram(
            "iceberg_compaction_plan_size_bytes", PLAN_SIZE_BUCKETS, **labels
        )
        self.input_files_count = r.counter(
            "iceberg_compaction_input_files_count", **labels
        )
        self.output_files_count = r.counter(
            "iceberg_compaction_output_files_count", **labels
        )
        self.input_bytes_total = r.counter(
            "iceberg_compaction_input_bytes_total", **labels
        )
        self.output_bytes_total = r.counter(
            "iceberg_compaction_output_bytes_total", **labels
        )
