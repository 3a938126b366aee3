from iceberg_compaction_spark.streaming.events import (
    hourly_rollup,
    read_events,
    sessionize,
)

__all__ = ["hourly_rollup", "read_events", "sessionize"]
