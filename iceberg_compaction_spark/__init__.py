"""iceberg_compaction_spark — a PySpark-native Iceberg-style compaction engine.

Re-implementation (NOT a port) of the capabilities of
nimtable/iceberg-compaction (reference at /root/reference, Rust/DataFusion):

- merge-on-read (MOR) rewrite: position/equality delete application via
  anti-joins, expressed as Spark DataFrame operations so Catalyst/Tungsten
  pick the physical strategy (broadcast vs shuffle hash, codegen, spill);
- a driver-side planning pipeline (file filters -> grouping -> group
  filters -> parallelism) as pure Python over file metadata;
- an optimistic commit layer with retry;
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Architecture stance (SURVEY.md §7.0): dataflow = Spark DataFrames;
planning = Python metadata manipulation; commit = Python with pluggable
backend.
"""

from iceberg_compaction_spark.config import (
    CompactionConfig,
    CompactionPlanningConfig,
    WriterConfig,
)
from iceberg_compaction_spark.plans.datamodel import (
    CompactionPlan,
    DeleteFile,
    FileGroup,
    FileScanTask,
)
from iceberg_compaction_spark.sources.catalog import catalog_from_options

__all__ = [
    "CompactionConfig",
    "CompactionPlanningConfig",
    "WriterConfig",
    "CompactionPlan",
    "DeleteFile",
    "FileGroup",
    "FileScanTask",
    "catalog_from_options",
]

__version__ = "0.1.0"
