from iceberg_compaction_spark.plans.datamodel import (
    CompactionPlan,
    DeleteFile,
    FileGroup,
    FileScanTask,
    SnapshotStats,
)
from iceberg_compaction_spark.plans.packer import ListPacker

__all__ = [
    "CompactionPlan",
    "DeleteFile",
    "FileGroup",
    "FileScanTask",
    "SnapshotStats",
    "ListPacker",
]
