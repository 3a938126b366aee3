from iceberg_compaction_spark.operators.mor import (
    EqualityDeleteTable,
    merge_on_read,
    rewrite_file_group,
)
from iceberg_compaction_spark.operators.validator import validate_row_counts

__all__ = [
    "EqualityDeleteTable",
    "merge_on_read",
    "rewrite_file_group",
    "validate_row_counts",
]
