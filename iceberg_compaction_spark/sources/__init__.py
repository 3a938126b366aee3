from iceberg_compaction_spark.sources.manifest import (
    Manifest,
    scan_data_files,
)
from iceberg_compaction_spark.sources.scan import (
    HIDDEN_FILE_PATH,
    HIDDEN_POS,
    HIDDEN_SEQ,
    read_data_files,
)

__all__ = [
    "Manifest",
    "scan_data_files",
    "HIDDEN_FILE_PATH",
    "HIDDEN_POS",
    "HIDDEN_SEQ",
    "read_data_files",
]
