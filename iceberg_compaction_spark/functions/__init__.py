from iceberg_compaction_spark.functions.transforms import (  # noqa: F401
    PartitionField,
    bucket_column,
    murmur3_32,
    transform_column,
    transform_value,
)
